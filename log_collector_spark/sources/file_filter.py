"""Filename-regex file pruning + skip-before-checkpoint (S3).

The reference walks the log directory with ``SugoFileFilter``
(reader/file/SugoFileFilter.java:25-39): a file is read iff its BASENAME
fully matches ``file.reader.log.regex`` AND it is not lexicographically
before the checkpointed ``lastFileName`` (``compareTo > 0`` rejects; equality
is accepted — the last file is re-entered at its stored offset,
DefaultFileReader.java:181-212).

Spark-native placement: this pruning belongs at FILE-LISTING time, before
any scan task is planned — excluded files are never opened, exactly like the
reference's directory walk (a post-scan ``input_file_name()`` row filter
would still read every file). ``filtered_files`` is the listing primitive;
``plans.checkpoint.pending_files`` applies it when the config carries the
regex, and at cluster scale the same predicate is what you hand to an
Iceberg metadata-table file filter.
"""

from __future__ import annotations

import os
import re

FILE_READER_LOG_REGEX = "file.reader.log.regex"  # DefaultFileReader.java:36


def accept(filename: str, regex: str | None,
           last_file: str | None = None) -> bool:
    """SugoFileFilter.accept, exact semantics (full-match + not-before)."""
    if regex is not None and re.fullmatch(regex, filename) is None:
        return False
    if last_file and last_file.strip():
        if last_file > filename:  # String.compareTo > 0 → skip
            return False
    return True


def filtered_files(input_dir: str, regex: str | None = None,
                   last_file: str | None = None) -> list[str]:
    """Stable-ordered (lexicographic, DefaultFileReader.java:196-203) listing
    of accepted files — the engine's scan file-set."""
    return sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if os.path.isfile(os.path.join(input_dir, f))
        and accept(f, regex, last_file))
