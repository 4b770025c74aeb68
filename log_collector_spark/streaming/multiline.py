"""Stateful streaming multi-line assembly (S6 streaming analog) via
``applyInPandasWithState``.

The reference keeps one in-memory StringBuffer per file while tailing
(MultiLineFileReader.java:233,309-358); here that buffer is per-file
GroupState, surviving across micro-batches (and across restarts via the
checkpoint). Semantics match the batch operator (operators/multiline.py):
full-match first-line starts a record, others append with no separator,
blanks skipped; the pending buffer flushes on processing-time timeout — the
streaming stand-in for the reference's EOF flush (:244-283).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("record", T.StringType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("buffer", T.StringType()),
])


def make_assembler(first_line_pattern: str, flush_timeout_ms: int = 1000):
    rx = re.compile(f"(?:{first_line_pattern})")

    def assemble(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        file = key[0]
        if state.hasTimedOut:  # EOF-flush analog
            (buf,) = state.get
            state.remove()
            if buf:
                yield pd.DataFrame({"file": [file], "record": [buf]})
            return
        buf: Any = state.get[0] if state.exists else ""
        records: list[str] = []
        rows = pd.concat(list(pdfs)).sort_values("line_no")
        for text in rows["text"]:
            if text is None or not str(text).strip():
                continue
            if rx.fullmatch(text):  # Pattern.matches = anchored
                if buf:
                    records.append(buf)
                buf = text
            else:
                buf = buf + text
        state.update((buf,))
        state.setTimeoutDuration(flush_timeout_ms)
        if records:
            yield pd.DataFrame({"file": [file] * len(records),
                                "record": records})

    return assemble


def assemble_stream(lines: DataFrame, first_line_pattern: str,
                    flush_timeout_ms: int = 1000) -> DataFrame:
    """lines: streaming df (file, line_no, text) → (file, record)."""
    return (lines.groupBy("file")
            .applyInPandasWithState(
                make_assembler(first_line_pattern, flush_timeout_ms),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
