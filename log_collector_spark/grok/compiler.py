"""Grok pattern dictionary + expression compiler (driver-side, compile-once).

Behavioral re-implementation of the reference compiler
(grok/api/Grok.java:202-257 pattern load; :319-387 expression expansion;
grok/api/GrokUtils.java:22-34 token syntax). The compiled artifact is a plain
picklable object that is shipped to executors inside the vectorized parse UDF
(compile happens ONCE on the driver; executors only re-`re.compile` the final
regex string, cached per process).

Expansion semantics mirrored exactly:
- iteratively find the LEFTMOST ``%{NAME:subname;type;format}`` token,
- replace every literal occurrence of that token text with
  ``(?<nameK>definition)`` using a fresh unique index K per occurrence
  (Grok.java:368-379) — this is how the reference supports duplicate capture
  names despite regex named-group uniqueness rules,
- record ``nameK -> subname-or-name`` (the *semantic* key, still carrying the
  ``;type;format`` spec, split later by the converter),
- inline definitions ``%{NAME=regex}`` add a new dictionary entry,
- at most 1000 iterations (deep-recursion guard).

The final Java regex is translated to Python ``re`` dialect: only named-group
syntax differs (``(?<g>`` → ``(?P<g>``; lookbehinds untouched). Atomic groups
``(?>...)`` in the standard dictionary require Python >= 3.11.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

# Token syntax, mirroring GrokUtils.GROK_PATTERN (GrokUtils.java:22-34).
# Java's `[A-z0-9]` / `[A-z0-9_:;'\/\s\.-]` classes are reproduced with their
# practical alphabet (pattern names are alnum+underscore in the standard dict).
GROK_TOKEN = re.compile(
    r"%\{"
    r"(?P<name>"
    r"(?P<pattern>[A-Za-z0-9_]+)"
    r"(?::(?P<subname>[A-Za-z0-9_:;'/\s.-]+))?"
    r")"
    r"(?:=(?P<definition>(?:[^{}]+|\.+)+))?"
    r"\}"
)

# Java named-group opener (?<name>  — requires a letter first, so lookbehind
# tokens (?<! and (?<= are not touched (same rule as GrokUtils.NAMED_REGEX).
_JAVA_NAMED_GROUP = re.compile(r"\(\?<([a-zA-Z][a-zA-Z0-9]*)>")

# Pattern-file line: NAME<whitespace>regex (Grok.java:242). '#' comments and
# blank lines simply fail the match and are skipped.
_PATTERN_LINE = re.compile(r"^([A-Za-z0-9_]+)\s+(.*)$")


def default_pattern_path() -> str:
    """Bundled standard grok dictionary (logstash-patterns-core, Apache 2.0)."""
    return os.path.join(os.path.dirname(__file__), "data", "grok_patterns.txt")


def _default_patterns_text() -> str:
    """Read the bundled dictionary via importlib.resources, NOT a __file__
    path: under ``spark-submit --py-files pkg.zip`` (the north_rule
    deployment shape) the package is zipimported on every executor and
    ``open(os.path.dirname(__file__)/...)`` fails — the resources API reads
    through the zip loader."""
    from importlib import resources
    return (resources.files("log_collector_spark.grok")
            .joinpath("data").joinpath("grok_patterns.txt")
            .read_text(encoding="utf-8"))


def load_pattern_file(path: str | None = None) -> dict[str, str]:
    """Load a grok pattern dictionary file into name -> regex."""
    if path is None:
        text = _default_patterns_text()
    else:
        with open(path, "r", encoding="utf-8") as fh:
            text = fh.read()
    patterns: dict[str, str] = {}
    for line in text.splitlines():
        m = _PATTERN_LINE.match(line)
        if m:
            patterns[m.group(1)] = m.group(2)
    return patterns


def java_regex_to_python(regex: str) -> str:
    """Translate the Java-dialect expanded regex to Python `re` dialect."""
    return _JAVA_NAMED_GROUP.sub(r"(?P<\1>", regex)


@dataclass
class CaptureSpec:
    """One named group of the compiled expression, with its conversion spec.

    ``key`` is the output field name (spec[0]); ``type``/``fmt`` come from the
    ``;type;format`` suffix (Converter.java:44-56 splits on ``;|:`` limit 3).
    ``raw`` is the unsplit semantic name — it becomes the output key verbatim
    when the group does not participate in a match (Match.java:171-183 skips
    conversion for null group values).
    """

    group: str  # unique regex group id, name0..nameN
    raw: str  # semantic name incl. type spec, e.g. "logtime;date;yyyy-MM-dd HH:mm:ss"
    key: str
    type: str | None
    fmt: str | None


def split_spec(raw: str) -> tuple[str, str | None, str | None]:
    """Split ``name;type;format`` exactly like Converter.convert (limit 3)."""
    parts = re.split(r"[;:]", raw, maxsplit=2)
    if len(parts) == 1:
        return parts[0], None, None
    if len(parts) == 2:
        return parts[0], parts[1], None
    return parts[0], parts[1], parts[2]


@dataclass
class CompiledGrok:
    """Compiled grok expression: final regex + ordered capture specs.

    Picklable; safe to embed in a pandas UDF closure. ``pattern()`` lazily
    compiles (and caches per process) the Python regex.
    """

    expression: str
    named_regex: str  # Java-dialect expanded regex (for parity debugging)
    python_regex: str
    captures: list[CaptureSpec] = field(default_factory=list)
    _compiled: "re.Pattern | None" = field(default=None, repr=False, compare=False)

    def pattern(self) -> "re.Pattern":
        if self._compiled is None:
            self._compiled = re.compile(self.python_regex)
        return self._compiled

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_compiled"] = None
        return d

    @property
    def capture_order(self) -> list[str]:
        """Group ids in order of textual appearance in the final regex —
        the iteration order of the reference's capture map (LinkedHashSet scan
        of the compiled pattern, GrokUtils.java:38-45)."""
        return [m.group(1) for m in _JAVA_NAMED_GROUP.finditer(self.named_regex)]


class GrokCompiler:
    """Pattern dictionary + ``compile(expr)`` (reference Grok.create + compile)."""

    def __init__(self, pattern_path: str | None = None,
                 extra_patterns: dict[str, str] | None = None) -> None:
        self.patterns = load_pattern_file(pattern_path)
        if extra_patterns:
            self.patterns.update(extra_patterns)

    def add_pattern(self, name: str, regex: str) -> None:
        if name and regex:
            self.patterns[name] = regex

    def compile(self, expression: str) -> CompiledGrok:
        if not expression or not expression.strip():
            raise ValueError("grok expression must not be empty")
        named_regex = expression
        index = 0
        group_to_raw: dict[str, str] = {}
        iteration_left = 1000
        while True:
            if iteration_left <= 0:
                raise ValueError(f"deep recursion compiling grok: {expression!r}")
            iteration_left -= 1
            m = GROK_TOKEN.search(named_regex)
            if not m:
                break
            name = m.group("name")
            pat = m.group("pattern")
            definition = m.group("definition")
            if definition is not None:
                self.add_pattern(pat, definition)
                name = name + "=" + definition
            token = "%{" + name + "}"
            count = named_regex.count(token)
            if count == 0:
                # token text didn't round-trip (malformed) — drop it to avoid
                # an infinite loop; mirrors the reference skipping on exception
                named_regex = named_regex.replace(m.group(0), "", 1)
                continue
            definition_regex = self.patterns.get(pat)
            if definition_regex is None:
                raise KeyError(f"unknown grok pattern %{{{pat}}} in {expression!r}")
            subname = m.group("subname")
            for _ in range(count):
                gid = f"name{index}"
                replacement = f"(?<{gid}>{definition_regex})"
                group_to_raw[gid] = subname if subname is not None else name
                named_regex = named_regex.replace(token, replacement, 1)
                index += 1
        if not named_regex:
            raise ValueError("empty compiled regex")

        py = java_regex_to_python(named_regex)
        compiled = CompiledGrok(expression=expression, named_regex=named_regex,
                                python_regex=py)
        # capture specs in textual order of appearance (capture iteration order)
        for gid in [g for g in (mm.group(1) for mm in _JAVA_NAMED_GROUP.finditer(named_regex))]:
            raw = group_to_raw.get(gid, gid)
            key, typ, fmt = split_spec(raw)
            compiled.captures.append(CaptureSpec(group=gid, raw=raw, key=key,
                                                 type=typ, fmt=fmt))
        re.compile(py)  # fail fast on the driver
        return compiled
