"""Grok semantics kernel (pure Python, no Spark).

Behavioral re-implementation of the reference grok engine
(`/root/reference/src/main/java/io/sugo/grok/api/`): pattern-dictionary
loading, ``%{NAME:sub;type;format}`` expression expansion into a regex with
unique named groups, typed capture conversion, and Gson-compatible JSON
serialization. Used on the driver (compile once, broadcast) and inside the
vectorized parse UDF; also serves as the single-row *oracle* for tests.
"""

from log_collector_spark.grok.compiler import GrokCompiler, CompiledGrok, default_pattern_path
from log_collector_spark.grok.gson import gson_dumps
from log_collector_spark.grok.oracle import parse_line, serialize_record

__all__ = [
    "GrokCompiler",
    "CompiledGrok",
    "default_pattern_path",
    "gson_dumps",
    "parse_line",
    "serialize_record",
]
