"""Public column-function surface (the engine's ``pyspark.sql.functions``
extension set) — re-exports of the reusable Column builders so users compose
pipelines without digging through operator modules.

Everything here is a pure Column expression (JVM-side, codegen-friendly)
unless noted.
"""

from log_collector_spark.operators.aggregate import (
    ceil_minute_col,
    error_expr,
    success_expr,
)
from log_collector_spark.operators.route import sink_column
from log_collector_spark.textops.common import (
    h60,
    int_dot,
    quantized_embedding,
    shingles,
    tokens,
)
from log_collector_spark.textops.analysis import (
    bpe_ish_token_count,
    lang_scores,
    token_count,
)

__all__ = [
    "ceil_minute_col",
    "error_expr",
    "success_expr",
    "sink_column",
    "h60",
    "int_dot",
    "quantized_embedding",
    "shingles",
    "tokens",
    "bpe_ish_token_count",
    "lang_scores",
    "token_count",
]
