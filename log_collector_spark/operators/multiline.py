"""Multi-line record assembly (S6) — reference
reader/file/MultiLineFileReader.java:309-358 semantics as a window + groupBy.

Reference behavior reproduced exactly:
- a line FULL-matching ``multiline.pattern`` (``Pattern.matches``, i.e.
  anchored) starts a new record; everything else appends to the current one,
- lines are concatenated with NO separator (``multiLineSB.append``),
- blank lines are skipped entirely (``StringUtils.isNotBlank``, :309),
- content before the first first-line forms an orphan leading record (the
  buffer is flushed when the first first-line arrives, :312-316),
- the trailing buffer is flushed at EOF (:244-283).

Spark plan: one window (running count of first-lines per file = record id,
requires the per-file line order) + one groupBy with an order-restoring
``array_sort(collect_list(struct))`` — two shuffles on ``file`` only, no
Python. Streaming analog: ``applyInPandasWithState`` session by file
(streaming/multiline.py).

At scale the window partitions by file — hot files are a skew risk exactly
like hot conversations; the partition key is the file, matching the
reference's one-thread-per-file model, and AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assemble(df: DataFrame, first_line_pattern: str, *,
             file_col: str = "filename", order_col: str = "line_no",
             text_col: str = "text") -> DataFrame:
    """→ (file, record_id, first_line_no, n_lines, record)."""
    anchored = f"^(?:{first_line_pattern})$"
    nonblank = F.trim(F.col(text_col)) != ""
    is_first = F.col(text_col).rlike(anchored) & nonblank
    w = Window.partitionBy(file_col).orderBy(order_col)
    rec = F.sum(is_first.cast("int")).over(w)
    lines = (df.filter(nonblank)
               .withColumn("_rec", rec))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"),
                                             F.col(text_col).alias("t")))),
        lambda x: x["t"])
    return (lines.groupBy(F.col(file_col).alias("file"),
                          F.col("_rec").alias("record_id"))
            .agg(F.min(order_col).alias("first_line_no"),
                 F.count(F.lit(1)).alias("n_lines"),
                 F.array_join(ordered, "").alias("record")))
