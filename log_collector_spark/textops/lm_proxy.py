"""Language-model-proxy quality scoring without a language model.

CCNet/FineWeb-style pipelines filter on LM perplexity; in a pure-SQL/
integer engine the deterministic stand-in is corpus-bigram SURPRISAL with
a bit-length log: ``bitlen(x) = length(bin(x)) = floor(log2 x) + 1`` has
IDENTICAL semantics in Spark and DuckDB (no-leading-zeros ``bin``), so
"bits of surprise" stays in exact integer arithmetic under the driver's
typed value-hash.

    surprisal(bigram) = bitlen(total_bigrams) - bitlen(count(bigram))
    doc score         = mean surprisal over the doc's token bigrams,
                        in millibits (x1000, integer floor)

A doc full of corpus-common bigrams scores low (predictable text); rare
junk scores high — the same decision boundary an LM-perplexity filter
draws, quantized to integer bits.

Scale shape (100 TB): one (bigram, count) hash agg over the corpus, one
token-bigram explode + equi-join on the bigram hash (the vocabulary is
never broadcast — same join discipline as analysis.token_rarity), one
per-doc agg. Three shuffles total, all on high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_collector_spark.textops import common as C


def _bigrams(text_col: str):
    """Adjacent token-pair strings "a b" (narrow array transform)."""
    toks = C.tokens(F.col(text_col))
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))


def _sql_bigrams(text_col: str) -> str:
    toks = C.sql_tokens(text_col)
    return (f"list_transform(range(1, greatest(len({toks}), 1)), "
            f"i -> {toks}[i] || ' ' || {toks}[i + 1])")


def bigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc mean corpus-bigram surprisal in millibits (see module doc).

    Returns (doc_id, n_bigrams, surprisal_millibits); docs with no bigram
    (fewer than 2 tokens) report 0 — the never-throw F3 convention.
    """
    ex = df.select(F.col(id_col),
                   F.explode(_bigrams(text_col)).alias("bg"))
    counts = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("n_total"))
    bitlen = lambda c: F.length(F.bin(c)).cast("long")
    scored = (ex.join(counts, "bg")
              .crossJoin(F.broadcast(total))
              .select(F.col(id_col),
                      (bitlen(F.col("n_total"))
                       - bitlen(F.col("n"))).alias("bits")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                    F.sum("bits").cast("long").alias("bits_sum")))
    out = (df.select(id_col).join(per_doc, id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                   F.coalesce("bits_sum", F.lit(0)).alias("bits_sum")))
    return out.select(
        id_col, "n_bigrams",
        F.when(F.col("n_bigrams") > 0,
               F.expr("bits_sum * 1000 DIV n_bigrams"))
         .otherwise(0).cast("long").alias("surprisal_millibits"))


def sql_bigram_surprisal(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    bg = _sql_bigrams(text_col)
    return f"""
        WITH ex AS (
            SELECT {id_col}, unnest({bg}) AS bg FROM {table}
        ), counts AS (
            SELECT bg, COUNT(*) AS n FROM ex GROUP BY bg
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts
        ), per AS (
            SELECT e.{id_col},
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(length(bin(t.n_total)) - length(bin(c.n)))
                        AS BIGINT) AS bits_sum
            FROM ex e JOIN counts c ON c.bg = e.bg CROSS JOIN tot t
            GROUP BY e.{id_col}
        )
        SELECT d.{id_col},
               CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(CASE WHEN COALESCE(p.n_bigrams, 0) > 0
                    THEN p.bits_sum * 1000 // p.n_bigrams
                    ELSE 0 END AS BIGINT) AS surprisal_millibits
        FROM {table} d LEFT JOIN per p ON p.{id_col} = d.{id_col}
    """
