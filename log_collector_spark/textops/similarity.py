"""Similarity search over an embedding column (array<float>).

- **Brute-force top-k** (the exact baseline): broadcast the query set,
  integer-quantized dot products, per-query window top-k. At scale this is
  one narrow pass over the corpus (queries are broadcast; no corpus shuffle)
  + a top-k shuffle of only k·|queries| candidate rows — Spark's
  rank-within-partition + global re-rank would cut that further, but the
  window over (query_id) is already tiny.
- **LSH-bucketed ANN** (the scale path): sign-LSH buckets (same planes as
  dedup) restrict each query to its bucket; multiprobe = exact Hamming-1
  neighbor buckets. Integer arithmetic throughout → value-identical DuckDB
  oracle generated from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log_collector_spark.textops import common as C
from log_collector_spark.textops.dedup import (
    EMB_PLANES, _emb_bucket,
)

TOP_K = 5
QUERY_MOD = 100  # vec_id % QUERY_MOD == 0 → query vector


def _quantized(df: DataFrame, vec_col: str) -> DataFrame:
    return df.select("vec_id",
                     C.quantized_embedding(F.col(vec_col)).alias("q"))


def brute_force_topk(df: DataFrame, vec_col: str = "embedding",
                     k: int = TOP_K, query_mod: int = QUERY_MOD) -> DataFrame:
    """Exact top-k neighbors by integer dot product for each query vector
    (ties broken by vec_id). Self-match excluded."""
    q = _quantized(df, vec_col)
    queries = q.filter(F.col("vec_id") % query_mod == 0) \
               .select(F.col("vec_id").alias("query_id"),
                       F.col("q").alias("qv"))
    corpus = q.select(F.col("vec_id").alias("cand_id"), F.col("q").alias("cv"))
    scored = (corpus.join(F.broadcast(queries),
                          F.col("cand_id") != F.col("query_id"))
              .select("query_id", "cand_id",
                      C.int_dot(F.col("qv"), F.col("cv")).alias("dot")))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "cand_id", "dot",
                          F.col("rank").cast("int").alias("rank")))


def sql_brute_force_topk(table: str = "embeddings", k: int = TOP_K,
                         query_mod: int = QUERY_MOD) -> str:
    qe = C.sql_quantized_embedding("embedding")
    return f"""
        WITH q AS (SELECT vec_id, {qe} AS q FROM {table}),
        scored AS (
            SELECT qs.vec_id AS query_id, c.vec_id AS cand_id,
                   CAST(list_dot_product(qs.q, c.q) AS BIGINT) AS dot
            FROM q qs JOIN q c ON c.vec_id <> qs.vec_id
            WHERE qs.vec_id % {query_mod} = 0
        )
        SELECT query_id, cand_id, dot, CAST(rank AS INT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY dot DESC, cand_id) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def lsh_ann_topk(df: DataFrame, vec_col: str = "embedding",
                 k: int = TOP_K, query_mod: int = QUERY_MOD) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket and its Hamming-1 neighbor buckets (multiprobe), then exact
    integer dot re-rank. Deterministic → construct-equal oracle."""
    q = _quantized(df, vec_col).withColumn("bucket",
                                           _emb_bucket(F.col("q")))
    probes = F.array(*([F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(1 << j) for j in range(len(EMB_PLANES))]))
    queries = (q.filter(F.col("vec_id") % query_mod == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("q").alias("qv"),
                       F.explode(probes).alias("probe")))
    corpus = q.select(F.col("vec_id").alias("cand_id"),
                      F.col("q").alias("cv"), F.col("bucket"))
    scored = (corpus.join(F.broadcast(queries),
                          (F.col("bucket") == F.col("probe")) &
                          (F.col("cand_id") != F.col("query_id")))
              .select("query_id", "cand_id",
                      C.int_dot(F.col("qv"), F.col("cv")).alias("dot"))
              .distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "cand_id", "dot",
                          F.col("rank").cast("int").alias("rank")))


def sql_lsh_ann_topk(table: str = "embeddings", k: int = TOP_K,
                     query_mod: int = QUERY_MOD) -> str:
    qe = C.sql_quantized_embedding("embedding")
    bucket_terms = " + ".join(
        "CASE WHEN CAST(list_dot_product(q, {plane}::BIGINT[]) AS BIGINT) > 0 "
        "THEN CAST({bit} AS BIGINT) ELSE 0 END".format(
            plane=str(plane), bit=1 << j)
        for j, plane in enumerate(EMB_PLANES))
    probe_list = "[bucket" + "".join(
        f", xor(bucket, CAST({1 << j} AS BIGINT))"
        for j in range(len(EMB_PLANES))) + "]"
    return f"""
        WITH q AS (
            SELECT vec_id, {qe} AS q FROM {table}
        ), qb AS (
            SELECT vec_id, q, {bucket_terms} AS bucket FROM q
        ), queries AS (
            SELECT vec_id AS query_id, q AS qv, unnest({probe_list}) AS probe
            FROM qb WHERE vec_id % {query_mod} = 0
        ), scored AS (
            SELECT DISTINCT qs.query_id, c.vec_id AS cand_id,
                   CAST(list_dot_product(qs.qv, c.q) AS BIGINT) AS dot
            FROM queries qs JOIN qb c
              ON c.bucket = qs.probe AND c.vec_id <> qs.query_id
        )
        SELECT query_id, cand_id, dot, CAST(rank AS INT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY dot DESC, cand_id) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """
