"""log_collector_spark — a PySpark-native parse→enrich→route→aggregate engine.

A brand-new engine with the query/data-processing capabilities of the
reference agent ``wonechao/log-collector`` (a threaded Java log shipper),
re-expressed Spark-first:

- grok/CSV parsing as **vectorized pandas UDFs** over Arrow batches
  (precompiled pattern dictionaries applied per-batch; no per-row Python UDFs),
- lookup enrichment as **broadcast hash joins**,
- sink selection as a **routing decision-table column** + partitioned fan-out
  writes,
- metrics/counters as **native Catalyst aggregations**,
- offset/checkpoint semantics as a **checkpoint table + idempotent resume**
  (batch) and Structured Streaming checkpoints (streaming).

The single source of truth for reference semantics is the pure-Python kernel
under :mod:`log_collector_spark.grok` — the vectorized Spark path reuses the
same compiled artifacts and is tested for byte-equality against it.
"""

__version__ = "0.1.0"
