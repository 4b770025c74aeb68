"""SparkSession factory with the engine's required configuration.

Centralized so tests, bench, and the driver contract all run with identical
semantics-critical settings:

- ``spark.sql.session.timeZone=UTC`` — the grok kernel pins UTC for
  SimpleDateFormat parity; a mismatched session TZ breaks epoch-ms equality,
- AQE on (skew-join + coalesce) — the scale story for hot conversations,
- Arrow enabled with a sized record batch — the parse stage is a pandas UDF
  over Arrow batches (the analog of the reference's ``file.reader.batch.size``,
  collect.properties:7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(master: str | None = None,
              app_name: str = "log_collector_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "60000")
        # python-worker allocator hygiene: high-core-count local mode suffers
        # TLB-shootdown/sys-time storms when 32 workers madvise/munmap freed
        # Arrow buffers back every batch — keep arenas few and let the pool
        # hold pages (measured: sys% 45→25, run-to-run variance collapses)
        .config("spark.executorEnv.MALLOC_ARENA_MAX", "2")
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        # generous broadcast threshold: all our dims are tiny
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # progress bars interleave with bench.py's one-line JSON on stdout
        # and can split it mid-token for the driver's tail capture
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
