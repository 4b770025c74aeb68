#!/usr/bin/env python
"""spark-submit entry point: resumable parse→enrich→route→aggregate run.

Cluster usage (the north_rule deployment shape)::

    scripts/package.sh
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/log_collector_spark.zip \
        scripts/submit_job.py \
        --input /data/transcripts --checkpoint /data/ckpt \
        --out /data/routed --run-id run-2026-08-17

Local smoke (no cluster manager)::

    python scripts/submit_job.py --input /tmp/spark_graft_transcripts/sf0.001 \
        --checkpoint /tmp/ck --out /tmp/routed --run-id smoke
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts table (parquet dir or iceberg name)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--master", default=None,
                    help="override master for local smoke runs")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from log_collector_spark.plans import checkpoint as ck

    if args.master:
        from log_collector_spark.session import get_spark
        spark = get_spark(master=args.master)
    else:
        # under spark-submit the session config comes from --conf; only the
        # semantics-critical TZ is enforced here
        spark = (SparkSession.builder
                 .config("spark.sql.session.timeZone", "UTC")
                 .getOrCreate())

    res = ck.run_resumable(spark, args.input, args.checkpoint, args.out,
                           args.run_id)
    print({"batch_id": res["batch_id"], "files": len(res["files"]),
           "rows": res["rows"]})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
