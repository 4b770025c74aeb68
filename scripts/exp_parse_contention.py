#!/usr/bin/env python
"""Isolate the parse kernel's multi-core scaling from Spark/JVM effects.

Runs parse_batch on identical 60k-row batches in K pinned worker processes
(cores 0..K-1, burner on the rest) and reports per-process batch throughput.
If per-batch time inflates as K grows, the kernel itself is
bandwidth/LLC-bound — the contention lives in python, not the JVM.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(core: int, n_batches: int, batch_rows: int) -> None:
    os.sched_setaffinity(0, {core})
    import pandas as pd
    from log_collector_spark.plans import pipeline as pl
    from log_collector_spark.grok.vectorized import VectorizedGrokParser
    from log_collector_spark.sources import transcripts as tx

    parser = VectorizedGrokParser(
        pl.compiled_transcript_grok(),
        provenance={"directory": "transcripts", "host": "spark",
                    "filename": "transcripts"})
    df = tx.generate_transcripts(batch_rows, seed=7)
    text = pd.Series(df["text"].to_numpy())
    parser.parse_batch(text)  # warm
    t0 = time.perf_counter()
    for _ in range(n_batches):
        parser.parse_batch(text)
    dt = time.perf_counter() - t0
    print(json.dumps({"core": core, "sec_per_batch": dt / n_batches}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        sys.exit(0)
    import bench
    batch_rows = int(os.environ.get("EXP_BATCH_ROWS", "60000"))
    n_batches = int(os.environ.get("EXP_BATCHES", "8"))
    for k in (1, 2, 8):
        burner = subprocess.Popen(
            [sys.executable, "-c", bench.BURNER_SRC, f"{k}-31"],
            start_new_session=True)
        try:
            procs = [subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(c), str(n_batches), str(batch_rows)],
                stdout=subprocess.PIPE, text=True) for c in range(k)]
            outs = [json.loads(p.communicate()[0].strip().splitlines()[-1])
                    for p in procs]
            per = [o["sec_per_batch"] for o in outs]
            print(json.dumps({"k": k, "batch_rows": batch_rows,
                              "mean_sec_per_batch": round(sum(per) / k, 4),
                              "max": round(max(per), 4)}), flush=True)
        finally:
            try:
                os.killpg(burner.pid, signal.SIGKILL)
            except OSError:
                pass
            burner.wait()
