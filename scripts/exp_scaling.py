#!/usr/bin/env python
"""Scaling-knob experiment harness (not part of the bench contract).

Runs the flagship scaling-child job pinned (taskset + burner, same
methodology as bench.py) at one parallelism level with a conf/mode
override, printing per-run times. Used to locate the non-scaling cost at
the 4N level. Modes:

  full   — full parse→enrich→route plan (the bench child)
  scan   — parquet scan only (JVM-side control: no python workers)
  parse  — scan + parse stage only (no enrich/route)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, mode: str, conf: dict) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from log_collector_spark.session import get_spark
    from log_collector_spark.plans import pipeline as pl
    from pyspark.sql import functions as F
    from pyspark.sql.observation import Observation

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_turns = int(os.environ.get("EXP_TURNS", "4800000"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name=f"exp_{mode}_{cpus}", extra_conf=conf)
    path = pl.transcripts_path(sf_dir, n_turns=n_turns)
    if mode == "scan":
        frame = spark.read.parquet(path)
    elif mode == "parse":
        frame = pl.parse_stage(spark.read.parquet(path))
    else:
        frame = pl.full_pipeline(spark, sf_dir, n_turns=n_turns)

    def one_run() -> float:
        obs = Observation()
        f2 = frame.observe(obs, F.count(F.lit(1)).alias("n"))
        t0 = time.perf_counter()
        f2.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        obs.get
        return dt

    runs = [one_run() for _ in range(int(os.environ.get("EXP_RUNS", "6")))]
    print(json.dumps({"cpus": cpus, "mode": mode, "conf": conf,
                      "all_sec": [round(s, 3) for s in runs],
                      "min": round(min(runs), 3)}))
    spark.stop()


def run_pinned(cpus: int, mode: str, conf: dict, total: int = 32) -> dict:
    import bench
    import signal
    burner = None
    if cpus < total:
        burner = subprocess.Popen(
            [sys.executable, "-c", bench.BURNER_SRC, f"{cpus}-{total - 1}"],
            start_new_session=True)
    try:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   EXP_CONF=json.dumps(conf))
        cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
               os.path.abspath(__file__), "--child", str(cpus), mode]
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=1200)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            return {"err": r.stderr[-2000:]}
    finally:
        if burner is not None:
            try:
                os.killpg(burner.pid, signal.SIGKILL)
            except OSError:
                pass
            burner.wait()


if __name__ == "__main__":
    if sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3],
              json.loads(os.environ.get("EXP_CONF", "{}")))
    else:
        # driver: args are "cpus:mode[:confjson]" specs
        for spec in sys.argv[1:]:
            parts = spec.split(":", 2)
            cpus, mode = int(parts[0]), parts[1]
            conf = json.loads(parts[2]) if len(parts) > 2 else {
                "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
                "spark.sql.files.openCostInBytes": str(1024 * 1024)}
            print(json.dumps(run_pinned(cpus, mode, conf)), flush=True)
