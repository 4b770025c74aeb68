"""P9 discovery + P10 verification harness (pure Python, no Spark)."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.grok.discovery import discover


def test_discover_substitutes_patterns():
    out = discover("2017-05-24 16:51:23 GET /index.html 200")
    assert "%{" in out and "}" in out
    assert discover("") == ""


def test_verify_cli_prints_example_result_pairs(tmp_path):
    sample = tmp_path / "s.log"
    sample.write_text('[elk] [2017-05-24 16:51:23] {"a":1}\nbad line\n')
    r = subprocess.run(
        [sys.executable, "-m", "log_collector_spark.verify", str(sample)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0
    assert '"logtype":"elk"' in r.stdout
    assert '"logtime":1495644683000' in r.stdout
    assert r.stdout.count("example:") == 2
    assert "{}" in r.stdout  # failed line prints an empty map
