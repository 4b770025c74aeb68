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


def test_py_files_zip_is_self_contained(tmp_path):
    """north_rule deployment shape: under `spark-submit --py-files pkg.zip`
    every executor zipimports the package — the bundled grok dictionary must
    load through the zip (importlib.resources), not an on-disk __file__
    path. Builds the dist zip and parses a line with the kernel imported
    FROM THE ZIP in a clean subprocess."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["bash", "scripts/package.sh"], cwd=repo,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    zip_path = os.path.join(repo, "dist", "log_collector_spark.zip")
    child = f"""
import sys
sys.path = [p for p in sys.path if p not in ("", {repo!r})]
sys.path.insert(0, {zip_path!r})
import log_collector_spark
assert {zip_path!r} in log_collector_spark.__file__, \\
    f"imported from {{log_collector_spark.__file__}}, not the zip"
from log_collector_spark.grok import GrokCompiler, parse_line, serialize_record
cg = GrokCompiler().compile(
    r"\\[%{{NOTSPACE:logtype}}\\] %{{GREEDYDATA:payload}}")
print(serialize_record(parse_line(cg, "[elk] hello world")))
"""
    r = subprocess.run([sys.executable, "-c", child],
                       capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert '"logtype":"elk"' in r.stdout and '"payload":"hello world"' in r.stdout


def test_check_oracle_decimal_compare_is_exact():
    """VERDICT r3 item 2: the local gate must not be float-blind — two
    DECIMAL(38,10) values differing past float64's ~16 significant digits
    must compare unequal, while scale-only differences (1.20 vs 1.2000)
    stay equal."""
    import importlib.util
    import os
    from decimal import Decimal

    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "check_oracle.py"))
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)

    a = Decimal("123456789.1234567890")
    b = Decimal("123456789.1234567891")  # differs at the 19th digit
    assert float(a) == float(b)          # the OLD compare was blind to this
    assert co.norm_cell(a) != co.norm_cell(b)
    assert co.norm_cell(Decimal("1.20")) == co.norm_cell(Decimal("1.2000"))
    assert co.norm_cell(Decimal("0.00")) == co.norm_cell(Decimal("0"))
