#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule deployment shape).
#
#   scripts/package.sh                 # -> dist/log_collector_spark.zip
#   spark-submit --master yarn \
#     --py-files dist/log_collector_spark.zip \
#     --conf spark.sql.session.timeZone=UTC \
#     --conf spark.sql.adaptive.enabled=true \
#     scripts/submit_job.py --sf-dir /data/transcripts --out /data/out
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/log_collector_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/log_collector_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("log_collector_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".py", ".txt")):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/log_collector_spark.zip")
EOF
