#!/usr/bin/env bash
# Build dist/remine_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/remine_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/remine_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("remine_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/remine_spark.zip written")
EOF
