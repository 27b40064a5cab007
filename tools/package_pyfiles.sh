#!/bin/sh
# Build the --py-files artifact for spark-submit (north_rule packaging).
#   sh tools/package_pyfiles.sh  →  dist/bfokg.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/bfokg.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/bfokg.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("bfokg"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/bfokg.zip")
EOF
