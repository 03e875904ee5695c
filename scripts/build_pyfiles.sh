#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ctd_spark.zip
zip -qr dist/ctd_spark.zip comic_text_detector_spark -x '*__pycache__*'
echo "dist/ctd_spark.zip:"
unzip -l dist/ctd_spark.zip | tail -2
