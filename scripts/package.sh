#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ner_pytorch_spark.zip
zip -qr dist/ner_pytorch_spark.zip ner_pytorch_spark -x '*/__pycache__/*'
echo "dist/ner_pytorch_spark.zip"
