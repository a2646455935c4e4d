#!/usr/bin/env bash
# Launch the extraction pipeline via spark-submit --py-files, as the
# north rule mandates for multi-executor clusters.
#
# Usage:
#   scripts/submit.sh <input_parquet> <output_path> [spark-submit args...]
#
# On a real cluster, prepend e.g.:
#   --master yarn --deploy-mode cluster \
#   --num-executors "$N" --executor-cores 4 --executor-memory 8g \
#   --conf spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
# and run once with N and once with 4N executors for the scaling check.
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
INPUT="${1:?input parquet path}"
OUTPUT="${2:?output path}"
shift 2

ZIP="$(mktemp -d)/pdf_ai_mapper_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" pdf_ai_mapper_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  "$@" \
  "$REPO/scripts/run_pipeline.py" "$INPUT" "$OUTPUT"
