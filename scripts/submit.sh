#!/usr/bin/env bash
# Launch the KG pipeline via spark-submit --py-files (north-rule launch
# mode). Usage: scripts/submit.sh /tmp/kg_out [extra run_pipeline args]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:?usage: submit.sh <out_dir> [args...]}"
shift || true
ZIP="$(mktemp -d)/tortank_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" tortank_spark -x '*__pycache__*')
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --py-files "$ZIP" \
  "$REPO/scripts/run_pipeline.py" --out "$OUT" "$@"
