#!/usr/bin/env bash
# Package and launch the pipeline via spark-submit --py-files (north_rule
# deployment shape). Locally this uses local[N]; on a cluster pass
# --master/--deploy-mode through EXTRA_SPARK_ARGS.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
OUT="${1:-/tmp/ictspark_out}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}"

cd "$REPO"
rm -f /tmp/ictspark.zip
zip -qr /tmp/ictspark.zip ictspark -x '*__pycache__*'

SYNTH_DIR="$(python -c "from ictspark import synth; print(synth.synth_dir_for('$SF_DIR'))")"

spark-submit \
  --master "local[$CPUS]" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=$((CPUS * 2)) \
  --py-files /tmp/ictspark.zip \
  ${EXTRA_SPARK_ARGS:-} \
  ictspark/job.py batch \
  --transcripts "$SYNTH_DIR/transcripts.parquet" \
  --tool-dim "$SYNTH_DIR/tool_dim.parquet" \
  --out "$OUT"
