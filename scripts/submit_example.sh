#!/usr/bin/env bash
# Run the index build + a query via spark-submit --py-files on a
# multi-executor master (local-cluster here; any cluster manager in
# production). Proves the north rule's deployment contract.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/greynirserver_spark.zip
rm -f "$ZIP"
(cd "$(pwd)" && zip -qr "$ZIP" greynirserver_spark)

MASTER="${SPARK_SUBMIT_MASTER:-local-cluster[2,4,4096]}"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --conf spark.sql.files.maxPartitionBytes=16777216 \
  --py-files "$ZIP" \
  scripts/submit_job.py "${1:-500}" "${2:-/tmp/submit-store}"
