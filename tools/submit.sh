#!/usr/bin/env bash
# Cluster launch wrapper: package the engine and spark-submit it.
#
#   MASTER=spark://host:7077 tools/submit.sh ingest --input ... --output ...
#   tools/submit.sh stream --input ... --output ... --checkpoint ...   (local[*])
#
# The north-rule launch contract: spark-submit --py-files on a multi-executor
# cluster. MASTER defaults to local[*] in the sandbox; on a real cluster set
# MASTER (and any --conf via SPARK_SUBMIT_OPTS / extra args after --).
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[*]}"
ZIP=dist/enpa_spark.zip
python tools/build_pyfiles.py "$ZIP" >/dev/null

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  tools/submit_job.py "$@"
