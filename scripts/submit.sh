#!/usr/bin/env bash
# Package the library and run the pipeline via spark-submit --py-files,
# the deployment path the north_rule prescribes for cluster runs.
#
# Usage: scripts/submit.sh <pages_path> <warehouse> [spark-submit args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:?pages path}"
WAREHOUSE="${2:?warehouse path}"
shift 2 || true

ZIP="$(mktemp -d)/knowledgegraph_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" knowledgegraph_spark -x '*__pycache__*')

JOB="$(mktemp -d)/job.py"
cat > "$JOB" <<'PY'
import sys
from knowledgegraph_spark import get_spark
from knowledgegraph_spark.plans.pipeline import run_pipeline

pages_path, warehouse = sys.argv[1], sys.argv[2]
spark = get_spark("kg-submit")
pages = spark.read.parquet(pages_path)
cat = run_pipeline(spark, pages, warehouse)
print("triples:", cat.read("triples").count())
print("entities:", cat.read("entity_nodes").count())
spark.stop()
PY

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  "$@" \
  "$JOB" "$PAGES" "$WAREHOUSE"
