#!/usr/bin/env bash
# Launch the bench via spark-submit --py-files (north_rule launch mode).
#
# On a real cluster, swap --master for yarn/k8s and size executors:
#   spark-submit --master k8s://... --num-executors $N ...
# The two-cluster-size scaling protocol (N vs 4N executors) maps in this
# sandbox to local[8] vs local[32] (see bench.py --scaling).
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP=/tmp/maup_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('maup_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"

exec spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  bench.py "$@"
