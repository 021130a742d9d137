#!/usr/bin/env bash
# Full verification sweep: pytest, oracle parity at three scale factors,
# plain-session entry smoke, and the bench JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

for sf in 0.001 0.01 0.1; do
  echo "== oracle parity sf$sf =="
  python tools/check.py "/root/testdata/sf$sf"
done

echo "== entry smoke (plain session) =="
python - <<'EOF'
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as E
df = E.entry(spark)
print(df.schema.simpleString(), len(df.collect()), "rows")
EOF

echo "== bench =="
python bench.py
