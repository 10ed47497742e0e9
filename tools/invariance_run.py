"""Partition-invariance evidence: the full oracle comparator under an
ADVERSARIAL engine config.

The external driver builds a plain ``local[8]`` session; tools/drive_entry.py
simulates exactly that. This tool re-runs the identical full-oracle comparison
under a deliberately different execution geometry — odd core counts, tiny or
mismatched ``spark.sql.shuffle.partitions``, AQE disabled — to prove the
registered queries' RESULTS are independent of partitioning. That is the core
distributed-correctness property a 1000-executor cluster relies on: any
query whose answer depends on split count, task order, or runtime re-planning
(unstable top-k ties, accumulation-order floats that escape the rounding
rules, partition-local state) MISMATCHES here even though drive_entry.py is
green.

Usage:
    python tools/invariance_run.py [master] [shuffle_partitions] [aqe] [sf_dir]
    # defaults: local[3] 7 true /root/testdata/sf0.01
    # example:  python tools/invariance_run.py local[5] 13 false
    # example:  python tools/invariance_run.py local[8] 200 true /root/testdata/sf0.001
    #           (scale-robustness: same oracles at a 10x-smaller corpus —
    #           catches constants accidentally tuned to the sf0.01 fixture)

Exit 0 = every oracled query matches under this geometry.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402
import duckdb  # noqa: E402

MASTER = sys.argv[1] if len(sys.argv) > 1 else "local[3]"
SHUFFLE = sys.argv[2] if len(sys.argv) > 2 else "7"
AQE = sys.argv[3] if len(sys.argv) > 3 else "true"
SF_DIR = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master(MASTER)
    .appName(f"invariance-{MASTER}-sp{SHUFFLE}-aqe{AQE}")
    .config("spark.sql.shuffle.partitions", SHUFFLE)
    .config("spark.default.parallelism", SHUFFLE)
    .config("spark.sql.adaptive.enabled", AQE)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

df = e.entry(spark)
rows = df.collect()
print(f"config: master={MASTER} shuffle={SHUFFLE} aqe={AQE} sf={SF_DIR}")
print("ENTRY rows:", len(rows))
assert len(rows) > 0

qs, os_ = e.queries(), e.oracle_sql()
con = duckdb.connect()
from sqload_spark.sources.tables import TABLE_NAMES  # noqa: E402

for t in TABLE_NAMES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

sys.path.insert(0, "/root/repo/tests")
from conftest import canon_rows  # noqa: E402

ok = bad = skipped = 0
t_all = time.time()
for name, fn in sorted(qs.items()):
    if name not in os_:
        skipped += 1
        continue
    t0 = time.time()
    sp = fn(spark, SF_DIR).toPandas()
    du = con.execute(os_[name]).fetchdf()
    match = len(sp) == len(du) and canon_rows(sp) == canon_rows(du)
    if not match:
        print(f"MISMATCH  {name:35s} rows={len(sp):6d} {time.time()-t0:5.1f}s")
    ok += match
    bad += not match
print(
    f"RESULT[{MASTER} sp={SHUFFLE} aqe={AQE} {SF_DIR}]: {ok} match, {bad} mismatch, "
    f"{skipped} rows-only skipped, {time.time()-t_all:.0f}s"
)
sys.exit(1 if bad else 0)
