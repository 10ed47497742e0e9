"""Check a subset of registered queries against their DuckDB oracles at
sf0.01 (driver strictness). Usage:

    python tools/check_queries.py name1 name2 ...
    python tools/check_queries.py --prefix q2_ q4_

With no args, checks every registered query (same as drive_entry.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402
import duckdb  # noqa: E402

names = [a for a in sys.argv[1:] if not a.startswith("--")]
prefixes = []
if "--prefix" in sys.argv:
    i = sys.argv.index("--prefix")
    prefixes = sys.argv[i + 1 :]
    names = [a for a in sys.argv[1:i] if not a.startswith("--")]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("check-queries")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

qs, os_ = e.queries(), e.oracle_sql()
if prefixes:
    for p in prefixes:
        hits = [n for n in qs if n.startswith(p)]
        if not hits:
            print(f"prefix matched no registered query: {p!r}")
            sys.exit(2)
        names += hits
if not names and not prefixes:
    names = list(qs)
missing = [n for n in names if n not in qs]
if missing:
    print("unknown queries:", missing)
    sys.exit(2)

con = duckdb.connect()
from sqload_spark.sources.tables import TABLE_NAMES
for t in TABLE_NAMES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )

sys.path.insert(0, "/root/repo/tests")
from conftest import canon_rows  # noqa: E402

ok = bad = 0
for name in names:
    t0 = time.time()
    try:
        sp = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    except Exception as ex:  # noqa: BLE001
        print(f"ERROR     {name:35s} {type(ex).__name__}: {ex}")
        bad += 1
        continue
    if name in os_:
        du = con.execute(os_[name]).fetchdf()
        match = len(sp) == len(du) and canon_rows(sp) == canon_rows(du)
        print(f"{'MATCH' if match else 'MISMATCH':9s} {name:35s} rows={len(sp):6d} "
              f"oracle={len(du):6d} {time.time()-t0:5.1f}s")
        if not match and len(sp) == len(du):
            a, b = canon_rows(sp), canon_rows(du)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print("  spark :", x)
                print("  oracle:", y)
        ok += match
        bad += not match
    else:
        print(f"ROWS-ONLY {name:35s} rows={len(sp):6d} {time.time()-t0:5.1f}s")
print(f"RESULT: {ok} match, {bad} mismatch")
sys.exit(1 if bad else 0)
