"""Simulate the driver: plain SparkSession, import __spark_entry__, smoke entry(),
run every query at sf0.01, compare each oracle via DuckDB."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", df.schema.simpleString())
assert len(rows) > 0

qs, os_ = e.queries(), e.oracle_sql()
print("queries:", len(qs), "oracles:", len(os_))
con = duckdb.connect()
from sqload_spark.sources.tables import TABLE_NAMES
for t in TABLE_NAMES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

sys.path.insert(0, "/root/repo/tests")
from conftest import canon_rows
ok = bad = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sp = fn(spark, "/root/testdata/sf0.01").toPandas()
    if name in os_:
        du = con.execute(os_[name]).fetchdf()
        match = len(sp)==len(du) and canon_rows(sp)==canon_rows(du)
        print(f"{'MATCH' if match else 'MISMATCH':9s} {name:35s} rows={len(sp):6d} {time.time()-t0:5.1f}s")
        ok += match; bad += (not match)
    else:
        print(f"{'ROWS-ONLY':9s} {name:35s} rows={len(sp):6d} {time.time()-t0:5.1f}s")
print(f"RESULT: {ok} match, {bad} mismatch")
sys.exit(1 if bad else 0)
