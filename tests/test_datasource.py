"""Laws for the `sqload` Python Data Source (sources/datasource.py):
backend equivalence, partition invariance, full-type-surface loads, and
the reference's rkey bijection through the source path."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqload_spark.sources.datasource import register
from sqload_spark.sources.generate import generate_table

MIXED_SPEC = "key,rkey,int,varchar(20),decimal(10,2),date"
ALL_TYPES = (
    "key,rkey,bit,tinyint,smallint,mediumint,int,bigint,float,double,"
    "char(5),nchar(3),varchar(10),varchar2(10),nvarchar2(3),text,blob,"
    "date,datetime,timestamp,time,year,decimal(10,2),number(20,4)"
)


def _load(spark, rows, spec, seed, parts):
    register(spark)
    return (
        spark.read.format("sqload")
        .option("rows", rows)
        .option("spec", spec)
        .option("seed", seed)
        .option("partitions", parts)
        .load()
    )


def test_source_equals_arrow_backend(spark):
    src = _load(spark, 2000, MIXED_SPEC, seed=7, parts=4)
    ref = generate_table(spark, 2000, MIXED_SPEC, seed=7, impl="arrow")
    assert src.schema == ref.schema
    assert set(map(tuple, src.collect())) == set(map(tuple, ref.collect()))


def test_source_partition_invariant(spark):
    a = set(map(tuple, _load(spark, 2000, MIXED_SPEC, 7, parts=1).collect()))
    b = set(map(tuple, _load(spark, 2000, MIXED_SPEC, 7, parts=16).collect()))
    assert a == b


def test_source_all_types_loads(spark):
    df = _load(spark, 300, ALL_TYPES, seed=3, parts=3)
    assert len(df.schema.fields) == 24
    assert df.count() == 300


def test_source_rkey_reference_bijection(spark):
    rows = (
        _load(spark, 3, "key,rkey", seed=0, parts=1)
        .orderBy("c0")
        .select(F.col("c1").cast("string"))
        .collect()
    )
    # reference binary's first three rkey outputs (SURVEY.md §1.1)
    assert [r[0] for r in rows] == ["9223372036854775808", "1", "9223372036854775809"]
