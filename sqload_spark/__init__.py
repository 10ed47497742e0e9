"""sqload_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``raywill/sqload`` (a single-file C++ random-CSV generator for SQL bulk-load
testing, ``/root/reference/generate_csv.cpp``), rebuilt Spark-first:

* ``plans/``      — the generator front end: type-spec grammar parser and the
                    planner that turns column specs into Catalyst ``Column``
                    expressions (the "logical plan" of a synthetic table).
* ``sources/``    — table catalog over the driver test data, the distributed
                    synthetic-table source (``spark.range`` + exprs), sinks
                    (reference-style unquoted CSV, partitioned parquet, JDBC).
* ``functions/``  — deterministic hash-based randomness, vector math over
                    ``array<float>`` embeddings, text/hashing helpers.
* ``operators/``  — the query surface: relational core (joins, aggs, windows,
                    set ops), LLM-pipeline operators (dedup, similarity
                    search, text analysis, multimodal), time-series ops.
* ``streaming/``  — Structured Streaming variants of the time-series ops.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection and whole-stage codegen; Python UDFs are avoided in hot paths.
"""

__version__ = "0.1.0"
