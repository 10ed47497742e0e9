"""Adversarial-content evidence: the full oracle comparator over a DIRTY
corpus.

The sf* fixtures are clean — every document non-empty ASCII, every
embedding a well-conditioned 64-dim vector. A real 100 TB corpus is not:
it contains empty and whitespace-only documents, CJK/emoji/combining
unicode, regex metacharacters, kilotoken pathological repeats, NULL
fields from upstream extraction failures, and zero/degenerate vectors.
Cross-engine parity on THAT data is where Spark-vs-DuckDB semantic
divergence actually lives (null propagation through split/explode,
0/0 arithmetic, unicode length semantics, regex dialects) — a query
family can be hash-green on every clean fixture and still disagree with
its oracle on the first dirty shard of production data.

This tool builds a deterministic dirty corpus in a scratch dir (the
sf0.001 tables, with `documents` extended by adversarial rows and
`embeddings` extended by degenerate vectors), then re-runs the IDENTICAL
drive_entry comparator over it: every oracled query, Spark vs DuckDB on
the same files, strict hash compare. Queries that never touch
documents/embeddings re-verify unchanged — the run doubles as one more
full-comparator geometry.

Usage:
    python tools/adversarial_run.py [--docs-only] [--keep] [--only name...]

Contract boundaries the corpus deliberately respects (documented, not
dodged): doc_id/vec_id stay unique and non-null (they are join keys —
upstream assigns them), `n_chars` stays consistent with `text` (it is a
derived column), embeddings stay 64-dim (the pipeline's fixed model
width), and no NaN literals are injected (NaN != NaN breaks EVERY
engine's group/join semantics identically — upstream ingestion must
drop them; a NaN-tolerant comparator would only hide that requirement).
Everything else — empties, nulls in text/lang/source, unicode, zero and
huge and tiny vectors, exact-duplicate vectors (top-k tie stress) — is
fair game.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from sqload_spark.session import scratch_dir  # noqa: E402
from sqload_spark.sources.tables import TABLE_NAMES  # noqa: E402

BASE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Adversarial documents: appended after the 500 clean sf0.001 rows with
# doc_ids from 100000 (collision-free). Every row is a named hazard.
# ---------------------------------------------------------------------------
ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source)  — n_chars derived below
    (100000, "", "en", "srcA"),                          # empty string
    (100001, " ", "en", "srcA"),                         # single space
    (100002, "\t\n  \n", "en", "srcA"),                  # whitespace-only
    (100003, "a", "en", "srcA"),                         # single char
    (100004, "spark " * 1000, "en", "srcB"),             # 1000x repeated token
    (100005, "数据 处理 系统 数据 处理 引擎", "zh", "srcB"),  # CJK
    (100006, "🚀 🚀 data 🚀 pipeline 🚀", "en", "srcB"),  # emoji (non-BMP)
    (100007, "café café naïve résumé", "fr", "srcB"),    # combining accents
    (100008, "!!! ??? ... ;;; :::", "en", "srcC"),       # punctuation-only
    (100009, "123 456 789 000 111", "en", "srcC"),       # digits-only
    (100010, "line1\nline2\nline3\nline4", "en", "srcC"),  # embedded newlines
    (100011, "tab\tseparated\ttokens\there", "en", "srcC"),  # embedded tabs
    (100012, "SPARK Spark spark sPaRk", "en", "srcD"),   # case variants
    (100013, "a.b*c(d)e[f]g{h}i|j+k?l^m$n", "en", "srcD"),  # regex metachars
    (100014, "quote\"mixed'back`tick", "en", "srcD"),    # quote chars
    (100015, "comma,semi;colon:dash-slash/", "en", "srcD"),  # csv-hostile
    (100016, ("lorem ipsum dolor sit amet " * 2000).strip(), "en", "srcE"),  # ~54 KB doc
    (100017, "word", None, "srcE"),                      # NULL lang
    (100018, "word word", "en", None),                   # NULL source
    (100019, None, "en", "srcE"),                        # NULL text
    (100020, "ünïcödé länge tëst ünïcödé", "de", "srcE"),  # latin-1 diacritics
    (100021, "x y " * 5000, "en", "srcE"),               # 10k tiny tokens
]

# Adversarial events: event_ids from 100000. The ingestion-shaped hazards
# of a real event stream: NULL dimensions (failed enrichment), malformed
# and shape-shifting JSON props, empty/unicode event types, negative and
# huge values, exact window-boundary and tied timestamps, and epoch
# outliers that stress watermark/date logic.
ADVERSARIAL_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (100000, "2024-01-15 00:00:00.000000", 3, "click", 1.0, '{"k": 1}'),      # exact 10-min boundary
    (100001, "2024-01-15 00:10:00.000000", 3, "click", 1.0, '{"k": 2}'),      # next boundary, same user
    (100002, "2024-01-15 00:10:00.000000", 3, "view", 2.0, '{"k": 3}'),       # tied ts, same user
    (100003, "2024-01-15 00:10:00.000000", 4, "click", 2.0, '{"k": 4}'),      # tied ts, other user
    (100004, "2024-01-16 12:00:00.000000", None, "click", 1.5, '{"k": 5}'),   # NULL user
    (100005, "2024-01-16 12:01:00.000000", 5, None, 1.5, '{"k": 6}'),         # NULL type
    (100006, "2024-01-16 12:02:00.000000", 5, "", 1.5, '{"k": 7}'),           # empty type
    (100007, "2024-01-16 12:03:00.000000", 5, "点击", 1.5, '{"k": 8}'),        # unicode type
    (100008, "2024-01-17 08:00:00.000000", 6, "click", None, '{"k": 9}'),     # NULL value
    (100009, "2024-01-17 08:01:00.000000", 6, "click", -50.0, '{"k": 10}'),   # negative value
    (100010, "2024-01-17 08:02:00.000000", 6, "click", 0.0, '{"k": 11}'),     # zero value
    (100011, "2024-01-18 09:00:00.000000", 7, "click", 3.0, None),            # NULL props
    (100012, "2024-01-18 09:01:00.000000", 7, "click", 3.0, "{not json"),     # malformed JSON
    (100013, "2024-01-18 09:02:00.000000", 7, "click", 3.0, "[]"),            # JSON array, not object
    (100014, "2024-01-18 09:03:00.000000", 7, "click", 3.0, "{}"),            # missing key
    (100015, "2024-01-18 09:04:00.000000", 7, "click", 3.0, '{"k": "str"}'),  # wrong value type
    (100016, "2024-01-18 09:05:00.000000", 7, "click", 3.0, '{"k": {"a": 1}}'),  # nested value
    (100017, "2024-01-02 23:59:59.999999", 8, "click", 4.0, '{"k": 12}'),     # day-boundary micros
]

# Adversarial embeddings: vec_ids from 100000, 64-dim each.
DIM = 64


def _adversarial_embeddings():
    rows = []
    rows.append((100000, [0.0] * DIM, 0))                      # zero vector
    rows.append((100001, [1e-30] * DIM, 1))                    # denormal-tiny
    rows.append((100002, [1e15] * DIM, 2))                     # huge magnitude
    rows.append((100003, [-1.0] * DIM, 3))                     # all-negative
    base = [((i * 37 + 11) % 97 - 48) / 97.0 for i in range(DIM)]
    rows.append((100004, base, 4))                             # deterministic
    rows.append((100005, list(base), 4))                       # EXACT duplicate (tie stress)
    rows.append((100006, [1.0] + [0.0] * (DIM - 1), 5))        # one-hot
    rows.append((100007, None, 5))                             # NULL embedding
    return rows


def build_corpus(docs_only: bool) -> str:
    out = scratch_dir("sqload_adversarial_")
    for t in TABLE_NAMES:
        src = f"{BASE}/{t}.parquet"
        if t == "documents":
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE adv (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)"
            )
            con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?)", ADVERSARIAL_DOCS)
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT doc_id, text, lang, source, length(text) AS n_chars FROM adv
                ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
                """
            )
            con.close()
        elif t == "events" and not docs_only:
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE adv (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR)"
            )
            con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?, ?, ?)", ADVERSARIAL_EVENTS)
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM adv
                ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
                """
            )
            con.close()
        elif t == "embeddings" and not docs_only:
            con = duckdb.connect()
            con.execute("CREATE TABLE adv (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
            con.executemany("INSERT INTO adv VALUES (?, ?, ?)", _adversarial_embeddings())
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM adv
                ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
                """
            )
            con.close()
        else:
            shutil.copyfile(src, f"{out}/{t}.parquet")
    return out


def main() -> int:
    docs_only = "--docs-only" in sys.argv
    only: list[str] = []
    if "--only" in sys.argv:
        only = [a for a in sys.argv[sys.argv.index("--only") + 1 :] if not a.startswith("--")]
    corpus = build_corpus(docs_only)
    print(f"adversarial corpus: {corpus}  (docs +{len(ADVERSARIAL_DOCS)}"
          + ("" if docs_only else
             f", embeddings +{len(_adversarial_embeddings())}, events +{len(ADVERSARIAL_EVENTS)}")
          + ")")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("adversarial-run").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{corpus}/{t}.parquet')")

    sys.path.insert(0, "/root/repo/tests")
    from conftest import canon_rows

    ok = bad = err = 0
    for name, fn in sorted(qs.items()):
        if name not in os_ or (only and name not in only):
            continue
        t0 = time.time()
        try:
            sp = fn(spark, corpus).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR     {name:35s} {type(ex).__name__}: {str(ex)[:120]}")
            err += 1
            continue
        try:
            du = con.execute(os_[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"ORA-ERROR {name:35s} {type(ex).__name__}: {str(ex)[:120]}")
            err += 1
            continue
        match = len(sp) == len(du) and canon_rows(sp) == canon_rows(du)
        tag = "MATCH" if match else "MISMATCH"
        print(f"{tag:9s} {name:35s} rows={len(sp):6d} oracle={len(du):6d} {time.time() - t0:5.1f}s")
        if not match and len(sp) == len(du):
            a, b = canon_rows(sp), canon_rows(du)
            for x, y in [(x, y) for x, y in zip(a, b) if x != y][:3]:
                print("  spark :", x)
                print("  oracle:", y)
        ok += match
        bad += not match
    print(f"RESULT: {ok} match, {bad} mismatch, {err} error")
    if "--keep" in sys.argv:
        print(f"corpus kept at {corpus}")
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    sys.exit(main())
