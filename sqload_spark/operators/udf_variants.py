"""The UDF surface, demonstrated against expression-equivalent oracles.

Two operators intentionally recompute existing oracle-checked queries
through the Python-side APIs — a vectorized ``pandas_udf`` and a grouped
``applyInPandas`` — and register the SAME oracle. That proves the Arrow
exchange is lossless and the pandas implementations are semantically
identical to the JVM-expression versions, which is exactly the guarantee
you need before putting a Python stage in a 100 TB pipeline. (In the real
engine the expression versions are the hot path; these exist for the
operators built-ins can't express.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqload_spark.functions.text_funcs import STOPWORDS
from sqload_spark.operators.text import QUALITY_ORACLE, TOP_TERMS_ORACLE
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("n_tokens", T.LongType()),
            T.StructField("type_token_ratio", T.DoubleType()),
            T.StructField("stopword_ratio", T.DoubleType()),
            T.StructField("avg_token_len", T.DoubleType()),
            T.StructField("quality", T.DoubleType()),
        ]
    )
)
def _quality_features(text: pd.Series) -> pd.DataFrame:
    """Vectorized quality features (one Arrow batch per call)."""
    import math

    stop = set(STOPWORDS)
    rows = []
    for t in text:
        if t is None:
            # NULL text: the expression twin and the SQL oracle both
            # null-propagate (string_split(NULL) → NULL features), so the
            # Python path must emit the same all-NULL row, not crash the
            # stage (tools/adversarial_run.py).
            rows.append((None, None, None, None, None))
            continue
        toks = t.split(" ")
        n = len(toks)
        ttr = len(set(toks)) / n
        stop_ratio = sum(1 for w in toks if w in stop) / n
        avg_len = sum(len(w) for w in toks) / n
        quality = 0.4 * ttr + 0.3 * (1 - stop_ratio) + 0.3 * min(n / 50.0, 1.0)
        r4 = lambda x: math.floor(x * 10000.0 + 0.5) / 10000.0
        rows.append((n, r4(ttr), r4(stop_ratio), r4(avg_len), r4(quality)))
    return pd.DataFrame(rows, columns=["n_tokens", "type_token_ratio", "stopword_ratio", "avg_token_len", "quality"])


@query("text_quality_pandas_udf", oracle=QUALITY_ORACLE)
def quality_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_quality_score recomputed through a vectorized pandas_udf —
    must hash-match the same oracle as the expression version."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", _quality_features(F.col("text")).alias("f"))
        .select("doc_id", "f.n_tokens", "f.type_token_ratio", "f.stopword_ratio", "f.avg_token_len", "f.quality")
        .orderBy("doc_id")
    )


def _top_terms_group(pdf: pd.DataFrame) -> pd.DataFrame:
    lang = pdf["lang"].iloc[0]
    counts: dict[str, int] = {}
    for t in pdf["text"]:
        if t is None:
            # NULL text contributes no terms — unnest(string_split(NULL))
            # yields zero rows in the oracle.
            continue
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    return pd.DataFrame(
        {
            "lang": [lang] * len(ranked),
            "term": [w for w, _ in ranked],
            "n": [c for _, c in ranked],
            "rnk": list(range(1, len(ranked) + 1)),
        }
    )


@query("text_top_terms_applyinpandas", oracle=TOP_TERMS_ORACLE)
def top_terms_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 terms via grouped-map applyInPandas (each language
    group lands in one pandas frame) — same oracle as the explode/window
    expression version."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("lang", "text").groupBy("lang").applyInPandas(
        _top_terms_group, schema="lang string, term string, n long, rnk int"
    )
    return out.orderBy("lang", "rnk")


@query("text_quality_arrow_udf", oracle=QUALITY_ORACLE)
def quality_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD Python UDF flavor: an Arrow-optimized scalar UDF
    (``useArrow=True`` — row-signature Python with Arrow transport,
    Spark 4's upgrade over pickled row UDFs). Same oracle as the
    expression and pandas_udf versions, so all three execution paths are
    proven interchangeable. Scalar UDFs remain the slowest tier (one
    Python call per row vs per batch) — registered to complete the
    taxonomy, not as a hot path."""
    import math

    stop = set(STOPWORDS)

    @F.udf(
        returnType=T.StructType(
            [
                T.StructField("n_tokens", T.LongType()),
                T.StructField("type_token_ratio", T.DoubleType()),
                T.StructField("stopword_ratio", T.DoubleType()),
                T.StructField("avg_token_len", T.DoubleType()),
                T.StructField("quality", T.DoubleType()),
            ]
        ),
        useArrow=True,
    )
    def features(t: str):
        if t is None:
            # same NULL row the expression twin / oracle produce
            return (None, None, None, None, None)
        toks = t.split(" ")
        n = len(toks)
        ttr = len(set(toks)) / n
        stop_ratio = sum(1 for w in toks if w in stop) / n
        avg_len = sum(len(w) for w in toks) / n
        quality = 0.4 * ttr + 0.3 * (1 - stop_ratio) + 0.3 * min(n / 50.0, 1.0)
        r4 = lambda x: math.floor(x * 10000.0 + 0.5) / 10000.0
        return (n, r4(ttr), r4(stop_ratio), r4(avg_len), r4(quality))

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", features(F.col("text")).alias("f"))
        .select("doc_id", "f.*")
        .orderBy("doc_id")
    )
