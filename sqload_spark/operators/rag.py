"""RAG corpus build — the round-4 composition query.

``pipe_rag_corpus`` chains the retrieval-side ingest pipeline end to end
the way ``pipe_training_mix`` chains the curation side: exact-dedup
survivor selection → sliding-window chunking (the same 128/64 windows as
``q_chunk_documents``) → a deterministic md5 stub embedding per chunk
(honest stand-in for the encoder; the plumbing and the manifest are what
is under test) → a per-language corpus manifest.

Float discipline: chunk "norms" come from md5-derived uniforms (identical
in both engines), are rounded to 6dp per chunk, then averaged via exact
int64 fixed-point — so the mean is independent of aggregation order. The
corpus receipt is a SUM of each chunk fingerprint's first-8-hex value:
commutative, so no sorted string_agg single-reducer is needed — the
scale-clean way to checksum a corpus (compare pipe_output_manifest, whose
one-row receipt documents the sorted-concat trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import round_half_up, sql_round_half_up
from sqload_spark.functions.text_funcs import tokens
from sqload_spark.operators.sampling import CHUNK_STRIDE, CHUNK_TOKENS
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table

EMB_DIMS = 4
_R6 = 1_000_000.0

_NORM_SQL = (
    "sqrt("
    + " + ".join(
        f"power((('0x' || substr(md5(chunk_fp || '|{d}'), 1, 8))::BIGINT / 4294967296.0) - 0.5, 2)"
        for d in range(EMB_DIMS)
    )
    + ")"
)


@query(
    "pipe_rag_corpus",
    oracle=f"""
    WITH canon AS (
      SELECT doc_id, lang, text,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             min(doc_id) OVER (PARTITION BY
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             ) AS keep_id
      FROM documents
    ),
    survivors AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t
      FROM canon WHERE doc_id = keep_id
    ),
    chunks AS (
      SELECT doc_id, lang,
             least({CHUNK_TOKENS}, len(t) - s.start) AS chunk_len,
             md5(array_to_string(
               t[s.start + 1 : s.start + least({CHUNK_TOKENS}, len(t) - s.start)], ' ')) AS chunk_fp
      FROM survivors, LATERAL unnest(range(0, len(t), {CHUNK_STRIDE})) s(start)
    ),
    embedded AS (
      SELECT lang, doc_id, chunk_len, chunk_fp,
             CAST(floor(({_NORM_SQL}) * {_R6} + 0.5) AS BIGINT) AS norm_fx,
             ('0x' || substr(chunk_fp, 1, 8))::BIGINT AS fp_u32
      FROM chunks
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs_kept,
           count(*) AS n_chunks,
           CAST(sum(chunk_len) AS BIGINT) AS sum_chunk_tokens,
           {sql_round_half_up(f"(CAST(sum(norm_fx) AS DOUBLE) / {_R6}) / count(*)", 6)} AS mean_chunk_norm,
           CAST(sum(fp_u32) AS BIGINT) AS fp_receipt
    FROM embedded
    GROUP BY lang
    ORDER BY lang
    """,
)
def rag_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivors → chunk → stub-embed → per-language manifest; see
    the module docstring for the composition and float rules."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " "))
    keep = F.min("doc_id").over(W.partitionBy("fp"))
    survivors = (
        docs.select("doc_id", "lang", "text", fp.alias("fp"))
        .withColumn("keep_id", keep)
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", F.split(F.col("text"), " ").alias("t"))
    )
    chunk_len = F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("start"))
    chunks = survivors.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))).alias("start"),
        "t",
    ).select(
        "doc_id",
        "lang",
        chunk_len.cast("bigint").alias("chunk_len"),
        F.md5(F.array_join(F.slice(F.col("t"), F.col("start") + 1, chunk_len), " ")).alias(
            "chunk_fp"
        ),
    )
    dim_u = [
        F.conv(
            F.substring(F.md5(F.concat(F.col("chunk_fp"), F.lit(f"|{d}"))), 1, 8), 16, 10
        ).cast("bigint").cast("double")
        / F.lit(4294967296.0)
        - 0.5
        for d in range(EMB_DIMS)
    ]
    norm = F.sqrt(sum(u * u for u in dim_u))
    embedded = chunks.select(
        "lang",
        "doc_id",
        "chunk_len",
        F.floor(norm * _R6 + 0.5).cast("bigint").alias("norm_fx"),
        F.conv(F.substring(F.col("chunk_fp"), 1, 8), 16, 10).cast("bigint").alias("fp_u32"),
    )
    return (
        embedded.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs_kept"),
            F.count("*").alias("n_chunks"),
            F.sum("chunk_len").cast("bigint").alias("sum_chunk_tokens"),
            round_half_up(
                (F.sum("norm_fx").cast("double") / F.lit(_R6)) / F.count("*"), 6
            ).alias("mean_chunk_norm"),
            F.sum("fp_u32").cast("bigint").alias("fp_receipt"),
        )
        .orderBy("lang")
    )
