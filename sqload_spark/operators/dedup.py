"""Deduplication operators over `documents` / `embeddings` — the LLM-data-
pipeline core: exact, near-dup via n-gram Jaccard (exact), MinHash+LSH
(the scale path), SimHash banding, and embedding-cosine near-dup.

Scale design (100 TB): the exact Jaccard pair join is quadratic in docs per
shared shingle and exists as the verification oracle / small-corpus path.
The production path is MinHash+LSH: one map-side pass computes a 64-permutation
signature per document (array expressions, no shuffle), banding shuffles
ONLY (doc_id, band_hash) pairs — constant bytes per doc — and the candidate
join touches just same-bucket documents. Verification re-computes exact
Jaccard on candidates only. SimHash is the same shape with 4×16-bit bands.

All thresholds compare UNROUNDED values; reported scores use the cross-
engine-stable half-up rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import round_half_up, sql_round_half_up
from sqload_spark.functions.text_funcs import (
    hamming64,
    minhash_agg_exprs,
    shingle_hashes,
    shingles,
    simhash_bitsum_exprs,
    simhash_from_bitsums,
    tokens,
)
from sqload_spark.registry import query
from sqload_spark.session import persist_bounded
from sqload_spark.sources.tables import load_embeddings, load_table
from sqload_spark.functions.vectors import EMB_VALID_SQL, dot_fold_sql

# Contract-filtered embeddings scan for oracles (vectors.EMB_VALID_SQL).
_EMB = f"(SELECT * FROM embeddings WHERE {EMB_VALID_SQL})"

JACCARD_THRESHOLD = 0.5
NUM_PERM = 64
LSH_BANDS = 32  # r=2 rows/band → P(candidate | j=0.5) ≈ 0.9999
COSINE_DUP_THRESHOLD = 0.35


# ---------------------------------------------------------------------------
# Exact dedup.
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      FROM documents
    )
    SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM canon
    GROUP BY fp
    HAVING count(*) > 1
    ORDER BY fp
    """,
)
def exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a canonical form (sorted distinct token set): hash →
    groupBy → keep min doc_id. The canonical md5 is cross-engine stable.
    At scale this is one hash-shuffle on a 32-byte key."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " "))
    return (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


# ---------------------------------------------------------------------------
# Near-dup: exact n-gram Jaccard (the correctness baseline).
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b,
           {sql_round_half_up("i::DOUBLE / (ca.n + cb.n - i)", 4)} AS jaccard
    FROM inter
    JOIN cnt ca ON da = ca.doc_id
    JOIN cnt cb ON db = cb.doc_id
    WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
"""


def _shingle_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard_raw) via the all-pairs shingle-intersection
    join — exact but quadratic in colliding docs; the LSH query below is
    the scale path."""
    sh = docs.select(
        "doc_id", F.explode(shingle_hashes(F.col("text"), 3)).alias("sh")
    )
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # Semantics-preserving pruning: a shingle occurring in exactly one doc
    # cannot contribute an intersection pair; dropping df=1 rows before the
    # self-join removes the (dominant, near-unique) bulk of the shingle
    # table. Per-doc totals `cnt` still count ALL shingles.
    w_df = W.partitionBy("sh")
    shared = sh.withColumn("_df", F.count("*").over(w_df)).filter(F.col("_df") > 1).drop("_df")
    a, b = shared.alias("a"), shared.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard_raw"),
        )
    )


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.5).

    Quadratic-in-collisions by nature — this is the baseline/verifier; the
    scale path is dedup_minhash_lsh below."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _shingle_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", round_half_up(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Near-dup: MinHash + LSH banding (the 100 TB path). Same answer as the
# exact query on this corpus (verified in tests), found without the
# all-pairs shingle join.
# ---------------------------------------------------------------------------


def _lsh_verified_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard_raw) for every MinHash-LSH candidate pair,
    with the TRUE (exact) Jaccard computed on candidates only.

    This is the 100 TB near-dup pair miner: signatures are one map-side
    pass, banding shuffles only (doc_id, band_hash), and exact verification
    touches just same-bucket documents — never the all-pairs shingle join.
    Shared by dedup_minhash_lsh (thresholded pairs) and dedup_keep_list
    (connected-components edge source)."""
    sh_rows = docs.select("doc_id", F.explode(shingle_hashes(F.col("text"), 3)).alias("h"))
    sigs = sh_rows.groupBy("doc_id").agg(*minhash_agg_exprs("h", NUM_PERM))
    rows_per_band = NUM_PERM // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh{band * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("bh"),
                    )
                    for band in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify candidates ONLY: join each pair to the two per-doc shingle-hash
    # sets and intersect the arrays row-wise. O(|candidates|) work — never
    # the all-pairs shingle join (which is the quadratic blowup LSH exists
    # to avoid; doing it here once cost 450 s at sf0.1). Note: we tried
    # semi-joining docs to candidate ids before building the arrays, but
    # every extra consumer of `candidates` re-executes the signature
    # pipeline (no reuse without persist) — net 2× slower. Building the
    # arrays corpus-wide keeps `candidates` single-use.
    # persist() experiment (round 2, sf0.1 × 3 runs): bands.persist()
    # 6.0-8.9 s vs recompute 6.2-7.0 s — a wash locally (materialize cost ≈
    # recompute savings on 32 cores), so we keep the simpler recompute. On a
    # real cluster where the corpus scan is I/O-bound, persist the `bands`
    # DataFrame (or write signatures once) before the self-join.
    sets_a = docs.select(
        F.col("doc_id").alias("doc_a"), shingle_hashes(F.col("text"), 3).alias("sh_a")
    )
    sets_b = docs.select(
        F.col("doc_id").alias("doc_b"), shingle_hashes(F.col("text"), 3).alias("sh_b")
    )
    return (
        candidates.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b")))
            ).alias("jaccard_raw"),
        )
    )


@query("dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) signatures → 32 bands × 2 rows → bucket join → exact-
    Jaccard verification of candidates only.

    With r=2, b=32 the candidate probability at the 0.5 threshold is
    1-(1-0.5²)³² ≈ 0.9999, so the output provably-almost-surely equals the
    exact query — which is why it can share the same oracle. Deterministic:
    all hashing is seeded xxhash64."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _lsh_verified_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", round_half_up(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Dedup keep-list: connected components over the near-dup pair graph.
# ---------------------------------------------------------------------------


@query(
    "dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT da AS a, db AS b FROM pairs
      UNION SELECT db, da FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS keep_doc_id
    FROM reach GROUP BY a
    ORDER BY doc_id
    """,
)
def keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters → keep-list: connected components of the Jaccard
    pair graph, each doc labeled with its component minimum (the canonical
    survivor). Spark side is driver-coordinated iterative label propagation
    (min-label to neighbors until fixpoint) — the iterative-algorithm
    pattern; the oracle is a DuckDB recursive CTE computing min reachable
    id, so even this is hash-checked. At 100 TB each iteration is one
    shuffle on doc_id; near-dup components are tiny (pairs/triples), so
    convergence takes 2-3 rounds.

    Edge source is the MinHash-LSH candidate miner (the scale path), NOT
    the all-pairs shingle join — a production keep-list must not reintroduce
    the quadratic blowup LSH exists to avoid. Same answer, same oracle:
    with r=2,b=32 the candidate set provably-almost-surely contains every
    ≥0.5-Jaccard pair."""
    return component_labels(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


def component_labels(docs: DataFrame) -> DataFrame:
    """(doc_id, keep_doc_id) for every doc in a ≥0.5-Jaccard near-dup pair:
    connected components by min-label propagation over LSH-mined edges.
    Shared by dedup_keep_list and the leakage-safe split (sampling.py)."""
    pairs = (
        _lsh_verified_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return _labels_from_pairs(pairs)


def _labels_from_pairs(pairs: DataFrame) -> DataFrame:
    """Connected-components labels from an explicit (doc_a, doc_b) pair
    table — the mining-free half of ``component_labels``, so consumers of a
    MATERIALIZED pair artifact (dedup_pairs_materialized) can label without
    re-mining.

    Each iteration combines MIN-LABEL PROPAGATION (min over neighbors'
    labels) with POINTER JUMPING (lbl ← lbl(lbl): every label value is
    itself a node id, so one extra self-join on the label table halves the
    remaining distance to the component minimum). Plain propagation needs
    diameter iterations — correct for today's pair/triple-sized near-dup
    clusters but silently UNCONVERGED if a larger corpus ever grows a
    chain longer than the iteration cap; with jumping the cap of 10
    covers diameter ~2^10 (regression-tested on a 60-node path in
    tests/test_llm_pipeline.py). Per-iteration labels are
    localCheckpoint'ed, not just persisted: an iterative plan whose
    lineage is allowed to deepen re-analyzes the whole history each
    round, which measured minutes by iteration 10 on a 40-row graph —
    truncation keeps every round's plan flat. (A production run would use
    a reliable checkpoint dir; local truncation is the single-app
    equivalent.) The convergence count per iteration is the standard
    bounded driver coordination."""
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    # Materialize the edge cache (the mine runs here, at full session
    # parallelism) and size the ITERATION shuffles from the edge count
    # (r11, guide §2): the label tables are bounded by the near-dup pair
    # list — hundreds of rows at bench scale — while each of the ~3
    # iterations runs 2-3 jobs; at the session-wide partition count that
    # is 32 tasks × jobs × iterations of pure per-task overhead (profiled:
    # the CC consumers spend ~95% of their wall here, exec ~0.3 s).
    # 500 K edge rows per partition, floor 4, cap 4× parallelism — the
    # same formula keeps thousands of partitions at a 10⁹-edge corpus.
    n_edges = edges.count()
    spark = pairs.sparkSession
    cc_parts = max(4, min(spark.sparkContext.defaultParallelism * 4, 1 + n_edges // 500_000))
    from sqload_spark.session import shuffle_scope

    with shuffle_scope(spark, cc_parts):
        return _labels_iterate(edges)


def _labels_iterate(edges: DataFrame) -> DataFrame:
    # localCheckpoint(eager=False) throughout (r11, guide §1.2 "fewer
    # passes"): an EAGER checkpoint is its own job; the convergence count
    # right after it is a second job over the same rows. Lazy checkpointing
    # folds both into one — the count() materializes the checkpoint, and by
    # the time the next iteration's plan is built the lineage is already
    # truncated (the guarantee the checkpoint exists for). Measured (r11,
    # alternating 4-pass A/B at sf0.1, full CC run incl. the LSH mine,
    # labels identical): calm-window min 9.2 → 4.3 s.
    #
    # Iteration 0 FUSED into the label init (r12, guide §1.2): with labels
    # starting as each node's own id, the first neighbor-min is just
    # least(doc_a, min(doc_b)) — one aggregation over the edge cache, no
    # join, no separate convergence round. Profiled at sf0.1: each loop
    # round costs ~0.4-0.6 s of DRIVER-side plan construction (the
    # localCheckpoint compiles the plan eagerly) against a ~0.07 s count
    # job, so removing a whole round is worth far more than its job time.
    # Equivalence: labels after the fused init = least(own, min over
    # neighbors' initial labels) — exactly iteration 0's output (the jump
    # join was already skipped there: lbl(lbl) is the identity on own-id
    # labels). Iteration 0's convergence count never fired: symmetrized
    # a<b pair edges guarantee some label changes whenever edges exist,
    # and the edges-empty case yields an empty label table on both paths.
    # Measured (alternating 4-pass A/B at sf0.1, BOTH orders, labels
    # identical): component_labels 4.42 → 3.94 s / 4.60 → 4.09 s min.
    # The total iteration budget is unchanged: fused init + 9 jump rounds
    # = the old 10-round cap (diameter ~2^10 with pointer jumping; the
    # 60-node-path law test in tests/test_llm_pipeline.py pins coverage).
    labels = (
        edges.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.least(F.col("doc_a"), F.min("doc_b")).alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _it in range(9):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("lbl").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, "doc_id", "left")
        # lbl(lbl(v)): every label value is itself a node id, so one
        # self-join halves the remaining distance to the component minimum
        jump = labels.join(
            labels.select(F.col("doc_id").alias("j_id"), F.col("lbl").alias("jmin")),
            F.col("lbl") == F.col("j_id"),
        ).select("doc_id", "jmin")
        stepped = stepped.join(jump, "doc_id", "left")
        # carry the change flag THROUGH the checkpoint instead of re-joining
        # new labels against old ones afterwards (r11: the extra join was a
        # full shuffle per iteration; `stepped` already holds the old lbl,
        # so new-vs-old is a projection, and the convergence count becomes a
        # cheap scan of the already-materialized checkpoint rows)
        new_lbl = F.least(
            F.col("lbl"),
            F.coalesce(F.col("nmin"), F.col("lbl")),
            F.coalesce(F.col("jmin"), F.col("lbl")),
        )
        stepped = stepped.select(
            "doc_id",
            new_lbl.alias("lbl"),
            (new_lbl != F.col("lbl")).alias("chg"),
        ).localCheckpoint(eager=False)
        changed = stepped.filter(F.col("chg")).count()
        labels = stepped.select("doc_id", "lbl")
        if changed == 0:
            break
    out = labels.select("doc_id", F.col("lbl").alias("keep_doc_id"))
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# Write-once pair-mine artifact (VERDICT r4 "Next round" #5): ≥6 registered
# consumers (census, keep-lists, eval, manifest, …) each re-run the ~7-9 s
# LSH mine + verify at sf0.1. At 100 TB you mine ONCE, write the verified
# pair list to parquet, and every consumer reads the artifact — the pattern
# the _lsh_verified_pairs docstring recommends, demonstrated and
# hash-checked here instead of merely asserted.
# ---------------------------------------------------------------------------

_PAIRS_MATERIALIZED_ORACLE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT da AS a, db AS b FROM pairs
      UNION SELECT db, da FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, min(b)) AS keep_doc_id
      FROM reach GROUP BY a
    ),
    clusters AS (
      SELECT keep_doc_id, count(*) AS cluster_size FROM labels GROUP BY keep_doc_id
    ),
    census AS (
      SELECT cluster_size, count(*) AS n_clusters, sum(cluster_size) AS n_docs
      FROM clusters GROUP BY cluster_size
    )
    SELECT consumer, n_rows, checksum FROM (
      SELECT 'cluster_census' AS consumer,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cluster_size * n_docs) AS BIGINT) AS checksum
      FROM census
      UNION ALL
      SELECT 'keep_list',
             CAST(count(*) AS BIGINT),
             CAST(sum(keep_doc_id) AS BIGINT)
      FROM labels
      UNION ALL
      SELECT 'pair_graph',
             CAST(count(*) AS BIGINT),
             CAST(sum(da + db) AS BIGINT)
      FROM pairs
    )
    ORDER BY consumer
"""


@query("dedup_pairs_materialized", oracle=_PAIRS_MATERIALIZED_ORACLE)
def pairs_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine-once/consume-many: the verified ≥0.5-Jaccard pair list is
    written to parquet ONCE, and three downstream consumers (pair-graph
    stats, connected-components keep-list, cluster-size census) all read
    the artifact back instead of re-mining — each emitting a one-row
    integer summary so the whole fan-out is hash-checked against the
    recursive-CTE oracle. The per-consumer answers equal the standalone
    queries' (dedup_cluster_sizes, dedup_keep_list), proving artifact
    reuse changes cost, not results.

    Scale shape: the mine runs exactly once regardless of consumer count;
    the artifact is pair-bounded (near-dup pairs, not the corpus), so at
    100 TB this converts ≥6 corpus-scale mining passes into one pass plus
    cheap pair-table scans.

    The artifact lives at session.scratch_subdir (VERDICT r6 #4: one code
    path for all scratch artifacts), keyed by a hash of the FULL sf_dir
    (two sf_dirs sharing a basename must not share a path — ADVICE r5)
    under the process-wide scratch root, whose single exit hook cleans it
    rather than an eager rmtree: the r6 self-review found the eager
    collect+rmtree variant replaced the query's physical plan with a
    LocalTableScan of pre-collected rows, making the
    mine-once/consume-many shape invisible to PLANS.md and plan tests.
    Returning the LAZY consumer plan keeps it inspectable; re-invocations
    overwrite the same path in place (the mine is deterministic, so a
    previously returned DataFrame re-materialized after an overwrite reads
    identical content)."""
    import hashlib
    import os

    from sqload_spark.session import scratch_subdir

    docs = load_table(spark, sf_dir, "documents")
    sf_tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = scratch_subdir(f"dedup_pairs_{sf_tag}")
    (
        _lsh_verified_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .write.mode("overwrite")
        .parquet(path)
    )
    mined = spark.read.parquet(path)
    labels = _labels_from_pairs(mined)
    census = (
        labels.groupBy("keep_doc_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"), F.sum("cluster_size").alias("n_docs"))
    )
    c_census = census.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("cluster_size") * F.col("n_docs")).cast("bigint").alias("checksum"),
    ).select(F.lit("cluster_census").alias("consumer"), "n_rows", "checksum")
    c_keep = labels.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("keep_doc_id").cast("bigint").alias("checksum"),
    ).select(F.lit("keep_list").alias("consumer"), "n_rows", "checksum")
    c_pairs = mined.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("doc_a") + F.col("doc_b")).cast("bigint").alias("checksum"),
    ).select(F.lit("pair_graph").alias("consumer"), "n_rows", "checksum")
    return c_census.union(c_keep).union(c_pairs).orderBy("consumer")


# ---------------------------------------------------------------------------
# Near-dup: SimHash banding (rows-only; validated by property tests).
# ---------------------------------------------------------------------------


SIMHASH_MAX_HAMMING = 3  # 4 bands × 16 bits: hamming ≤ 3 ⇒ some band is clean


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sim): 64-bit SimHash over 3-gram shingle hashes — explode
    once, aggregate 64 bit-vote sums map-side, assemble the signature."""
    sh_rows = docs.select("doc_id", F.explode(shingle_hashes(F.col("text"), 3)).alias("h"))
    return (
        sh_rows.groupBy("doc_id")
        .agg(*simhash_bitsum_exprs("h"))
        .select("doc_id", simhash_from_bitsums().alias("sim"))
    )


@query("dedup_simhash")
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over 3-gram shingle hashes (same similarity notion as
    the Jaccard queries); candidate pairs share ≥1 of four 16-bit bands —
    by pigeonhole that finds EVERY pair with Hamming ≤ 3, which is the
    reported threshold. Deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    sims = simhash_signatures(docs)
    bands = sims.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(F.col("sim"), 16 * k).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sim", "b.band", "b.bh")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Near-dup on embeddings: exact pairwise cosine (baseline; ANN variants live
# in operators/similarity.py).
# ---------------------------------------------------------------------------


_EMB_COSINE_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_round_half_up(
               "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])", 4)} AS cos_sim
    FROM {_EMB} a, {_EMB} b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {COSINE_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
"""

# Hyperplane banding for cosine pair mining: 64 seeded planes, 2 bits/band ×
# 32 bands. For a pair at the 0.35 threshold (θ≈69.7°) a plane agrees with
# probability 1-θ/π ≈ 0.613, so P(miss) = (1-0.613²)³² ≈ 3e-7 per pair —
# the candidate set provably-almost-surely contains every qualifying pair,
# which is why the banded query can share the exact oracle.
EMB_N_PLANES = 64
EMB_BITS_PER_BAND = 2
EMB_BANDS = EMB_N_PLANES // EMB_BITS_PER_BAND


@query("dedup_embedding_cosine", oracle=_EMB_COSINE_ORACLE)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine near-dup mining — the small-corpus baseline /
    verifier. The scale path is dedup_embedding_cosine_banded below."""
    from sqload_spark.functions.vectors import dot, norm, to_double_array

    # Norms computed ONCE per vector map-side (n sqrt-folds, not 2n²) and
    # the per-pair dot written as a 64-term scalar-column expression so
    # the n²/2 hot path stays in WholeStageCodegen (an aggregate/zip_with
    # fold is interpreted per row — measured 3-4× slower on this pair
    # count). Same left-to-right association as the fold ⇒ bit-identical
    # values, oracle hash unchanged.
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    dim = 64
    # SQL-string construction (r11, see vectors.dot_expanded_sql):
    # identical trees, one server-side parse instead of ~600 py4j calls.
    _norm_sql = (
        "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )
    a = emb.selectExpr(
        "vec_id AS vec_a",
        f"{_norm_sql} AS n_a",
        *[f"element_at(v, {i + 1}) AS a{i}" for i in range(dim)],
    )
    b = emb.selectExpr(
        "vec_id AS vec_b",
        f"{_norm_sql} AS n_b",
        *[f"element_at(v, {i + 1}) AS b{i}" for i in range(dim)],
    )
    dot_expr = F.expr(" + ".join(f"a{i} * b{i}" for i in range(dim)))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", dot_expr / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cos_raw") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", round_half_up(F.col("cos_raw"), 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


# --- pruning end of the banding dial (realistic dedup threshold) -----------
# The corpus's real max pairwise cosine is 0.60, so a 0.8-threshold query on
# the raw table is vacuously empty. To exercise the operator at a production
# dedup threshold we plant deterministic near-duplicates IN-QUERY: every
# 20th vector gets a copy with its last 4 components zeroed (pure slicing —
# bit-identical in Spark and DuckDB; cos(v, v') = |v[:60]|/|v| lands in
# [0.895, 0.9995], measured at sf0.01/sf0.1, vs 0.60 for the nearest real
# pair — a wide margin on both sides of the 0.8 threshold).
#
# Banding: 160 planes, 8 bits/band × 20 bands. Worst qualifying pair
# (c=0.895, θ=26.4°, p=0.853): P(miss) = (1-p^8)^20 ≈ 1.4e-3; measured
# recall at both SFs = 1.0. Background (c≈0, p≈0.5): P(candidate) ≈
# 20·2⁻⁸ ≈ 7.8% theoretical; measured (the real corpus is mildly
# correlated) 8.6-8.7% → 11.5× shrink at sf0.01 (11,980 candidates vs
# n²/2 = 137,550) and 11.6× at sf0.1 (189,787 vs 2,203,950). A 24-band
# tuning was measured first: recall 1.0 too, but shrink 9.8× — under the
# 10× bar.
PRUNED_COSINE_THRESHOLD = 0.8
PRUNED_N_PLANES = 160
PRUNED_BITS_PER_BAND = 8  # pinned tier of the registered query; _pruned_tier_for scales it


def bands_for(bits: int, threshold: float = 0.90, target_miss: float = 1e-2) -> int:
    """OR-amplification band count: the fewest bands of width ``bits`` such
    that a pair at cosine ``threshold`` is missed by EVERY band with
    probability <= ``target_miss``.

    Hyperplane-LSH math (the published formula, law-tested in
    tests/test_llm_pipeline.py): a random hyperplane splits a pair at angle
    θ with probability θ/π, so one sign-bit agrees with p = 1 - θ/π, a
    whole b-bit band matches with p^b, and `bands` bands ALL miss with
    (1 - p^b)^bands. Solving (1 - p^b)^bands <= target_miss gives
    bands = ceil(ln(target_miss) / ln(1 - p^b)). For the round-6 prose
    configuration (16-bit bands, cos 0.90, 1e-2 miss) this yields 53 bands
    (848 planes) — the band-COUNT dial that keeps recall when width alone
    can't (VERDICT r6 #2), now code instead of docstring arithmetic."""
    import math

    p = 1.0 - math.acos(threshold) / math.pi
    p_band = p**bits
    return math.ceil(math.log(target_miss) / math.log1p(-p_band))


def _pruned_tier_for(n_vectors: int, backend: str = "gemm") -> tuple[int, int]:
    """(band width bits, band count) scaled to corpus size AND signature
    backend — the measured scaling rules from BASELINE.md's banded-cosine
    curves, in code instead of a comment. Used by the SCALE path
    (embedding_cosine_banded_pruned_scaled / tools/scale_run.py); the
    registered oracle-checked query pins the 8-bit tier (see its docstring).

    TWO ladders, because the tier trade is a ratio of plane-work to
    collision-floor cost and the GEMM backend changed the numerator ~69×:

    - ``gemm`` (the scale twin's default backend): (8, 20) up to 20 K
      vectors (the recall-1.0 zone, absolute walls in seconds), then
      (24, 188) EVERYWHERE — with BLAS plane dots the sig pass is single-
      digit seconds at every measured scale, so the 16×-per-+4-bits
      collision-floor cut wins every octave. Measured head-to-head this
      round (single sessions, equal recall at every cell): 21 K vectors
      2.8 s vs 6.1 s for (12,13) [recall 0.999 vs 0.991]; 67 K 7.7 s vs
      13.1 s for (16,53); 134 K 8.8 s vs 10.9 s for (20,100) and 41.3 s
      for (16,53); 269 K 21.4 s vs 50.1 s; 538 K 95.9 s vs 175.3 s;
      1.075 M 250.6 s vs 859.0 s; 2.15 M 812.8 s (sig pass 21.2 s =
      2.6%; rows bit-identical to the expr run) where (20,100)'s
      candidate floor exceeds single-node scratch (below).
    - ``expr`` (the registered queries' path and the pre-round-11
      measurement series): the historical width ladder below, where each
      +4 bits costs ~2.4× INTERPRETED map-side plane work, so width
      shifts up one notch per ~3× corpus growth.

    The expr-era narrative (kept because it documents the physics and
    every measured point the ladder came from):

    Random 8-bit band values collide at ~2⁻⁸, so BACKGROUND candidates grow
    as bands·n²/2⁹ regardless of how well the bands separate true pairs:
    measured 14 s at 21 K vectors but 238 s at 63 K (≈150 M background
    candidates). Widening bands cuts the collision floor 2⁴× per +4 bits at
    a recall cost concentrated on threshold-ADJACENT pairs (P(band) =
    (1-θ/π)^bits), which is the standard LSH trade: near-verbatim dups
    (cos ≈ 0.998, the dedup target) keep recall ≈ 1 at every width here —
    miss probability (1-0.98^16)^10 ≈ 3e-6 even at 16 bits — while a
    cos-0.90 pair's recall decays, exactly as production MinHash/SimHash
    configs accept.

    Every tier is MEASURED (BASELINE.md round-6/7/9 scale tables). At 63 K
    vectors: 8-bit = recall 1.0 at 238 s; 12-bit = recall 0.9907 at 11.1 s
    (the lost pairs are the cos-0.90-0.93 tail of the planted set,
    deterministic). At 105 K vectors: 12-bit/13-band = recall 0.990 at
    80 s; 16-bit at the SAME 160-plane budget (10 bands) measured recall
    0.929 — width past 12 at a fixed plane budget drops the planted tail
    wholesale, so past ~10⁵ vectors the recall-preserving dial is band
    COUNT: 16-bit × bands_for(16, 0.90, 1e-2) = 53 bands (848 planes, ~5×
    the map-side signature work, collision floor 4× under 12-bit) holds
    the cos-0.90 miss target by construction — measured at 105 K vectors
    in round 7 (BASELINE.md). Round 9 measured the next octave (315 K
    vectors): 16×53's 2⁻¹⁶ collision floor is ~40 M background candidates
    there (full wall 406 s, signature pass 2.7 s = 0.7% — the floor is the
    whole cost), while 20-bit × bands_for(20)=100 (2 000 planes, floor 16×
    lower) measured 182 s at the same 0.9999 recall, so the >2×10⁵ tier is
    (20, 100). The pattern: each +4 bits of width costs ~2.4× map-side
    plane work (linear, measured single-digit seconds) and buys a 16×
    collision-floor cut (quadratic term) — the width that balances them
    shifts up one notch per ~3× corpus growth, while the band count from
    bands_for holds the cos-0.90 miss target at every width — but the
    notch rule FAILED its 630 K extrapolation test (band-join input binds
    before the floor there), so no branch ships unmeasured. Round 10
    measured the first ≥10⁶ point (1.075 M vectors, the k=512 group-screen
    wall): (20, 100) still wins — 1 501 s vs 1 557 s for 24×188 at equal
    0.9997 recall — its third measured octave, with the 24-bit gap
    narrowing 15% → 3.7% across the last octave. Round 11 MEASURED the
    staged ~2×10⁶ crossover (k=1024 corpus via the 0.79 group screen +
    the exact candidate-pair screen reduction, 2,150,400 vectors,
    tools/scale_run.py --tier-compare 1024) and the crossover is not a
    wall ratio but a feasibility cliff: (20, 100)'s collision floor there
    is ~2.2×10⁸ candidates, and the exact re-rank's first join
    materializes candidates × the 64-double vectors ≈ 110+ GB of shuffle
    — past this host's scratch disk both times it ran (SPILL_OUT_OF_MEMORY
    / "No space left on device" at ~43 GB and ~76 GB free), while
    (24, 188) COMPLETED in the same session: full 3 323.7 s, rows
    102 382 of 102 400 planted (recall 0.9998, equal to its 1.075 M
    recall), peak scratch ~71 GB (band-join shuffle, released at stage
    end). On a multi-executor cluster both tiers would complete, but the
    16× candidate cut per +4 bits vs ~2.4× more plane work is
    scale-free, so the single-node cliff IS the crossover signal — hence
    the measured branch below at 1.5×10⁶ (the geometric midpoint of the
    1.075 M point where 20-bit still won by 3.7% and the 2.15 M point
    where it cannot finish). Past that, the operative dials are the
    band-partition knob (_pruned_candidates) and the signature map side:
    at (24, 188) × 2.15 M the interpreted aggregate/zip_with plane dots
    (9.7×10⁹ of them) are ~78% of the full wall — fixed by the shipped
    mapInPandas GEMM signature backend (_pruned_signatures_gemm, the
    scale twin's default): measured 18.0 s vs 1 241.7 s for the expr leg
    at 525 vectors × (24, 188) with all 98 700 (vec_id, band, bv) rows
    identical, and parity law-tested at both the pinned 8-bit tier and
    the widest shipped tier. The GEMM re-measurement of the whole ladder
    (the head-to-head table in the gemm bullet above) then collapsed the
    width ladder for the shipped backend: with the plane work ~free, the
    only remaining reason to stay narrow is the ≤20 K recall-1.0 zone."""
    if n_vectors <= 20_000:
        return PRUNED_BITS_PER_BAND, PRUNED_N_PLANES // PRUNED_BITS_PER_BAND
    if backend == "gemm":
        return 24, bands_for(24, threshold=0.90, target_miss=1e-2)
    if n_vectors <= 100_000:
        return 12, PRUNED_N_PLANES // 12
    if n_vectors <= 200_000:
        return 16, bands_for(16, threshold=0.90, target_miss=1e-2)
    if n_vectors <= 1_500_000:
        return 20, bands_for(20, threshold=0.90, target_miss=1e-2)
    return 24, bands_for(24, threshold=0.90, target_miss=1e-2)

_PRUNED_CORPUS_SQL = f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {_EMB} AS embeddings),
    planted AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_concat(v[1:60], [0.0, 0.0, 0.0, 0.0]) AS v
      FROM base WHERE vec_id % 20 = 0),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
"""

_PRUNED_COSINE_ORACLE = f"""
    {_PRUNED_CORPUS_SQL}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_round_half_up("list_cosine_similarity(a.v, b.v)", 4)} AS cos_sim
    FROM corpus a, corpus b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(a.v, b.v) >= {PRUNED_COSINE_THRESHOLD}
    ORDER BY vec_a, vec_b
"""


def _pruned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic planted near-dups (see comment above)."""
    from sqload_spark.functions.vectors import to_double_array

    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    planted = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(F.slice(F.col("v"), 1, 60), F.array(*[F.lit(0.0)] * 4)).alias("v"),
    )
    return emb.unionByName(planted)


def _pruned_signatures(
    corpus: DataFrame, bits: int, bands: int, backend: str = "expr"
) -> DataFrame:
    """Map-side hyperplane signature pass of the pruned banded-cosine miner:
    one row per (vec_id, band) with the packed ``bits``-bit band value.
    Split out of _pruned_candidates so tools/scale_run.py can time the
    signature pass separately from the band join (VERDICT r8 #2 asks for
    the 848-plane signature-pass cost share at ≥3×10⁵ vectors). Plane rows
    are drawn from one seeded stream in band order, so the 8-bit/20-band
    planes are bit-identical to every prior round's.

    Two backends compute the same (vec_id, band, bv) rows:

    - ``expr`` — broadcast-join the corpus against an n_planes-row plane
      table, one interpreted aggregate/zip_with dot per (vector, plane)
      row, groupBy-pack the bits. This is the original path and the one
      the REGISTERED oracle-checked queries pin (their physical plans stay
      bit-identical to every prior round's plan audit).
    - ``gemm`` — one mapInPandas over the corpus: per Arrow batch, a single
      (batch × 64) @ (64 × n_planes) numpy GEMM produces every plane dot,
      signs are packed per band with a second tiny (bands × bits) @ weights
      product, and the (vec_id, band, bv) rows are emitted directly —
      no row explosion (expr materializes n·n_planes join rows), no
      groupBy exchange (expr shuffles n·bands packed rows), and the dots
      run in BLAS instead of the interpreted higher-order evaluator. At
      (24, 188) × 2.15 M vectors the expr dots are 9.7×10⁹ interpreted
      folds ≈ 78% of the full wall (round-11 measurement) — this is the
      staged fix for exactly that map side, shipped on the SCALE twin only
      (embedding_cosine_banded_pruned_scaled).

    Parity: both backends sum the same 64 double products per dot, but the
    fold is left-to-right while BLAS uses blocked/SIMD accumulation, so a
    dot within ~1 ulp of 0.0 could in principle sign-flip between them.
    test_llm_pipeline asserts the full (vec_id, band, bv) row sets are
    IDENTICAL on the test corpora at both the pinned 8-bit tier and the
    widest shipped tier (24×188); random-plane dots concentrate at O(1),
    so a flip needs |dot| ≲ 1e-15 — measure-zero in practice, and a flip
    would only move one band of one vector (LSH recall is indifferent to
    which side of a hyperplane a point ON the hyperplane lands)."""
    if backend == "gemm":
        return _pruned_signatures_gemm(corpus, bits, bands)
    from sqload_spark.functions.vectors import dot

    rng = __import__("numpy").random.RandomState(41)
    spark = corpus.sparkSession
    n_planes = bits * bands
    planes = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(rng.randn(n_planes, 64))],
        "plane int, p array<double>",
    )
    return (
        corpus.join(F.broadcast(planes))
        .select(
            "vec_id",
            (F.col("plane") / bits).cast("int").alias("band"),
            (
                F.when(dot(F.col("v"), F.col("p")) > 0, 1).otherwise(0)
                * F.expr(f"shiftleft(1, plane % {bits})")
            ).alias("bit"),
        )
        .groupBy("vec_id", "band")
        .agg(F.sum("bit").alias("bv"))
    )


def _pruned_signatures_gemm(
    corpus: DataFrame, bits: int, bands: int, planes_t=None
) -> DataFrame:
    """GEMM backend of _pruned_signatures (see its docstring for the
    parity contract). By default the plane matrix is the SAME seeded
    stream in the same band order (RandomState(41), n_planes × 64); a
    caller with its own pinned plane stream passes it TRANSPOSED
    ((64 × n_planes) — embedding_cosine_banded's RandomState(23) planes
    come in this way, so the registered query and the pruned twin share
    one GEMM body, one output-chunking policy and one parity test shape
    instead of two divergent copies, ADVICE r11). The matrix is broadcast
    once per invocation (~2.3 MB at 24×188) and deliberately never
    destroyed: the returned plan is lazy and persisted copies can be
    re-materialized after cache eviction, so the broadcast must outlive
    this function — the per-invocation residue is KB-scale and bounded by
    invocation count (ADVICE r11, documented trade). Output batches are
    chunked so a 10 k-row Arrow input at 188 bands never emits one
    1.9 M-row pandas frame."""
    import numpy as np

    n_planes = bits * bands
    if planes_t is None:
        planes_t = np.ascontiguousarray(
            np.random.RandomState(41).randn(n_planes, 64).T
        )
    weights = np.int64(1) << np.arange(bits, dtype=np.int64)
    bc = corpus.sparkSession.sparkContext.broadcast(planes_t)
    vid_type = corpus.schema["vec_id"].dataType.simpleString()
    out_chunk = max(1, 262_144 // bands)  # input rows per emitted frame

    def gen(batches):
        import numpy as np
        import pandas as pd

        P = bc.value
        band_col = np.arange(bands, dtype=np.int32)
        for pdf in batches:
            for lo in range(0, len(pdf), out_chunk):
                chunk = pdf.iloc[lo : lo + out_chunk]
                m = len(chunk)
                V = np.stack(chunk["v"].to_numpy())  # (m, 64) float64
                signs = (V @ P) > 0  # plane j = band j//bits, pos j%bits
                bv = signs.reshape(m, bands, bits) @ weights  # (m, bands)
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(chunk["vec_id"].to_numpy(), bands),
                        "band": np.tile(band_col, m),
                        "bv": bv.ravel(),
                    }
                )

    return corpus.mapInPandas(gen, f"vec_id {vid_type}, band int, bv bigint")


def _band_partitions_for(n_vectors: int, backend: str = "gemm") -> int | None:
    """Measured default for the band-join shuffle dial (_pruned_candidates):
    256 partitions once the corpus is past 10⁶ vectors under the gemm
    backend, else None (session conf + AQE). Ships ONLY what the sweep
    harness measured (tools/scale_run.py --band-sweep, min-of-2 cells,
    rows bit-identical at every cell): 630 K noise-bounded ~0, 1.075 M
    **−17%** (176.6 → 146.4 s), 2.15 M **−3.6%** (1 201.8 → 1 159.0 s) —
    monotone never-worse across the measured ladder, with the win peaking
    where the band-join shuffle binds before single-node spill flattens
    the geometry (BASELINE.md round-11 sweep records). The expr backend
    gets no default: its ≥10⁶ walls are plane-dot-bound (the dial's
    target shuffle is not the bottleneck there) and no expr sweep was run
    in that regime — unmeasured branches don't ship. On a real cluster
    the right value is the executor count; SQLOAD_BAND_SHUFFLE_PARTITIONS
    overrides this default either way ("0" forces the dial off)."""
    if backend == "gemm" and n_vectors > 1_000_000:
        return 256
    return None


def _pruned_candidates(
    corpus: DataFrame,
    tier: tuple[int, int] | None = None,
    band_partitions: int | None = None,
    sig_backend: str = "expr",
) -> DataFrame:
    """Hyperplane-banded candidate mining at the high-threshold tuning:
    wide band values (8-16 bits, vs 2-bit in the low-threshold query)
    collide for random pairs with prob 2⁻ᵇⁱᵗˢ per band — this is where the
    pruning power comes from. ``tier`` is (bits, bands): pass it explicitly
    to pin a configuration (the registered oracle-checked query pins the
    8-bit tier), or None to scale it with the corpus (_pruned_tier_for;
    the one count() action is a cheap scan next to the bands·n²/2^bits it
    controls). Plane rows are drawn from one seeded stream in band order,
    so the 8-bit/20-band planes are bit-identical to every prior round's.
    Same plan shape as dedup_embedding_cosine_banded: map-side signatures
    against broadcast planes, band-equality self-join, distinct.

    ``band_partitions`` is the cluster-scale dial the 630 K-vector analysis
    identified (BASELINE.md round-9 scale section): past ~10⁶ vectors the
    binding cost is the band-join SHUFFLE (the bands·n²/2^bits candidate
    stream all routes through spark.sql.shuffle.partitions-many sort/join
    partitions), not the plane budget — so the remedy is partitioning the
    band keyspace finer, not widening the code. When set, the signature
    rows are hash-repartitioned on the exact join key (band, bv) into that
    many partitions, and that REPARTITION_BY_NUM exchange IS the join
    exchange — no second shuffle stacks on top (asserted by the plan
    test). Measured Spark 4 caveat: the dial only WIDENS — EnsureRequire-
    ments' co-partition selection floors a user number below the session
    shuffle-partition conf back up to the conf (7→32 observed; 64 sticks).
    That matches the remedy's direction (finer, never coarser), but a
    sweep must raise the conf too if it wants points below the default.
    None (the default, and the registered query's only mode) leaves the
    exchange to the session shuffle-partition conf + AQE coalescing.

    ``sig_backend`` picks the signature map side (_pruned_signatures):
    "expr" (default — the registered queries' pinned path, plan-audit
    stable) or "gemm" (the scale twin's path; identical rows by parity
    test, ~no row explosion and no groupBy exchange before the band
    join)."""
    bits, bands = (
        tier
        if tier is not None
        else _pruned_tier_for(corpus.count(), backend=sig_backend)
    )
    band_rows = _pruned_signatures(corpus, bits, bands, backend=sig_backend)
    if band_partitions:
        band_rows = band_rows.repartition(band_partitions, "band", "bv")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


@query("dedup_embedding_cosine_banded_pruned", oracle=_PRUNED_COSINE_ORACLE)
def embedding_cosine_banded_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRUNING end of the banded-cosine dial: production dedup threshold
    (0.8) over the corpus + planted near-dups. Same scale-safe shape as
    dedup_embedding_cosine_banded (map-side signatures, band shuffle,
    candidate-only exact re-rank) but the high threshold lets the bands do
    real work: measured candidates / (n²/2) = see test_llm_pipeline (≥10×
    shrink asserted at sf0.01).

    The tier is PINNED at 8-bit × 20 bands — the configuration whose recall
    vs the exact all-pairs oracle is measured 1.0 at every corpus size
    tried (up to 63 K vectors, BASELINE.md r6), so this registration
    hash-matches _PRUNED_COSINE_ORACLE on ANY corpus, large invariance runs
    included (ADVICE r6: the earlier adaptive width silently traded recall
    0.9907 above 20 K vectors against an exact oracle). The price is the
    8-bit collision floor (bands·n²/2⁹ background candidates — 238 s at
    63 K vectors); the corpus-scaled tier that pays recall for that floor
    lives in embedding_cosine_banded_pruned_scaled below, measured
    separately and never checked against the exact oracle."""
    corpus = _pruned_corpus(spark, sf_dir)
    candidates = _pruned_candidates(
        corpus, tier=(PRUNED_BITS_PER_BAND, PRUNED_N_PLANES // PRUNED_BITS_PER_BAND)
    )
    return _pruned_rerank(corpus, candidates)


def _pruned_rerank(corpus: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of candidate pairs — ONE body shared by the
    registered query and the scale-path twin, so a semantics change (norm,
    rounding, threshold) can never desynchronize the never-oracle-checked
    scale measurements from the registered contract (round-7 review).
    The per-candidate dot is the FOLD form (r12): over ARRAY columns the
    expanded element_at sum busts the codegen method limit and evaluates
    slowly every run — measured here 12.8 → 5.9 s min on the registered
    pruned query (alternating 3 passes, rows identical); the form-choice
    note lives in functions/vectors.py. The scalar-column expanded form
    (embedding_cosine_dups, the banded re-rank) is a different, still-
    optimal regime."""
    _norm_sql = (
        "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )
    va = corpus.selectExpr("vec_id AS vec_a", "v AS v_a", f"{_norm_sql} AS n_a")
    vb = corpus.selectExpr("vec_id AS vec_b", "v AS v_b", f"{_norm_sql} AS n_b")
    # No broadcast hints on the re-rank joins: the vector table is
    # corpus-sized, so forcing it broadcast would OOM at scale. Stats/AQE
    # pick broadcast at test SF (the table is tiny there) and a shuffle
    # join on vec_id once it isn't — the scale-adaptive choice.
    return (
        candidates.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cos_raw",
            F.expr(f"({dot_fold_sql('v_a', 'v_b')}) / (n_a * n_b)"),
        )
        .filter(F.col("cos_raw") >= PRUNED_COSINE_THRESHOLD)
        .select("vec_a", "vec_b", round_half_up(F.col("cos_raw"), 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


def embedding_cosine_banded_pruned_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE-path twin of dedup_embedding_cosine_banded_pruned: identical
    plan shape and threshold, but the (band width, band count) tier adapts
    to the corpus AND the signature backend via _pruned_tier_for — under
    the default gemm backend that is 8-bit/20 up to 20 K vectors (recall
    1.0) and 24-bit × bands_for(24)=188 beyond (BLAS plane dots make the
    sig pass single-digit seconds at every measured scale, so the widest
    collision-floor cut wins every octave — measured head-to-head from
    21 K to 1.075 M vectors, see _pruned_tier_for); under the expr
    backend the historical interpreted-cost width ladder applies
    (12-bit/13 to 100 K, 16×53 to 200 K, 20×100 to 1.5 M, 24×188 past).
    At every width the band count holds the cos-0.90 miss probability
    <= 1e-2 by the LSH formula (bands_for). Deliberately NOT registered: its recall above 20 K
    vectors is a measured 0.99-trade, so checking it against the exact
    all-pairs oracle would institutionalize a known mismatch (ADVICE r6) —
    tools/scale_run.py measures it instead, with planted-pair counts as
    ground truth (rows = k×100 exactly when recall is 1.0).

    The band-join shuffle dial (see _pruned_candidates) defaults to the
    MEASURED adaptive value here — _band_partitions_for: 256 past 10⁶
    vectors under the gemm backend (−17% at 1.075 M, −3.6% at 2.15 M,
    rows invariant in every sweep cell), off below — and is exposed via
    SQLOAD_BAND_SHUFFLE_PARTITIONS for callers that only see the (spark,
    sf_dir) signature — e.g. dirty_scale_run's lookup table ("0" forces
    the dial off; unset defers to the measured default). The sweep
    harness (tools/scale_run.py --band-sweep) calls _pruned_candidates
    directly with an explicit dial, so its cells are never contaminated
    by this default. The corpus count feeding both the tier and the dial
    is taken ONCE here; row counts are partitioning-invariant
    (law-tested), so the dial cannot move the tier probe."""
    import os

    corpus = _pruned_corpus(spark, sf_dir)
    backend = _scaled_sig_backend()
    n = corpus.count()
    env = os.environ.get("SQLOAD_BAND_SHUFFLE_PARTITIONS")
    return _pruned_rerank(
        corpus,
        _pruned_candidates(
            corpus,
            tier=_pruned_tier_for(n, backend=backend),
            band_partitions=int(env) if env else _band_partitions_for(n, backend),
            sig_backend=backend,
        ),
    )


def _scaled_sig_backend() -> str:
    """Signature backend for the SCALE twin (and the tools/ harnesses that
    measure it): "gemm" by default — the round-11 fix for the interpreted
    plane-dot map side (≈78% of the 24-bit wall at 2.15 M vectors) —
    overridable to "expr" via SQLOAD_SIG_BACKEND for A/B runs. The
    REGISTERED pruned query does not read this: it pins "expr" so its
    physical plan stays bit-identical to the committed plan audit."""
    import os

    backend = os.environ.get("SQLOAD_SIG_BACKEND", "gemm")
    if backend not in ("expr", "gemm"):
        raise ValueError(f"SQLOAD_SIG_BACKEND must be expr|gemm, got {backend!r}")
    return backend


@query("dedup_embedding_cosine_banded", oracle=_EMB_COSINE_ORACLE)
def embedding_cosine_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-banded embedding near-dup pairs: signature map-side, band
    self-join mines candidates, exact cosine re-ranks candidates only — the
    same shape as MinHash-LSH, applied to cosine space. Shares the exact
    all-pairs oracle (recall math at EMB_N_PLANES above).

    Honest scale note: pruning power is set by the angular contrast between
    qualifying pairs and the background. At this corpus's low threshold
    (0.35, barely off the random-pair 90°) 2-bit bands keep recall ≈ 1 but
    prune modestly; with a high-similarity dedup threshold (0.8+) the same
    operator runs more bits per band and prunes aggressively. The knob is
    EMB_BITS_PER_BAND — the plan shape (band shuffle + candidate-only
    verification) is what survives 100 TB, not any fixed constant."""
    from sqload_spark.functions.vectors import to_double_array

    import numpy as np

    # Same seeded plane stream every round has used (RandomState(23), plane
    # order) — the values define the candidate set, so they are pinned.
    plane_mat = np.random.RandomState(23).randn(EMB_N_PLANES, 64)
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    # Codegen discipline (measured at sf0.1, n=2000, ~2M candidates):
    # every dot product on the HOT (per-candidate) path is a 64-term
    # scalar-column expression, never an aggregate/zip_with fold —
    # higher-order array functions are INTERPRETED per row; the expanded
    # sum compiles into WholeStageCodegen with the same left-to-right
    # association, so values stay bit-identical to the fold (and to the
    # oracle). Re-rank fold 12.5 s → ~3 s over 2M pairs. (The signature
    # pass moved to BLAS in r11 — see the comment at its definition below.)
    # Plan-shape notes, also measured: (a) the candidate DISTINCT runs on
    # the narrow 16M-row match stream BEFORE the wide vector join —
    # filtering cosine first instead ships 130 broadcast-joined columns
    # through the match stream and loses 3× (36-43 s); (b) a pair matches
    # ~8 of 32 bands at this low-contrast threshold, so the distinct's 16M
    # → 2M shuffle is the irreducible cost of the banding shape here
    # (isolated r11: ~1.0-1.4 s warm over the cached signatures; a
    # packed-single-long distinct was measured no faster and is unsafe past
    # 2³² ids) — at a production dedup threshold the multiplicity and the
    # candidate count both collapse (see the _pruned twin below).
    # All large expression trees below are built as SQL STRINGS parsed
    # server-side in one shot (r11, see vectors.dot_expanded_sql): the
    # former per-term Column loops issued ~900 py4j round trips per
    # invocation (64-col unpack + two 64-term dots + re-pack), profiled at
    # a dominant share of this query's warm construction wall. The parsed
    # trees are term-for-term identical (same left-to-right association,
    # same unpacked-scalar plan shape), so values and the plan audit are
    # unchanged.
    dim = 64
    _norm_sql = (
        "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )
    emb_x = emb.selectExpr(
        "vec_id",
        f"{_norm_sql} AS n",
        *[f"element_at(v, {i + 1}) AS x{i}" for i in range(dim)],
    )

    # Signature pass in BLAS (r11, guide §4.2): the expr form — broadcast
    # plane join + 64-term plane dot per (vector, plane) row + groupBy —
    # measured 3.53 s warm at sf0.1 vs 0.31 s for one numpy
    # (batch × 64) @ (64 × 32) matmul per Arrow batch with the band values
    # assembled by a second tiny matmul (the same backend the _pruned scale
    # twin shipped in round 11; band rows verified BIT-IDENTICAL against
    # the expr pass on this corpus, 64 000 rows). Map-side only: planes are
    # a broadcast ndarray, no shuffle enters, and batches are bounded by
    # arrow.maxRecordsPerBatch — the shape scales exactly like the expr
    # pass it replaces. Sign-flip robustness is inherent in banding (a
    # borderline plane dot perturbs one band; a true pair collides in ~8
    # of 32 bands at this threshold), and the recall math is unchanged.
    # load_embeddings' validity contract guarantees every v is a finite
    # 64-wide double array, so np.stack is total.
    n_bands = EMB_N_PLANES // EMB_BITS_PER_BAND

    # Re-spread the signature cache before persisting (r11 follow-up,
    # guide §2.5): mapInPandas output inherits the SCAN's partitioning —
    # one partition for the single-file bench corpus — and a 1-partition
    # cache makes the band self-join's probe side (the 16 M-row match
    # stream + the distinct's partial aggregation) run in ONE task
    # (measured: warm exec 2.3 → 6.1 s after the BLAS change alone; this
    # repartition restores it). Keyless round-robin, NOT hash on
    # (band, bv): only 32 bands × 4 two-bit values = 128 distinct keys
    # exist, far under the 20-100×-keys-per-partition rule, so a hash
    # spread would leave partitions empty and concentrate hot buckets.
    # defaultParallelism is the session's scale dial, not a constant.
    # The GEMM body is the shared _pruned_signatures_gemm (r12, ADVICE
    # r11): same signs/packing arithmetic as the inline copy it replaces
    # (verified band rows bit-identical, 64 000 rows), plus the output
    # chunking the copy had dropped — this path now sits under the same
    # parity-test shape as the pruned twin.
    band_rows = _pruned_signatures_gemm(
        emb,
        EMB_BITS_PER_BAND,
        n_bands,
        planes_t=np.ascontiguousarray(plane_mat.T),
    ).repartition(spark.sparkContext.defaultParallelism)
    # Persist the signature table before the self-join: unlike the MinHash
    # bands (where persist-vs-recompute measured a wash), the 64-term plane
    # dots make this pass expensive enough that computing it for BOTH join
    # sides dominates — measured at sf0.1: recompute 12.4-15.2 s vs persist
    # 5.8-10.3 s for the full query. The materialization is (n x 32) rows
    # of three scalars — trivially cacheable at any corpus size.
    band_rows = persist_bounded("dedup_embedding_cosine_banded.band_rows", band_rows)
    band_rows.count()  # bounded driver action: materializes the cache
    a, b = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va_x = emb_x.selectExpr(
        "vec_id AS vec_a",
        "n AS n_a",
        *[f"x{i} AS a{i}" for i in range(dim)],
    )
    vb_x = emb_x.selectExpr(
        "vec_id AS vec_b",
        "n AS n_b",
        *[f"x{i} AS b{i}" for i in range(dim)],
    )
    dot_expr = F.expr(" + ".join(f"a{i} * b{i}" for i in range(dim)))
    # No broadcast hints: the unpacked vector table is corpus-sized, so a
    # forced broadcast would OOM at scale. Stats/AQE still broadcast it at
    # test SF (tiny) and fall back to a vec_id shuffle join once it isn't.
    return (
        candidates.join(va_x, "vec_a")
        .join(vb_x, "vec_b")
        .withColumn("cos_raw", dot_expr / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cos_raw") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", round_half_up(F.col("cos_raw"), 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new shard vs existing corpus (the production shape).
# ---------------------------------------------------------------------------
# An arriving shard (every 5th doc here) is deduped against the accepted
# corpus + earlier arrivals WITHOUT re-mining corpus-vs-corpus pairs: the
# band join is BIPARTITE (all-docs bands × new-docs bands), so candidate
# generation cost is proportional to the new shard, not the corpus. This is
# the steady-state cost model of a 100 TB ingest pipeline — the full
# corpus-wide mine (dedup_minhash_lsh) runs once, this runs per batch.
INCR_NEW_MOD = 5

_INCR_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT b.doc_id AS nid, a.doc_id AS pid, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh
      WHERE b.doc_id % {INCR_NEW_MOD} = 0
        AND a.doc_id != b.doc_id
        AND (a.doc_id % {INCR_NEW_MOD} != 0 OR a.doc_id < b.doc_id)
      GROUP BY 1, 2
    ),
    quals AS (
      SELECT nid, pid, i::DOUBLE / (ca.n + cb.n - i) AS j
      FROM inter
      JOIN cnt ca ON pid = ca.doc_id
      JOIN cnt cb ON nid = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    )
    SELECT nid AS doc_id,
           min(pid) AS dup_of,
           {sql_round_half_up("arg_min(j, pid)", 4)} AS jaccard
    FROM quals GROUP BY nid ORDER BY doc_id
"""


@query("dedup_incremental_shard", oracle=_INCR_ORACLE)
def incremental_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup check for an arriving shard: which new docs
    (doc_id % 5 == 0) duplicate an accepted doc (the corpus, or an earlier
    arrival with a smaller id)? Signatures are one map-side pass over all
    docs, but the band join is bipartite (all × new-only), so candidates —
    and therefore exact-verification work — scale with the SHARD, never
    corpus². Output: each flagged new doc with its smallest qualifying
    partner and that partner's exact Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    sh_rows = docs.select("doc_id", F.explode(shingle_hashes(F.col("text"), 3)).alias("h"))
    sigs = sh_rows.groupBy("doc_id").agg(*minhash_agg_exprs("h", NUM_PERM))
    rows_per_band = NUM_PERM // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh{band * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("bh"),
                    )
                    for band in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    new_bands = bands.filter(F.col("doc_id") % INCR_NEW_MOD == 0)
    a, b = bands.alias("a"), new_bands.alias("b")
    accepted_before = (F.col("a.doc_id") % INCR_NEW_MOD != 0) | (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & accepted_before,
        )
        .select(F.col("b.doc_id").alias("nid"), F.col("a.doc_id").alias("pid"))
        .distinct()
    )
    sets_n = docs.select(
        F.col("doc_id").alias("nid"), shingle_hashes(F.col("text"), 3).alias("sh_n")
    )
    sets_p = docs.select(
        F.col("doc_id").alias("pid"), shingle_hashes(F.col("text"), 3).alias("sh_p")
    )
    inter = F.size(F.array_intersect("sh_n", "sh_p"))
    verified = (
        candidates.join(sets_n, "nid")
        .join(sets_p, "pid")
        .select(
            "nid",
            "pid",
            (
                inter.cast("double") / (F.size("sh_n") + F.size("sh_p") - inter)
            ).alias("j_raw"),
        )
        .filter(F.col("j_raw") >= JACCARD_THRESHOLD)
    )
    best = F.min(F.struct(F.col("pid"), F.col("j_raw"))).alias("best")
    return (
        verified.groupBy("nid")
        .agg(best)
        .select(
            F.col("nid").alias("doc_id"),
            F.col("best.pid").alias("dup_of"),
            round_half_up(F.col("best.j_raw"), 4).alias("jaccard"),
        )
        .orderBy("doc_id")
    )


# --- cross-document exact span dedup ---------------------------------------
# Block-granular exact substring dedup (the Lee et al. "Deduplicating
# Training Data Makes Language Models Better" shape, with the suffix array
# replaced by fixed 8-token blocks — the practical distributed variant):
# find token spans that occur verbatim in more than one document and score
# every document by its duplicated-span fraction. Catches copy-paste
# contamination that whole-doc MinHash misses when the surrounding text
# differs.

SPAN_TOKENS = 8

_SPAN_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), blocks AS (
      SELECT doc_id, unnest(range(0, len(t) // {n})) AS i, t FROM toks
    ), keyed AS (
      SELECT doc_id, md5(array_to_string(t[(i*{n}+1):(i*{n}+{n})], ' ')) AS bkey
      FROM blocks
    ), spread AS (
      SELECT bkey, count(DISTINCT doc_id) AS nd FROM keyed GROUP BY bkey
    )
    SELECT k.doc_id,
           count(*) AS n_blocks,
           CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
           {frac} AS dup_frac
    FROM keyed k JOIN spread s USING (bkey)
    GROUP BY k.doc_id
    ORDER BY doc_id
""".format(
    n=SPAN_TOKENS,
    frac=sql_round_half_up(
        "sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)", 4
    ),
)


@query("dedup_exact_spans", oracle=_SPAN_ORACLE)
def exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction over disjoint 8-token blocks.

    100 TB shape: block extraction is a map-side explode (each doc emits
    n_tokens/8 rows of one 32-byte md5 each — the tokens themselves never
    shuffle); the only wide stages are a groupBy on the block hash (dup
    spread) and the per-doc re-aggregation. Joining the spread back on the
    block hash is shuffle-on-32-bytes — at production scale the spread side
    would first drop nd=1 rows (the overwhelming majority) and the join
    becomes a small anti/semi pattern; here the full join keeps every doc
    in the output so the oracle covers the zeros too."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    # The block lambda slices the MATERIALIZED "toks" column, never the raw
    # tokens() subtree: slice(<subtree>, ...) re-splits the text per block
    # inside the interpreted lambda — O(tokens²/block) per doc (the round-7
    # shingles() lesson).
    n_blocks = F.floor(F.size("toks") / F.lit(SPAN_TOKENS)).cast("int")
    # sequence(0, -1) would DESCEND in Spark — docs shorter than one block
    # must yield an empty array (mirrors DuckDB's empty range()).
    idx = F.when(n_blocks >= 1, F.sequence(F.lit(0), n_blocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    keyed = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("toks"), i * SPAN_TOKENS + 1, SPAN_TOKENS)
                    )
                ),
            )
        ).alias("bkey"),
    )
    spread = keyed.groupBy("bkey").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        keyed.join(spread, "bkey")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(dup).cast("bigint").alias("n_dup_blocks"),
            round_half_up(F.sum(dup).cast("double") / F.count("*"), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


_CLUSTER_SIZES_ORACLE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT da AS a, db AS b FROM pairs
      UNION SELECT db, da FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, min(b)) AS keep_doc_id
      FROM reach GROUP BY a
    ),
    clusters AS (
      SELECT keep_doc_id, count(*) AS cluster_size FROM labels GROUP BY keep_doc_id
    )
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(sum(cluster_size - 1) AS BIGINT) AS n_removable
    FROM clusters
    GROUP BY cluster_size
    ORDER BY cluster_size
"""


@query("dedup_cluster_sizes", oracle=_CLUSTER_SIZES_ORACLE)
def cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size census — the dedup REPORT that sizes the
    decision every curation run makes: how many docs sit in clusters of
    2, 3, …, and how many rows deduplication would remove
    (`n_removable` = Σ(size-1)). Reuses the LSH-mined connected
    components (component_labels); the two extra aggregations are on the
    label table, whose cardinality is docs-in-dup-pairs, not the corpus.
    Oracle extends the recursive-CTE components with the same census."""
    labels = component_labels(load_table(spark, sf_dir, "documents"))
    clusters = labels.groupBy("keep_doc_id").agg(F.count("*").alias("cluster_size"))
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
            F.sum(F.col("cluster_size") - 1).cast("bigint").alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


_EDIT_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    )
    SELECT p.da AS doc_a, p.db AS doc_b,
           levenshtein(substr(a.text, 1, 120), substr(b.text, 1, 120)) AS lev_120
    FROM pairs p
    JOIN documents a ON p.da = a.doc_id
    JOIN documents b ON p.db = b.doc_id
    ORDER BY doc_a, doc_b
"""


@query("dedup_edit_distance", oracle=_EDIT_ORACLE)
def edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification layer over the LSH candidate pairs: the
    character-level second opinion (OCR noise, punctuation-only diffs)
    that token-set Jaccard is blind to, computed on 120-char prefixes so
    the quadratic-in-length DP stays bounded per pair. Candidates come
    from the MinHash-LSH miner — levenshtein only ever runs on the mined
    pair list, never n² — and the integer distances are engine-exact, so
    the whole path hash-checks against the recursive candidate oracle.

    Broadcast direction (VERDICT r4 fix): the SMALL side here is the
    mined pair list, not the corpus — broadcasting the 120-char prefix
    table of every document (the r4 code) is a driver/executor OOM at
    100 TB. So the pair list is the broadcast build side of join #1, and
    join #2 broadcasts the pair-sized intermediate (pairs + pref_a); the
    corpus prefix scans stream on the probe side of both joins.
    test_plans.py asserts no corpus scan ever sits under a
    BroadcastExchange."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        _lsh_verified_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    pref = docs.select("doc_id", F.substring("text", 1, 120).alias("pref"))
    a = pref.select(F.col("doc_id").alias("doc_a"), F.col("pref").alias("pref_a"))
    b = pref.select(F.col("doc_id").alias("doc_b"), F.col("pref").alias("pref_b"))
    with_a = a.join(F.broadcast(pairs), "doc_a")
    return (
        b.join(F.broadcast(with_a), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pref_a", "pref_b").alias("lev_120"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query("dedup_prefix_filter", oracle=_JACCARD_ORACLE)
def prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the PPJoin family)
    — the deterministic alternative to MinHash-LSH: order each document's
    shingles by global rarity, index only the first n − ⌈t·n⌉ + 1 of them
    (the "prefix"), and join on prefix shingles only. Two sets with
    Jaccard ≥ t MUST share a prefix element under any consistent global
    order (pigeonhole), so unlike LSH there is no recall parameter — the
    output probably-equals nothing, it EQUALS the exact join, which is why
    this query shares the exact oracle verbatim.

    Scale shape: one df-count aggregation (vocabulary-sized), one per-doc
    rarity-sort aggregation, and the candidate join runs on the RAREST
    shingles only — the frequent shingles that explode an inverted-index
    join are exactly the ones the prefix excludes. Verification is
    candidate-only, as in the LSH path."""
    docs = load_table(spark, sf_dir, "documents")
    # persist: the exploded shingle table feeds TWO consumers (df counts,
    # the prefix base) — without it each consumer re-parses and re-hashes
    # the corpus (measured 9.6 → 6.7 s warm at sf0.1); bounded so repeated
    # invocations don't accumulate cached epochs
    sh = persist_bounded(
        "dedup_prefix_filter.sh",
        docs.select("doc_id", F.explode(shingle_hashes(F.col("text"), 3)).alias("h")),
    )
    df_counts = sh.groupBy("h").agg(F.count("*").alias("df"))
    # Prefix selection as ONE per-doc aggregation (r11, guide §2.4): the
    # former shape — a row_number window ordered by (df, h) plus a separate
    # per-doc size aggregation joined back — cost two extra shuffles (the
    # n_per_doc groupBy and the window's doc_id sort-exchange on the full
    # shingle table). sort_array(collect_list(struct(df, h))) establishes
    # the identical rarity order ((df, h) is a total order per doc: shingle
    # hashes are distinct within a doc), the doc's shingle count is
    # size(arr) (same distinct-shingle count n_per_doc measured), and
    # slice(…, 1, n div 2 + 1) is exactly rnk <= n div 2 + 1 — the t=0.5
    # prefix length n - ceil(n/2) + 1. Per-doc state is bounded by document
    # length, the same bound the window's per-doc group already carried.
    # Measured (alternating 4-pass A/B at sf0.1, same session, rows
    # identical): 6.68 → 4.55 s min. Rebuilding the verify-side shingle
    # arrays from the persisted sh instead was re-measured a wash (4.62 s),
    # confirming the r2 finding — kept as-is.
    prefix = (
        sh.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("arr"))
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(slice(arr, 1, size(arr) div 2 + 1), x -> x.h)")
            ).alias("h"),
        )
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    candidates = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets_a = docs.select(
        F.col("doc_id").alias("doc_a"), shingle_hashes(F.col("text"), 3).alias("sh_a")
    )
    sets_b = docs.select(
        F.col("doc_id").alias("doc_b"), shingle_hashes(F.col("text"), 3).alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .withColumn(
            "jaccard_raw",
            inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter),
        )
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", round_half_up(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash with a DuckDB twin --------------------------------------------
# The registered dedup_simhash uses xxhash64 bit votes (no DuckDB
# equivalent → rows-only). This variant derives the 32 signature bits from
# md5 — available in BOTH engines — so the SimHash construction itself is
# hash-checked: banding completeness (4 bands × 8 bits ⇒ hamming ≤ 3 has a
# clean band) must reproduce the brute-force all-pairs answer exactly.
SIMHASH32_BITS = 32
SIMHASH32_BANDS = 4
SIMHASH32_MAX_HAMMING = 3

_SH32_VOTES_SQL = ", ".join(
    f"sum(CASE WHEN (h32 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH32_BITS)
)
_SH32_ASSEMBLE_SQL = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH32_BITS)
)

_SIMHASH32_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS s
      FROM toks
    ), bits AS (
      SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h32 FROM sh
    ), votes AS (
      SELECT doc_id, {_SH32_VOTES_SQL} FROM bits GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {_SH32_ASSEMBLE_SQL} AS sim FROM votes
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sim, b.sim)) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= {SIMHASH32_MAX_HAMMING}
    ORDER BY doc_a, doc_b
"""


@query("dedup_simhash_checked", oracle=_SIMHASH32_ORACLE)
def simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the signature bits derived from md5, so
    the WHOLE construction — bit votes, signature assembly, banded
    candidate mining, hamming verification — has an exact cross-engine
    twin. The oracle computes the all-pairs hamming-≤3 answer brute-force;
    the Spark side finds it via 4×8-bit banding (pigeonhole: ≤3 flipped
    bits leave ≥1 band untouched), proving the banded plan loses nothing.
    Scale shape identical to the 64-bit production simhash above: one
    explode+32-sum aggregation per doc, band self-join on 8-bit buckets,
    hamming check on candidates only."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("s"))
    h32 = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long")
    votes = sh.select("doc_id", h32.alias("h32")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h32"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH32_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH32_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    sigs = votes.select("doc_id", sim.alias("sim"))
    bands = sigs.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("sim"), 8 * k).bitwiseAND(F.lit(255)).alias("bv"),
                    )
                    for k in range(SIMHASH32_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sim", "b.band", "b.bv")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH32_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# --- MinHash with a DuckDB twin --------------------------------------------
# Completes the checked-sketch trilogy (SimHash and Count-Min above): 16
# md5-derived permutations make the SIGNATURE itself cross-engine exact, so
# the estimator's agreement fraction — not just the verified output — is
# hash-checked against the true Jaccard of every qualifying pair.
MINHASH_CHECKED_PERMS = 16

_MHC_MIN_SQL = ", ".join(
    f"min(('0x' || substr(md5(CAST({p} AS VARCHAR) || '|' || s), 1, 8))::BIGINT) AS m{p}"
    for p in range(MINHASH_CHECKED_PERMS)
)
_MHC_AGREE_SQL = " + ".join(
    f"(CASE WHEN a.m{p} = b.m{p} THEN 1 ELSE 0 END)" for p in range(MINHASH_CHECKED_PERMS)
)

_MINHASH_CHECKED_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS s
      FROM toks
    ),
    sigs AS (
      SELECT doc_id, {_MHC_MIN_SQL} FROM sh GROUP BY doc_id
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS j
      FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    )
    SELECT p.da AS doc_a, p.db AS doc_b,
           {sql_round_half_up("p.j", 4)} AS jaccard,
           {sql_round_half_up(f"({_MHC_AGREE_SQL}) / {MINHASH_CHECKED_PERMS}.0", 4)} AS mh_estimate
    FROM pairs p
    JOIN sigs a ON p.da = a.doc_id
    JOIN sigs b ON p.db = b.doc_id
    ORDER BY doc_a, doc_b
"""


@query("dedup_minhash_checked", oracle=_MINHASH_CHECKED_ORACLE)
def minhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures from md5 permutations: for every true near-dup
    pair, emit the exact Jaccard AND the signature-agreement estimate —
    both engines compute identical signatures, so the ESTIMATOR itself is
    hash-checked (the expected agreement equals the Jaccard; with 16
    perms the estimate is coarse, which is exactly what the side-by-side
    shows). Same aggregation shape as the production 64-perm xxhash64
    path (explode once, min per permutation, map-side partials)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("s"))
    mh = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{p}|"), F.col("s"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"m{p}")
        for p in range(MINHASH_CHECKED_PERMS)
    ]
    sigs = sh.groupBy("doc_id").agg(*mh)
    pairs = _shingle_pairs(docs).filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"m{p}").alias(f"a{p}") for p in range(MINHASH_CHECKED_PERMS)]
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"m{p}").alias(f"b{p}") for p in range(MINHASH_CHECKED_PERMS)]
    )
    agree = None
    for p in range(MINHASH_CHECKED_PERMS):
        term = F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    # Broadcast direction: the pair list is the small side — hinting the
    # per-doc signature table (corpus-sized) would OOM at scale; join #2
    # broadcasts the pair-bounded intermediate (pairs + a-signature).
    with_a = a.join(F.broadcast(pairs), "doc_a")
    return (
        b.join(F.broadcast(with_a), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_half_up(F.col("jaccard_raw"), 4).alias("jaccard"),
            round_half_up(agree / F.lit(float(MINHASH_CHECKED_PERMS)), 4).alias("mh_estimate"),
        )
        .orderBy("doc_a", "doc_b")
    )


_XSOURCE_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    )
    SELECT least(x.source, y.source) AS source_a,
           greatest(x.source, y.source) AS source_b,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END) AS BIGINT) AS n_intra
    FROM pairs p
    JOIN documents x ON p.da = x.doc_id
    JOIN documents y ON p.db = y.doc_id
    GROUP BY 1, 2
    ORDER BY source_a, source_b
"""


@query("dedup_cross_source_matrix", oracle=_XSOURCE_ORACLE)
def cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: near-dup pairs bucketed by the
    (unordered) source pair — the provenance report that tells a curation
    team WHICH feeds duplicate each other (mirror sites, scraped
    re-posts) vs which duplicate internally. Pairs come from the LSH
    miner; the matrix is two source-lookup joins (pair side broadcast,
    doc→source map streamed) plus a |sources|²-bounded aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        _lsh_verified_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    src = docs.select("doc_id", "source")
    xa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    xb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    # Broadcast the mined pair list, not the doc→source map: the map is one
    # row per document (corpus-sized), the pairs are candidate-bounded.
    with_a = xa.join(F.broadcast(pairs), "doc_a")
    return (
        xb.join(F.broadcast(with_a), "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("src_a") == F.col("src_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_intra"),
        )
        .orderBy("source_a", "source_b")
    )


_WEIGHTED_KEEP_ORACLE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT da AS a, db AS b FROM pairs
      UNION SELECT db, da FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    best AS (
      SELECT l.cluster_id,
             max(row(d.n_chars, -d.doc_id)) AS _k
      FROM labels l JOIN documents d ON l.doc_id = d.doc_id
      GROUP BY l.cluster_id
    )
    SELECT l.doc_id, l.cluster_id,
           (b._k)[1] AS keep_n_chars,
           -(b._k)[2] AS keep_doc_id,
           CASE WHEN l.doc_id = -(b._k)[2] THEN 0 ELSE 1 END AS drop_flag
    FROM labels l JOIN best b ON l.cluster_id = b.cluster_id
    ORDER BY doc_id
"""


@query("dedup_keep_list_weighted", oracle=_WEIGHTED_KEEP_ORACLE)
def keep_list_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor: within each near-dup cluster keep the
    LONGEST document (tie-break lowest id) instead of the lowest id — the
    policy real curation uses, because near-dups often differ by
    truncation and the min-id pick systematically keeps the fragment. One
    extra max-struct aggregation over the label table; everything
    upstream is the shared LSH component machinery."""
    docs = load_table(spark, sf_dir, "documents")
    labels = component_labels(docs).withColumnRenamed("keep_doc_id", "cluster_id")
    sized = labels.join(docs.select("doc_id", "n_chars"), "doc_id")
    best = sized.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))).alias("k")
    )
    return (
        labels.join(best, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            F.col("k.n_chars").alias("keep_n_chars"),
            (-F.col("k.neg_id")).alias("keep_doc_id"),
            F.when(F.col("doc_id") == -F.col("k.neg_id"), 0).otherwise(1).alias("drop_flag"),
        )
        .orderBy("doc_id")
    )


# --- MinHash-LSH evaluation harness -----------------------------------------
# The measurement every production dedup rollout needs: run the SKETCH-ONLY
# decision rule (band candidates + signature-estimate >= t, no exact
# verification) against the exact-Jaccard truth, and report TP/FP/FN with
# precision/recall. Both sides are deterministic md5 constructions, so the
# EVALUATION ITSELF is hash-checked — the numbers the sketch trades on are
# provably the numbers reported. Banding: 16 md5 permutations in 4 bands
# of 4; predict duplicate iff some band matches AND >= 8/16 perms agree.

MHE_BANDS = 4  # 4 perms per band over MINHASH_CHECKED_PERMS = 16
MHE_MIN_AGREE = 8

_MHE_BAND_MATCH_SQL = " OR ".join(
    "(" + " AND ".join(f"a.m{b * 4 + k} = b.m{b * 4 + k}" for k in range(4)) + ")"
    for b in range(MHE_BANDS)
)

_MINHASH_EVAL_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   for i in range(1, len(t) - 1)])) AS s
      FROM toks
    ),
    sigs AS (
      SELECT doc_id, {_MHC_MIN_SQL} FROM sh GROUP BY doc_id
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT da, db FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE i::DOUBLE / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    ),
    predicted AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE ({_MHE_BAND_MATCH_SQL})
        AND ({_MHC_AGREE_SQL}) >= {MHE_MIN_AGREE}
    ),
    joined AS (
      SELECT coalesce(t.da, p.da) AS da,
             t.da IS NOT NULL AS in_truth,
             p.da IS NOT NULL AS in_pred
      FROM truth t FULL OUTER JOIN predicted p
        ON t.da = p.da AND t.db = p.db
    )
    SELECT CAST(sum(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
           CAST(sum(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT) AS n_predicted,
           CAST(sum(CASE WHEN in_truth AND in_pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN in_pred AND NOT in_truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN in_truth AND NOT in_pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           {sql_round_half_up(
               "sum(CASE WHEN in_truth AND in_pred THEN 1 ELSE 0 END)::DOUBLE"
               " / sum(CASE WHEN in_pred THEN 1 ELSE 0 END)", 4)} AS precision_,
           {sql_round_half_up(
               "sum(CASE WHEN in_truth AND in_pred THEN 1 ELSE 0 END)::DOUBLE"
               " / sum(CASE WHEN in_truth THEN 1 ELSE 0 END)", 4)} AS recall_
    FROM joined
"""


@query("dedup_minhash_eval", oracle=_MINHASH_EVAL_ORACLE)
def minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-only MinHash-LSH decisions scored against exact truth — see
    the block comment. One output row: counts + precision/recall.

    On THIS corpus the report is a perfect 25/25 at sf0.01 for every
    min-agree threshold from 4 to 12 (swept): the generator's pair-Jaccard
    distribution is bimodal (true near-dups ≈ 0.8+, everything else ≈ 0),
    so there is no borderline mass for the sketch to misclassify. That is
    a property of the corpus, not the harness — the FP/FN accounting is
    live, and on a corpus with borderline pairs the same query prices the
    sketch's precision/recall trade directly."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("s"))
    mh = [
        F.min(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{p}|"), F.col("s"))), 1, 8), 16, 10
            ).cast("long")
        ).alias(f"m{p}")
        for p in range(MINHASH_CHECKED_PERMS)
    ]
    sigs = persist_bounded("dedup_minhash_eval.sigs", sh.groupBy("doc_id").agg(*mh))
    a = sigs.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"m{p}").alias(f"am{p}") for p in range(MINHASH_CHECKED_PERMS)],
    )
    b = sigs.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"m{p}").alias(f"bm{p}") for p in range(MINHASH_CHECKED_PERMS)],
    )
    agree = None
    for p in range(MINHASH_CHECKED_PERMS):
        term = F.when(F.col(f"am{p}") == F.col(f"bm{p}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    # Predicted side via the BANDED SHUFFLE, not a signature self-join:
    # "some band matches" is an equi-join on the exploded (band, 4-perm
    # struct) rows — identical semantics to the oracle's OR-of-bands
    # predicate (struct equality is exact value equality, no hashing), one
    # bounded shuffle instead of the n² nested-loop the OR condition
    # forces. The agreement filter then runs on candidates only, with the
    # pair side broadcast per the corpus-broadcast policy. Only the TRUTH
    # side below stays deliberately quadratic — being exact ground truth
    # is its entire job, and it is labeled as such.
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.struct(
                            *[
                                F.col(f"m{band * 4 + k}").alias(f"p{k}")
                                for k in range(4)
                            ]
                        ).alias("sig4"),
                    )
                    for band in range(MHE_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.sig4")
    x, y = band_rows.alias("x"), band_rows.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig4") == F.col("y.sig4"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .distinct()
    )
    cand_a = a.join(F.broadcast(cand), "da")
    predicted = (
        b.join(F.broadcast(cand_a), "db")
        .filter(agree >= MHE_MIN_AGREE)
        .select("da", "db")
    )
    truth = (
        _shingle_pairs(docs)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select(F.col("doc_a").alias("da"), F.col("doc_b").alias("db"))
    )
    t = truth.withColumn("in_truth", F.lit(True))
    p = predicted.withColumn("in_pred", F.lit(True))
    joined = t.join(p, ["da", "db"], "full_outer").select(
        F.coalesce(F.col("in_truth"), F.lit(False)).alias("in_truth"),
        F.coalesce(F.col("in_pred"), F.lit(False)).alias("in_pred"),
    )
    tp = F.sum(F.when(F.col("in_truth") & F.col("in_pred"), 1).otherwise(0))
    npred = F.sum(F.when(F.col("in_pred"), 1).otherwise(0))
    ntruth = F.sum(F.when(F.col("in_truth"), 1).otherwise(0))
    return joined.agg(
        ntruth.cast("bigint").alias("n_truth"),
        npred.cast("bigint").alias("n_predicted"),
        tp.cast("bigint").alias("tp"),
        F.sum(F.when(F.col("in_pred") & ~F.col("in_truth"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("in_truth") & ~F.col("in_pred"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        round_half_up(tp.cast("double") / npred, 4).alias("precision_"),
        round_half_up(tp.cast("double") / ntruth, 4).alias("recall_"),
    )
