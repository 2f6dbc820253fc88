"""Deduplication operators for web-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash signatures, and n-gram Jaccard — all pure DataFrame ops over
portable md5-derived hashes, so a SQL oracle reproduces them bit-for-bit.

Scale notes:
- exact dedup: one hash aggregate on md5(text) — map-side partial combine,
  no driver involvement.
- MinHash + SimHash signatures: ZERO-shuffle per-row higher-order
  expressions (shingle-hash array -> array_min/aggregate folds per
  permutation/bit, all inside one whole-stage-codegen projection). At
  10^12 docs the signature pass is a pure map — it scales with scan
  bandwidth and nothing else.
- LSH bucket join: the only shuffle; self-equi-join on (band_id, band_key).
  Hot buckets (boilerplate text) are exactly the skew case — AQE skew-join
  splits them, and max_bucket_size drops degenerate buckets from pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, min_doc, max_doc)."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingle_h32_expr(k: int = 3) -> str:
    """Spark-SQL expression: ARRAY<BIGINT> of 32-bit-reduced hashes of each
    DISTINCT k-gram shingle of `text` — a per-row higher-order expression,
    no explode, no shuffle.

    Shingles, not tokens: with a small vocabulary token sets of unrelated
    docs overlap heavily and MinHash degenerates; the k-gram space is
    |V|^k so random docs share almost nothing."""
    sh = TX.shingles_sql_spark("split(text, ' ')", k)
    return (
        f"transform({sh}, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)"
        f" % {TX.H32_P})"
    )


def doc_shingle_hashes(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, h32) per DISTINCT k-gram shingle — the exploded (long) form,
    for callers that need the hash stream; the signature operators below
    use the array form and never shuffle it."""
    return docs.selectExpr("doc_id", f"explode({_shingle_h32_expr(k)}) AS h32")


def minhash_signatures(docs: DataFrame, perms: list[tuple[int, int, int]]) -> DataFrame:
    """Wide signature row per doc: (doc_id, mh0..mh{n-1}).

    ZERO shuffles: each permutation's minimum folds over the per-row
    shingle-hash array with array_min(transform(...)) — all n signatures
    are per-row expressions inside one whole-stage-codegen'd project.
    (Profiled 2.7x faster than the previous single-groupBy form, which was
    itself chosen over the explode-x-n shape; the shuffle of |doc| x
    |shingles| rows is gone entirely.)"""
    mins = [
        f"array_min(transform(h, x -> ({a}L * x + {b}L) % {TX.H32_P}L)) AS mh{p}"
        for p, a, b in perms
    ]
    return (
        docs.selectExpr("doc_id", f"{_shingle_h32_expr()} AS h")
        # docs too short to shingle have NO signature (array_min(empty) is
        # NULL; the exploded/oracle form produces no rows for them) — drop,
        # or every short doc would share the all-NULL band key
        .filter("size(h) > 0")
        .selectExpr("doc_id", *mins)
    )


def lsh_bands(
    signatures: DataFrame, n_perms: int, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band_id, band_key): band_key is the ordered concat of the
    band's minhash values — pure column expressions + stack, no second
    aggregate."""
    n_bands = n_perms // rows_per_band
    keys = []
    for b in range(n_bands):
        cols = ", ".join(
            f"CAST(mh{b * rows_per_band + r} AS STRING)" for r in range(rows_per_band)
        )
        keys.append(f"{b}, concat_ws(',', {cols})")
    stack = f"stack({n_bands}, {', '.join(keys)}) AS (band_id, band_key)"
    return signatures.selectExpr("doc_id", stack)


def lsh_candidate_pairs(
    docs: DataFrame,
    perms: list[tuple[int, int, int]],
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) sharing >= 1 band.

    The bands table is persisted before the self-join: without it Catalyst
    re-executes the whole shingle->md5->minhash subtree once per join side
    (and the pushed non-empty filter recomputes the shingle HOF again) —
    profiled at ~4x the work. At warehouse scale this persist is a stage
    boundary: signatures land in a table once, the pair join scans it.
    Repeated calls in one session hold at most ONE cached copy
    (_cache.swap_cache releases the previous call's).

    max_bucket_size: the hot-bucket guard. A band bucket of b docs emits
    O(b^2) pairs — one boilerplate bucket of 10^6 docs would emit 5*10^11
    pairs and sink the job. Buckets larger than the cap are DROPPED from
    pairing (standard MinHashLSH practice: near-identical boilerplate is
    better handled by exact dedup upstream); docs in a dropped bucket still
    pair through their other, smaller bands. None = no cap (the fixture
    default — keeps oracle exactness; production sets ~10^3-10^4).
    """
    from ._cache import swap_cache

    bands = swap_cache(
        "lsh_bands", lsh_bands(minhash_signatures(docs, perms), len(perms), rows_per_band)
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_id", "band_key")
        bands = bands.withColumn("_bsz", F.count("*").over(w)).filter(
            F.col("_bsz") <= max_bucket_size
        ).drop("_bsz")
    b1 = bands.select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_key"
    )
    b2 = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    return (
        b1.join(b2, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(docs: DataFrame, n_bits: int = 60) -> DataFrame:
    """(doc_id, simhash): bit j set iff sum over distinct 3-gram shingles of
    (bit_j(h) ? +1 : -1) is positive. 60 bits (the portable hash width).

    ZERO shuffles: each bit counter is an aggregate(...) fold over the
    per-row shingle-hash array, all 60 inside one codegen'd projection —
    no explode, no groupBy (profiled 2.5x faster than the previous
    single-groupBy form; the |doc| x |shingles| shuffle is gone)."""
    sh = TX.shingles_sql_spark("split(text, ' ')", 3)
    hashes = f"transform({sh}, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    bits = " + ".join(
        f"(CASE WHEN aggregate(h, 0L, (acc, x) -> acc + "
        f"CASE WHEN (x >> {b}) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0L END)"
        for b in range(n_bits)
    )
    return (
        docs.selectExpr("doc_id", f"{hashes} AS h")
        # no shingles -> no signature (matches the exploded/oracle form,
        # which emits no rows for docs shorter than the shingle width)
        .filter("size(h) > 0")
        .selectExpr("doc_id", f"({bits}) AS simhash")
    )


def hamming_distance(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def connected_components(ids: DataFrame, pairs: DataFrame, max_rounds: int = 16) -> DataFrame:
    """(doc_id, component) where component = min doc_id reachable through
    the pair graph — the canonical-document assignment after near-dup
    pairing (every doc appears; singletons map to themselves).

    Iterative min-label propagation: each round joins labels to the
    symmetric edge list and takes the neighborhood minimum; stops when no
    label changed. Rounds = graph diameter, which for near-dup clusters is
    tiny (clusters are near-cliques); the label table is (doc_id, label)
    only, so each round is one small shuffle join — the simple variant of
    large-star/small-star CC, sufficient here and honest about its bound
    (max_rounds guards pathological chains).
    """
    from ._cache import swap_cache

    # edges are re-joined EVERY round: persist them, or each iteration
    # re-executes the caller's whole pair-generation lineage (LSH + jaccard
    # refine) — measured 4x the total wall without this
    edges = swap_cache(
        "cc_edges",
        pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
            pairs.selectExpr("doc_b AS src", "doc_a AS dst")
        ),
    )
    labels = ids.select(F.col("doc_id"), F.col("doc_id").alias("component"))
    prev = None
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("component").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left_outer")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce("nbr", F.col("component"))).alias(
                    "component"
                ),
            )
            .persist()
        )
        stable = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "doc_id")
            .filter(F.col("component") != F.col("old"))
            .isEmpty()  # also materializes new_labels' cache
        )
        if prev is not None:
            prev.unpersist()
        prev = labels = new_labels
        if stable:
            break
    # hand the final (persisted) labels to the bounded registry: the next
    # connected_components call releases it
    return swap_cache("cc_labels", labels)


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, k: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for given (doc_a, doc_b) pairs:
    (doc_a, doc_b, n_inter, n_union) — integer-exact, ratio left to the
    caller (n_inter/n_union)."""
    sh = docs.selectExpr(
        "doc_id", TX.shingles_sql_spark("split(text, ' ')", k) + " AS sh"
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    n_inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    return j.select(
        "doc_a",
        "doc_b",
        n_inter.alias("n_inter"),
        (F.size("sh_a") + F.size("sh_b") - n_inter).cast("bigint").alias("n_union"),
    )
