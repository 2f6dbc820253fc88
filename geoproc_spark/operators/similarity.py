"""Similarity search over embedding columns (ARRAY<FLOAT>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. Dot
  products are JVM folds (zip_with + aggregate in whole-stage codegen);
  the query side is broadcast, so the scan side never shuffles.
- `random_hyperplane_buckets` + `ann_topk_lsh`: the scale path — sign-LSH
  bucketing with seeded deterministic hyperplanes; candidates come from the
  query's bucket (plus optional multi-probe neighbors), exact re-rank inside
  the bucket. Recall is validated against brute force in tests.
- `embedding_near_dups`: all pairs above a cosine threshold, via bucket
  join (brute-force variant for oracle checking).

Scale notes: brute force is O(N x Q) but embarrassingly parallel with zero
shuffle (broadcast queries); LSH reduces the candidate set ~2^n_planes-fold;
at 10^12 rows the bucket table is the thing you partition and persist —
bucket id doubles as the storage partition key (same cell-prefix trick as
the geo side).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(pairs: DataFrame, a_col: str = "emb_a", b_col: str = "emb_b") -> DataFrame:
    cos = (_dot(F.col(a_col), F.col(b_col)) / (_norm(F.col(a_col)) * _norm(F.col(b_col)))).alias(
        "cos"
    )
    return pairs.withColumn("cos", cos)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid_col: str = "qid",
    vid_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors: (qid, vec_id, rank). Self-matches excluded.
    Ties broken by vec_id (deterministic)."""
    q = queries.select(F.col(qid_col).alias("qid"), F.col("embedding").alias("emb_q"))
    c = corpus.select(F.col(vid_col).alias("vec_id"), F.col("embedding").alias("emb_c"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (_dot(F.col("emb_q"), F.col("emb_c")) / (_norm(F.col("emb_q")) * _norm(F.col("emb_c")))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_buckets(
    df: DataFrame, planes: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Add `bucket` = sign-LSH code (BIGINT). The planes fold into literal
    arrays — the whole bucketing is a codegen'd JVM expression, no UDF."""
    code = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        d = _dot(F.col(emb_col), lit_plane)
        code = code + F.when(d > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return df.withColumn("bucket", code)


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    planes: np.ndarray,
    k: int = 5,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, exact
    cosine re-rank within. (qid, vec_id, rank).

    multi_probe: additionally probe every bucket at hamming distance 1 from
    the query's code (n_planes+1 buckets total) — standard multi-probe LSH,
    trading candidate volume for recall without growing the bucket table."""
    qb = random_hyperplane_buckets(
        queries.select(F.col("qid"), F.col("embedding").alias("emb_q")), planes, "emb_q"
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("bigint"))
                for j in range(len(planes))
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    cb = random_hyperplane_buckets(
        corpus.select(F.col("vec_id"), F.col("embedding").alias("emb_c")), planes, "emb_c"
    )
    scored = (
        cb.join(qb, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (_dot(F.col("emb_q"), F.col("emb_c")) / (_norm(F.col("emb_q")) * _norm(F.col("emb_c")))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank")
    )


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine > threshold — brute-force
    variant (oracle-checkable); the LSH-bucketed variant joins on `bucket`
    first for the same output at scale."""
    a = corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        with_cosine(pairs)
        .filter(F.col("cos") > threshold)
        .select("vec_a", "vec_b")
    )
