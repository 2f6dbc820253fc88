#!/usr/bin/env python
"""Stage isolation for dedup_components (r6)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"


def t(spark, name, df):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name:45s} {time.time() - t0:8.2f} s")
    spark.sparkContext.setJobDescription(None)


def main():
    from pyspark.sql import functions as F

    from geoproc_spark import synth
    from geoproc_spark.functions import textkern as TK
    from geoproc_spark.operators import dedup as dd
    from geoproc_spark.operators._cache import swap_cache
    from geoproc_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe-cc", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).select(F.sum("id")).collect()

    docs = dd.spread(synth.docs_dup_df(spark, SF_DIR))
    perms = synth.minhash_perms()

    t0 = time.time()
    base = swap_cache("p_base", TK.cc_base(docs, perms))
    n = base.count()
    print(f"{'cc_base materialize (n=' + str(n) + ')':45s} {time.time() - t0:8.2f} s")

    sigs = base.filter("mh0 IS NOT NULL")
    t0 = time.time()
    bands = swap_cache("p_bands", dd.lsh_bands(sigs, len(perms), rows_per_band=4))
    nb = bands.count()
    print(f"{'bands materialize (n=' + str(nb) + ')':45s} {time.time() - t0:8.2f} s")

    cand = (
        bands.selectExpr("doc_id AS doc_a", "band_id", "band_key")
        .join(bands.selectExpr("doc_id AS doc_b", "band_id", "band_key"), ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    t(spark, "cand pairs", cand)

    a = base.selectExpr("doc_id AS doc_a", "h60 AS h_a")
    b = base.selectExpr("doc_id AS doc_b", "h60 AS h_b")
    n_inter = F.size(F.array_intersect("h_a", "h_b"))
    n_union = F.size("h_a") + F.size("h_b") - n_inter
    near = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .filter(n_inter * 5 >= n_union * 4)
        .select("doc_a", "doc_b")
    )
    t(spark, "near (jaccard refine)", near)
    exact = (
        base.selectExpr("doc_id AS doc_a", "th")
        .join(base.selectExpr("doc_id AS doc_b", "th"), "th")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    t(spark, "exact pairs", exact)

    t0 = time.time()
    pairs = near.localCheckpoint().unionByName(exact.localCheckpoint()).distinct()
    print(f"{'checkpoint both branches':45s} {time.time() - t0:8.2f} s")

    stats = {}
    t0 = time.time()
    cc = dd.connected_components(base.select("doc_id"), pairs, stats=stats)
    cc.write.format("noop").mode("overwrite").save()
    print(f"{'cc loop ' + str(stats):45s} {time.time() - t0:8.2f} s")

    spark.stop()


if __name__ == "__main__":
    main()
