#!/usr/bin/env python
"""Round-6 stage isolation probe for the text/dedup family (guide §1.4):
times variants of the shingle->hash->fold pipeline through the noop sink.

Usage: python BENCH/probe_r6_text.py [sf_dir]
"""

import hashlib
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"


def t(spark, name, df):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    print(f"{name:55s} {w:8.2f} s")
    spark.sparkContext.setJobDescription(None)
    return w


def main():
    from pyspark.sql import functions as F

    from geoproc_spark import synth
    from geoproc_spark.functions import text as TX
    from geoproc_spark.operators import dedup as dd
    from geoproc_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe-r6", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).select(F.sum("id")).collect()

    docs = dd.spread(synth.docs_dup_df(spark, SF_DIR))

    # 0. baseline: just scan+split token arrays
    t(spark, "scan+split", docs.selectExpr("doc_id", "split(text, ' ') AS toks"))

    # 1. current shingle expr (inline split) -> md5 hash array, no fold
    sh_inline = TX.shingles_sql_spark("split(text, ' ')", 3)
    hashes_inline = (
        f"transform({sh_inline}, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )
    t(spark, "hash-array inline-split (current)", docs.selectExpr("doc_id", f"{hashes_inline} AS h"))

    # 2. split materialized as a column first, then shingles over named col
    sh_named = TX.shingles_sql_spark("toks", 3)
    hashes_named = (
        f"transform({sh_named}, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )
    t(
        spark,
        "hash-array named toks col",
        docs.selectExpr("doc_id", "split(text, ' ') AS toks").selectExpr(
            "doc_id", f"{hashes_named} AS h"
        ),
    )

    # 2b. named shingle array materialized, then hash transform in a second projection
    t(
        spark,
        "hash-array named toks+sh cols",
        docs.selectExpr("doc_id", "split(text, ' ') AS toks")
        .selectExpr("doc_id", f"{sh_named} AS sh")
        .selectExpr(
            "doc_id",
            "transform(sh, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)) AS h",
        ),
    )

    # 3. full current simhash
    t(spark, "simhash current", dd.simhash(docs))

    # 4. simhash fold over named-col hash array (fold unchanged)
    n_bits = 60
    counters = (
        f"aggregate(h, array_repeat(0L, {n_bits}), "
        f"(acc, x) -> zip_with(acc, sequence(0, {n_bits - 1}), "
        f"(c, i) -> c + CASE WHEN (x >> i) % 2 = 1 THEN 1L ELSE -1L END))"
    )
    pack = (
        f"aggregate(zip_with({counters}, sequence(0, {n_bits - 1}), "
        f"(c, i) -> CASE WHEN c > 0 THEN shiftleft(1L, i) ELSE 0L END), "
        f"0L, (a, y) -> a + y)"
    )
    base_named = (
        docs.selectExpr("doc_id", "split(text, ' ') AS toks")
        .selectExpr("doc_id", f"{sh_named} AS sh")
        .selectExpr(
            "doc_id",
            "transform(sh, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)) AS h",
        )
        .filter("size(h) > 0")
    )
    t(spark, "simhash named-col JVM fold", base_named.selectExpr("doc_id", f"{pack} AS simhash"))

    # 5. simhash via Arrow + numpy (md5 in Python, fold vectorized)
    @F.pandas_udf("long")
    def simhash_py(texts: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        bits = np.arange(n_bits, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = txt.split(" ")
            if len(toks) < 3:
                out[i] = 0
                continue
            seen = set()
            hs = []
            for j in range(len(toks) - 2):
                g = " ".join(toks[j : j + 3])
                if g in seen:
                    continue
                seen.add(g)
                hs.append(int(md5(g.encode()).hexdigest()[:15], 16))
            h = np.asarray(hs, dtype=np.uint64)
            b = ((h[:, None] >> bits[None, :]) & 1).astype(np.int64)
            c = 2 * b.sum(axis=0) - len(h)
            out[i] = int(((c > 0).astype(np.uint64) << bits).sum())
        return pd.Series(out)

    t(
        spark,
        "simhash arrow+numpy",
        docs.filter("size(split(text, ' ')) >= 3").select(
            "doc_id", simhash_py("text").alias("simhash")
        ),
    )

    # 6. doc_fingerprint current (window + distinct)
    from geoproc_spark import queries as Q

    t(spark, "doc_fingerprint current", Q.SPARK_QUERIES["doc_fingerprint"](spark, SF_DIR))

    # 7. doc_fingerprint as per-row HOF (no shuffle): window-4 minima + array_distinct
    synth.load_tables(spark, SF_DIR, ["documents"])
    d2 = spark.table("documents")
    sh_pos = TX.shingles_sql_spark("toks", 3, distinct=False)
    fp_expr = (
        "array_distinct(transform(sequence(1, size(h)), i -> array_min(slice(h, i, 4))))"
    )
    t(
        spark,
        "doc_fingerprint HOF slice-min",
        d2.selectExpr("doc_id", "split(text, ' ') AS toks")
        .selectExpr("doc_id", f"{sh_pos} AS sh")
        .selectExpr(
            "doc_id",
            f"transform(sh, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {synth.MINHASH_P}) AS h",
        )
        .selectExpr("doc_id", f"explode({fp_expr}) AS fp"),
    )

    # 8. minhash signatures current vs named-col
    perms = synth.minhash_perms()
    t(spark, "minhash sigs current", dd.minhash_signatures(docs, perms))

    spark.stop()


if __name__ == "__main__":
    main()
