#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

Usage: python BENCH/dump_plans.py OUT_DIR SUFFIX name1 name2 ...
Writes OUT_DIR/<name>_<SUFFIX>.txt. Runs from whatever repo root is on
sys.path[0] — invoke with cwd set to the tree whose plans you want.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

OUT_DIR, SUFFIX = sys.argv[1], sys.argv[2]
NAMES = sys.argv[3:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import functions as F

    from geoproc_spark import queries as Q
    from geoproc_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    spark.range(10).select(F.sum("id")).collect()
    os.makedirs(OUT_DIR, exist_ok=True)
    reg = {**Q.SPARK_QUERIES, **Q.EXTRA_SPARK_QUERIES}
    for name in NAMES:
        try:
            df = reg[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name:30s} -> {path}  (Exchange x{n_ex})")
    spark.stop()


if __name__ == "__main__":
    main()
