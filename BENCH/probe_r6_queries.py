#!/usr/bin/env python
"""Per-query noop-sink timer (guide §1.4): times named registry queries at
a given sf dir. Usage: python BENCH/probe_r6_queries.py sf_dir q1 q2 ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1]
NAMES = sys.argv[2:]


def main():
    from pyspark.sql import functions as F

    from geoproc_spark import queries as Q
    from geoproc_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe-r6-q", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).select(F.sum("id")).collect()
    reg = {**Q.SPARK_QUERIES, **Q.EXTRA_SPARK_QUERIES}
    for name in NAMES:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"{name:40s} {time.time() - t0:8.2f} s")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
