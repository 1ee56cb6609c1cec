"""Per-query time breakdown: plan-construction vs execution vs re-run.

Usage: python tools/profile_query.py QUERY [QUERY ...]

For each query prints:
  build_s   time for fn(spark, sf_dir) to return (includes any eager
            driver-side iteration the operator does while constructing)
  noop_s    time for a noop-sink write of the returned DataFrame
            (computes every column of every row, guide §1.4)
  count_s   time for .count() on a FRESH build (the bench's action)
  count2_s  time for a second .count() on the same DataFrame (warm)

$SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as ent
    from speech_data_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = ent.queries()
    names = sys.argv[1:] or list(qs)
    print(f"{'query':40s} {'build':>7s} {'noop':>7s} {'count':>7s} {'count2':>7s}")
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: build+noop")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: count")
        df2 = fn(spark, sf_dir)
        t3 = time.time()
        df2.count()
        t4 = time.time()
        df2.count()
        t5 = time.time()
        print(
            f"{name:40s} {t1 - t0:7.2f} {t2 - t1:7.2f} {t4 - t3:7.2f}"
            f" {t5 - t4:7.2f}",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
