"""Round-7 isolation bench (guide §1.4): times individual operators with
the noop sink so the computation is measured, not the sink or the count
short-circuit. NOT the driver metric — ``bench.py`` stays frozen; this
file exists so OPTIMIZATION_r07.md numbers are reproducible.

Usage:
  python bench_extra.py [query ...]      # default: the 10 bench queries
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS

Each query is timed best-of-N (default 3) with a warm run first, via
``df.write.format("noop")`` — except queries whose bench.py timing is a
``count()``; those are also reported with count() for comparability.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "3"))

BENCH_QS = ["tpch_q1", "top_orders_per_cust", "minhash_lsh",
            "broadcast_knn", "quality_scores", "language_id",
            "simhash_pairs", "events_hourly"]


def main() -> None:
    from ner_pytorch_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    qmap = entrymod.queries()
    names = sys.argv[1:] or BENCH_QS
    out: dict[str, dict] = {}
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"extra:{name}:warm")
        fn(spark, SF_DIR).count()  # warm (same methodology as bench.py)
        best_count = best_noop = 1e18
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"extra:{name}:count")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            best_count = min(best_count, time.time() - t0)
            spark.sparkContext.setJobDescription(f"extra:{name}:noop")
            t0 = time.time()
            (fn(spark, SF_DIR).write.format("noop")
             .mode("overwrite").save())
            best_noop = min(best_noop, time.time() - t0)
        out[name] = {"count": round(best_count, 3),
                     "noop": round(best_noop, 3)}
        print(f"{name}: count {best_count:.3f}s  noop {best_noop:.3f}s",
              flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
