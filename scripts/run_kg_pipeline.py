"""spark-submit entry point for the KG construction pipeline.

Cluster usage (the north-rule launch shape):

    bash scripts/package.sh     # builds dist/ner_pytorch_spark.zip
    spark-submit \
        --py-files dist/ner_pytorch_spark.zip \
        scripts/run_kg_pipeline.py \
        --pages <parquet-or-iceberg-path> \
        --catalog /data/kg_catalog --resume

Sandbox smoke: omit --pages and pass --synthesize N to generate the
seeded corpus on the executors.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# standalone invocation (no spark-submit --py-files on sys.path): the
# package lives one directory up from this script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet path of the pages table")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--catalog", required=True, help="snapshot catalog root")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose snapshot already exists")
    ap.add_argument("--salt", type=int, default=64)
    ap.add_argument("--cooccurrence-window", type=int, default=None)
    args = ap.parse_args(argv)

    # inside spark-submit a session already exists; standalone we build one
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from ner_pytorch_spark.session import get_spark

        spark = get_spark(app_name="kg_pipeline")

    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.plans.kg_pipeline import KGPipeline

    if args.synthesize:
        pages = datagen.pages_dataframe(spark, args.synthesize, distributed=True)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("need --pages or --synthesize")

    pipe = KGPipeline(
        spark, args.catalog, datagen.alias_rows(),
        salt=args.salt, cooccurrence_window=args.cooccurrence_window)
    out = pipe.run(pages, resume=args.resume)
    summary = {name: df.count() for name, df in out.items()}
    stage_of = {"nodes": "entity_nodes"}  # run() key → catalog table name
    print(json.dumps({"tables": summary,
                      "catalog": args.catalog,
                      "snapshots": {t: pipe.catalog.latest_snapshot(stage_of.get(t, t))
                                    for t in summary}}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
