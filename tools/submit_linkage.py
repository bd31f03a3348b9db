"""spark-submit entry point for the linkage pipeline (the north rule's
``spark-submit --py-files`` deployment shape).

Usage (cluster):
    spark-submit --py-files capelinker_spark.zip tools/submit_linkage.py \
        --pages s3://…/pages --truth s3://…/truth --workdir s3://…/run1

Usage (sandbox smoke, see tests/test_submit.py):
    /opt/spark/bin/spark-submit --master "local[4]" \
        --py-files /tmp/capelinker_spark.zip tools/submit_linkage.py \
        --pages /tmp/pages --truth /tmp/truth --workdir /tmp/wd

The package is imported ONLY from ``--py-files`` — this script works from
any cwd with no repo checkout on the executors. Prints one JSON line with
the run summary (pairs scored, links, entities) on success; stage-level
progress/lineage lands in ``<workdir>`` as usual (resumable: rerunning with
--resume picks up after the last complete stage).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet/table path")
    ap.add_argument("--truth", default=None, help="truth parquet (training labels)")
    ap.add_argument("--workdir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--panel", action="store_true", help="multi-wave panel run")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--salt", default="8")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("capelinker-linkage").getOrCreate()

    from capelinker_spark.pipeline import LinkagePipeline, PipelineConfig
    from capelinker_spark.sources import read_table
    from capelinker_spark.util import ensure_workers_importable

    ensure_workers_importable(spark)
    pages = read_table(spark, args.pages)
    truth = read_table(spark, args.truth) if args.truth else None
    salt = "auto" if args.salt == "auto" else int(args.salt)

    t0 = time.time()
    pipe = LinkagePipeline(spark, args.workdir, PipelineConfig(salt=salt))
    if args.panel:
        res = pipe.run_panel(pages, truth, resume=args.resume)
        summary = {
            "mode": "panel",
            "links": res["links"].count(),
            "entities": res["clusters"].select("entity_id").distinct().count(),
        }
    else:
        res = pipe.run(pages, truth, resume=args.resume)
        summary = {
            "mode": "single",
            "pairs_scored": res["features"].count(),
            "links": res["links"].count(),
            "entities": res["clusters"].select("entity_id").distinct().count(),
        }
    summary["seconds"] = round(time.time() - t0, 3)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
