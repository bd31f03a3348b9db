"""spark-submit entry point for the corpus-curation pipeline — the same
``spark-submit --py-files`` deployment shape as ``submit_linkage.py``, for
the training-data half of the engine.

Usage (cluster):
    spark-submit --py-files capelinker_spark.zip tools/submit_curation.py \
        --docs s3://…/documents --workdir s3://…/curation_run1 \
        --min-tokens 50 --token-unit bpe --line-filter \
        --domain-policies '{"example.com": {"min_quality_prob": 0.9}}' \
        --url-col url

Usage (sandbox smoke, see tests/test_submit.py):
    /opt/spark/bin/spark-submit --master "local[4]" \
        --py-files /tmp/capelinker_spark.zip tools/submit_curation.py \
        --docs /tmp/docs --workdir /tmp/wd

The package is imported ONLY from ``--py-files`` — works from any cwd
with no repo checkout on the executors. Prints one JSON line with the
run summary; per-stage checkpoints/manifests/lineage land in
``<workdir>`` (resumable: rerunning with --resume reuses every stage
whose chained config hash still matches).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet/table")
    ap.add_argument("--workdir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--min-alpha-ratio", type=float, default=0.5)
    ap.add_argument("--min-quality-prob", type=float, default=0.0)
    ap.add_argument("--tokens-per-seq", type=int, default=256)
    ap.add_argument("--token-unit", choices=("ws", "bpe"), default="ws")
    ap.add_argument("--line-filter", action="store_true")
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--lang-rates", default=None,
                    help='JSON, e.g. \'{"en": 1.0, "de": 0.5}\'')
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--domain-policies", default=None,
                    help='JSON {domain: {"min_quality_prob": q, "rate": r}}')
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("capelinker-curation").getOrCreate()

    from capelinker_spark.curation import CurationConfig, CurationPipeline
    from capelinker_spark.sources import read_table
    from capelinker_spark.util import ensure_workers_importable

    ensure_workers_importable(spark)
    docs = read_table(spark, args.docs)
    cfg = CurationConfig(
        min_tokens=args.min_tokens,
        min_alpha_ratio=args.min_alpha_ratio,
        min_quality_prob=args.min_quality_prob,
        tokens_per_seq=args.tokens_per_seq,
        token_unit=args.token_unit,
        use_line_filter=args.line_filter,
        temperature=args.temperature,
        lang_rates=json.loads(args.lang_rates) if args.lang_rates else None,
        url_col=args.url_col,
        domain_policies=(
            json.loads(args.domain_policies) if args.domain_policies else None
        ),
    )
    t0 = time.time()
    res = CurationPipeline(spark, args.workdir, cfg).run(
        docs, resume=args.resume
    )
    summary = {
        "docs_in": docs.count(),
        "deduped": res["deduped"].count(),
        "kept": res["mixed"].count(),
        "sequences": res["packed"].select("seq_id").distinct().count(),
        "seconds": round(time.time() - t0, 3),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
