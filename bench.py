"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pairs_scored": N, "pairs_per_sec": X,
   "scaling": {"cores_lo": 8, "cores_hi": 32, "throughput_lo": ..,
               "throughput_hi": .., "efficiency": ..}}

The scaling block is the sandbox evidence for the north rule's N→4N-executor
criterion: the SAME linkage job (identical parquet input, written once by the
parent) runs at local[8] and local[32] in fresh JVM subprocesses; efficiency
= (thr_hi/thr_lo) / (cores_hi/cores_lo) on candidate-pairs-scored/sec.

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling subprocesses.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
# fixture corpus size scales with sf: sf0.1 → 10k entities ≈ 17k pages
N_ENTITIES = max(300, int(100_000 * SF))
N_ENTITIES_SCALING = max(300, N_ENTITIES // 3)


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"capelinker-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )


def write_corpus(n_entities: int, data_dir: str) -> None:
    """Generate the synthetic corpus ONCE and persist it, so every timed run
    (and both scaling runs) reads identical parquet input."""
    from capelinker_spark.fixtures import make_corpus, pages_df, truth_df

    spark = make_session(4)
    corpus = make_corpus(n_entities=n_entities, seed=42)
    pages_df(spark, corpus["pages"]).repartition(64).write.mode("overwrite").parquet(
        f"{data_dir}/pages"
    )
    truth_df(spark, corpus["truth"]).repartition(8).write.mode("overwrite").parquet(
        f"{data_dir}/truth"
    )
    spark.stop()


def run_linkage(spark, data_dir: str) -> dict:
    """The headline job: full linkage pipeline on the persisted page corpus.
    Returns {'seconds', 'pairs_scored', 'pairs_per_sec', 'links'}."""
    from capelinker_spark.pipeline import LinkagePipeline, PipelineConfig

    pages = spark.read.parquet(f"{data_dir}/pages")
    truth = spark.read.parquet(f"{data_dir}/truth")
    workdir = tempfile.mkdtemp(prefix="capelinker_bench_wd_")
    try:
        t0 = time.time()
        pipe = LinkagePipeline(spark, workdir, PipelineConfig(salt=8))
        res = pipe.run(pages, truth, resume=False)
        n_pairs = res["features"].count()
        n_links = res["links"].count()
        dt = time.time() - t0
        return {
            "seconds": dt,
            "pairs_scored": n_pairs,
            "pairs_per_sec": n_pairs / dt,
            "links": n_links,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


HEADLINE_QUERIES = [
    "q1_flagship_agg",
    "j5_soundex_blocking_join",
    "j1_jw_similarity_join",
    "m2_dual_rank_select",
    "dd1_exact_dedup",
    "dd3_minhash_lsh_neardup",
    "dd4_simhash",
    "ts1_lang_id",
    "ts2_token_counts",
    "ann1_brute_force_topk",
    "c1_connected_components",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from capelinker_spark.entry_queries import QUERIES

    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--single":
        # scaling subprocess: run ONLY the linkage job on the given corpus
        cores, data_dir = int(sys.argv[2]), sys.argv[3]
        spark = make_session(cores)
        try:
            print(json.dumps(run_linkage(spark, data_dir)))
        finally:
            spark.stop()
        return

    data_dir = tempfile.mkdtemp(prefix="capelinker_bench_data_")
    try:
        write_corpus(N_ENTITIES, data_dir)
        spark = make_session(CPUS)
        t_total0 = time.time()
        link = run_linkage(spark, data_dir)
        qtimes = run_queries(spark, SF_DIR)
        spark.stop()

        result = {
            "metric": "linkage+headline suite wall time",
            "value": round(time.time() - t_total0, 3),
            "unit": "sec",
            "sf": SF,
            "queries": {"linkage_pipeline": round(link["seconds"], 3), **qtimes},
            "pairs_scored": link["pairs_scored"],
            "pairs_per_sec": round(link["pairs_per_sec"], 1),
            "links": link["links"],
            "cpus": CPUS,
        }

        if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
            sdir = os.path.join(data_dir, "scaling")
            write_corpus(N_ENTITIES_SCALING, sdir)
            lo, hi = 8, 32
            scaling = {"corpus_entities": N_ENTITIES_SCALING}
            for cores, key in ((lo, "lo"), (hi, "hi")):
                proc = subprocess.run(
                    [
                        sys.executable, os.path.abspath(__file__),
                        "--single", str(cores), sdir,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=1800,
                    env={**os.environ, "SPARK_GRAFT_BENCH_SCALING": "0"},
                )
                line = proc.stdout.strip().splitlines()[-1]
                r = json.loads(line)
                scaling[f"cores_{key}"] = cores
                scaling[f"seconds_{key}"] = round(r["seconds"], 3)
                scaling[f"throughput_{key}"] = round(r["pairs_per_sec"], 1)
            scaling["efficiency"] = round(
                (scaling["throughput_hi"] / scaling["throughput_lo"])
                / (scaling["cores_hi"] / scaling["cores_lo"]),
                4,
            )
            result["scaling"] = scaling

        print(json.dumps(result))
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
