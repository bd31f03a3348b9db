"""Optimization-round isolation harness (guide §1.4): times individual
declared queries with BOTH the bench methodology (``.count()``) and the
noop sink (computes every column, isolates computation from the sink),
and captures ``.explain("formatted")`` plans to ``plans/<tag>/``.

bench.py is FROZEN for driver measurement; this file holds the extra
instrumentation the optimization round needs. Usage:

  python bench_extra.py time  <query> [...]      # N samples, noop + count
  python bench_extra.py plan  <tag> <query> [..] # plans/<tag>/<query>_<suffix>.txt
  python bench_extra.py linkage                  # per-stage linkage timing

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32) — same contract as bench.py; BENCH_EXTRA_REPEATS (default 2),
BENCH_EXTRA_SUFFIX (plan file suffix, default "before").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SF_DIR, make_session, read_steal, stop_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))


def _queries():
    from capelinker_spark.entry_queries import QUERIES

    return QUERIES


def time_queries(names: list[str]) -> None:
    spark = make_session(CPUS)
    qs = _queries()
    out = {}
    try:
        for name in names:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            qs[name](spark, SF_DIR).count()  # warm: JIT, file listing
            samples = []
            for i in range(REPEATS):
                spark.sparkContext.setJobDescription(f"noop:{name}:{i}")
                s0, t0 = read_steal(), time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_s = time.time() - t0
                spark.sparkContext.setJobDescription(f"count:{name}:{i}")
                t1 = time.time()
                qs[name](spark, SF_DIR).count()
                cnt_s = time.time() - t1
                samples.append(
                    {
                        "noop": round(noop_s, 3),
                        "count": round(cnt_s, 3),
                        "steal": read_steal() - s0,
                    }
                )
            out[name] = samples
            print(f"EXTRA {name} {json.dumps(samples)}", flush=True)
    finally:
        stop_spark(spark)
    print("EXTRA_SUMMARY " + json.dumps(out))


def write_plans(tag: str, names: list[str]) -> None:
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = make_session(CPUS)
    qs = _queries()
    try:
        import contextlib
        import io

        for name in names:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", flush=True)
    finally:
        stop_spark(spark)


def time_linkage() -> None:
    """Per-stage wall decomposition of the headline pipeline (resume=False,
    same entry shape as bench.run_linkage) using the lineage log each stage
    writes, plus total wall."""
    from bench import N_ENTITIES, write_corpus

    data_dir = tempfile.mkdtemp(prefix="capelinker_extra_data_")
    workdir = tempfile.mkdtemp(prefix="capelinker_extra_wd_")
    try:
        write_corpus(N_ENTITIES, data_dir)
        spark = make_session(CPUS)
        from capelinker_spark.pipeline import LinkagePipeline, PipelineConfig

        pages = spark.read.parquet(f"{data_dir}/pages")
        truth = spark.read.parquet(f"{data_dir}/truth")
        s0, t0 = read_steal(), time.time()
        pipe = LinkagePipeline(spark, workdir, PipelineConfig(salt=8))
        res = pipe.run(pages, truth, resume=False)
        n_pairs = res["features"].count()
        n_links = res["links"].count()
        dt = time.time() - t0
        stages = {
            r["stage"]: round(r.get("elapsed_sec", 0.0), 3)
            for r in pipe.lineage.entries()
        }
        print(
            "LINKAGE "
            + json.dumps(
                {
                    "total": round(dt, 3),
                    "steal": read_steal() - s0,
                    "pairs": n_pairs,
                    "links": n_links,
                    "stages": stages,
                }
            )
        )
        stop_spark(spark)
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "time":
        time_queries(sys.argv[2:])
    elif cmd == "plan":
        write_plans(sys.argv[2], sys.argv[3:])
    elif cmd == "linkage":
        time_linkage()
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
