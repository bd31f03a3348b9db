"""North-rule deployment shape: the pipeline runs via REAL spark-submit
--py-files from a neutral cwd — the package resolves from the shipped zip
(including the C kernel source), not from a repo checkout."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles(spark, tmp_path):
    from capelinker_spark.fixtures import make_corpus, pages_df, truth_df
    from capelinker_spark.util import build_pyfiles_zip

    corpus = make_corpus(n_entities=120, seed=7)
    pages_df(spark, corpus["pages"]).write.parquet(str(tmp_path / "pages"))
    truth_df(spark, corpus["truth"]).write.parquet(str(tmp_path / "truth"))

    zpath = str(tmp_path / "capelinker_spark.zip")
    build_pyfiles_zip(zpath)
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
    assert "capelinker_spark/functions/_strdistc.c" in names  # C kernel ships

    script = str(tmp_path / "submit_linkage.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_linkage.py"), script)
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("PYTHONPATH")
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            "--pages", str(tmp_path / "pages"),
            "--truth", str(tmp_path / "truth"),
            "--workdir", str(tmp_path / "wd"),
            "--salt", "auto",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),  # neutral cwd: no repo on sys.path
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["mode"] == "single"
    assert summary["links"] > 50
    assert summary["entities"] > 0
    assert os.path.isdir(tmp_path / "wd" / "clusters")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_curation(spark, tmp_path):
    """The curation pipeline ships the same way: real spark-submit
    --py-files from a neutral cwd, per-domain policies passed as JSON
    config, stage checkpoints + lineage landing in the workdir."""
    from capelinker_spark.util import build_pyfiles_zip

    good = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (i, f"{good} variant {i} end.", "en",
         f"https://{['good.org', 'bad.net'][i % 2]}/p/{i}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string"
    ).write.parquet(str(tmp_path / "docs"))

    zpath = str(tmp_path / "capelinker_spark.zip")
    build_pyfiles_zip(zpath)
    script = str(tmp_path / "submit_curation.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_curation.py"), script)
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("PYTHONPATH")
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            "--docs", str(tmp_path / "docs"),
            "--workdir", str(tmp_path / "wd"),
            "--min-tokens", "1", "--min-alpha-ratio", "0.1",
            "--url-col", "url",
            "--domain-policies",
            '{"bad.net": {"min_quality_prob": 1.1}}',
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["docs_in"] == 40
    assert summary["kept"] == 20          # bad.net's threshold 1.1 drops all
    assert summary["sequences"] >= 1
    assert os.path.exists(str(tmp_path / "wd" / "_lineage.jsonl"))
