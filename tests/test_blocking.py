"""Meta-blocking (blocking.metablock_candidates): hand-computed purge /
filter / weight / prune pipeline, both weighting schemes, config guards."""

import pytest
from pyspark.sql import functions as F

from capelinker_spark.operators.blocking import metablock_candidates


def test_metablock_candidates(spark):
    """Papadakis meta-blocking: mega-block purged, singleton dropped,
    per-record top-2 smallest blocks kept, CBS weighting, WEP prune at
    the global mean; JS weighting hand-checked; zero Python."""
    records = spark.createDataFrame(
        [
            (1, ["k1", "k2", "mega"]),
            (2, ["k1", "k2", "mega"]),
            (3, ["k2", "k3", "mega"]),
            (4, ["k3", "mega"]),
            (5, ["solo"]),
        ],
        "id long, keys array<string>",
    )
    kw = dict(keys=F.col("keys"), max_block_size=3, top_r_blocks=2)

    # CBS no prune: (1,2)=2 via k1+k2, (1,3)=(2,3)=1 via k2, (3,4)=1 via k3
    allp = {
        (r["id_from"], r["id_to"]): r["weight"]
        for r in metablock_candidates(records, prune="none", **kw).collect()
    }
    assert allp == {(1, 2): 2.0, (1, 3): 1.0, (2, 3): 1.0, (3, 4): 1.0}

    # WEP: mean = 5/4 -> only (1,2) survives
    wep = metablock_candidates(records, **kw)
    assert [(r["id_from"], r["id_to"]) for r in wep.collect()] == [(1, 2)]
    plan = wep._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

    # JS: |blocks| after filtering = {1:2, 2:2, 3:2, 4:1}
    js = {
        (r["id_from"], r["id_to"]): r["weight"]
        for r in metablock_candidates(
            records, weight="js", prune="none", **kw
        ).collect()
    }
    assert js[(1, 2)] == 1.0
    assert js[(1, 3)] == pytest.approx(1 / 3, abs=1e-6)
    assert js[(3, 4)] == 0.5

    with pytest.raises(ValueError, match="unknown weight"):
        metablock_candidates(records, weight="ecbs", **kw)
    with pytest.raises(ValueError, match="unknown prune"):
        metablock_candidates(records, prune="cep", **kw)
