from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("capelinker-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from capelinker_spark.fixtures import make_corpus

    return make_corpus(n_entities=300, seed=42)


@pytest.fixture(scope="session")
def pages(spark, corpus):
    from capelinker_spark.fixtures import pages_df

    return pages_df(spark, corpus["pages"]).cache()


@pytest.fixture(scope="session")
def truth(spark, corpus):
    from capelinker_spark.fixtures import truth_df

    return truth_df(spark, corpus["truth"]).cache()
