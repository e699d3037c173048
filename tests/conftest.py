"""Shared fixtures: one session-scoped SparkSession + corpus fixtures."""

from __future__ import annotations

import pytest

from knowledgegraph_spark import get_spark
from knowledgegraph_spark.config import PAGES_SCHEMA
from knowledgegraph_spark.corpus import generate_corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "kg-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(120, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(**p) for p in corpus["pages"]], schema=PAGES_SCHEMA
    )
