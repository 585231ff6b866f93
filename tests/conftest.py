from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from search_engine_skillbox_spark.sources import corpus as C  # noqa: E402

N_TINY = 200
SEED = 42


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("engine-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def pages_rows():
    return C.pages_local(N_TINY, SEED)


@pytest.fixture(scope="session")
def pages_sdf(spark):
    return C.pages_df(spark, N_TINY, SEED, partitions=4)


@pytest.fixture(scope="session")
def oracle(pages_rows):
    from tests.oracle import OracleIndex
    return OracleIndex(pages_rows)


@pytest.fixture(scope="session")
def prepared(spark, pages_sdf):
    from search_engine_skillbox_spark.sources.pages import prepare_pages
    df = prepare_pages(pages_sdf).persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def index_frames(prepared):
    from search_engine_skillbox_spark.operators import build as B
    p, t, d = B.build_index_frames(prepared)
    p = p.persist()
    p.count()
    return p, t, d
