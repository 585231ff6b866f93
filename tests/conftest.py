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


@pytest.fixture(scope="session")
def base_store_dir(spark, prepared, tmp_path_factory):
    """ONE physical store built per session with the common test
    parameters (n_buckets=8, salt_threshold=50) — VERDICT r4 #8
    test-wall cut. Read-only consumers open it directly; tests that
    MUTATE a store clone the directory first (clone_store: a copytree
    is ~100× cheaper than a rebuild)."""
    from search_engine_skillbox_spark.operators.index_store import (
        IndexStore)
    d = str(tmp_path_factory.mktemp("base_store") / "idx")
    st = IndexStore(d, n_buckets=8, salt_threshold=50)
    st.build(spark, prepared, build_id="base", checkpoint_groups=2)
    st.close()
    return d


def clone_store(base_dir: str, dst: str):
    """Private mutable copy of the session base store."""
    import shutil

    from search_engine_skillbox_spark.operators.index_store import (
        IndexStore)
    shutil.copytree(base_dir, dst)
    return IndexStore(dst)


@pytest.fixture()
def mk_store(base_store_dir, tmp_path):
    """Factory: named private clones of the base store (function
    scope — each test mutates its own copies)."""
    def make(name: str):
        return clone_store(base_store_dir, str(tmp_path / name))
    return make


@pytest.fixture(scope="module")
def module_store_clone(base_store_dir, tmp_path_factory):
    """One private clone per test MODULE — for modules whose tests
    share and mutate a single store."""
    return clone_store(base_store_dir,
                       str(tmp_path_factory.mktemp("mstore") / "idx"))
