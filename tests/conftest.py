from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from vector_spark.session import get_spark

    s = get_spark("vector-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _evict_session_caches():
    """Clear the engine's session cache registry between test modules.

    The engine memoizes built plans and tracks operator-internal persists
    for warm re-serving; across a 343-test single session that
    accumulation once GC-wedged an 8 GiB driver. Module-boundary eviction
    keeps the suite honest about cold builds while still letting tests
    within a module share warm state. (The session-scoped table caches
    above are NOT registry-tracked and survive, as intended.)
    """
    yield
    from vector_spark import clear_caches

    clear_caches()


@pytest.fixture(scope="session")
def events(spark):
    from vector_spark.tables import load_table

    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="session")
def documents(spark):
    from vector_spark.tables import load_table

    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    from vector_spark.tables import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()
