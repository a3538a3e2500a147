"""Every registry oracle must BIND in DuckDB against the real table
schemas — a seconds-fast guard that catches SQL syntax/binder errors
(reserved words, HUGEINT/range() mismatches, missing casts) without
running Spark or executing the query. The value gate
(scripts/check_oracle.py) still runs everything; this is the cheap
front line that fails in CI the moment an oracle string regresses."""
from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    from vector_spark.tables import TABLE_NAMES

    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_binds(con):
    from vector_spark.plans.queries import QUERIES

    failures = []
    n = 0
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        n += 1
        try:
            con.sql("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001 - collect all, report once
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
    assert n >= 125  # every registry entry has an oracle as of round 7


def test_no_rows_only_entries_remain(con):
    """Round 7 retired the no-oracle category; a new None oracle needs an
    explicit justification here before it ships."""
    from vector_spark.plans.queries import QUERIES

    missing = [n for n, s in QUERIES.items() if s.oracle is None]
    assert missing == []
