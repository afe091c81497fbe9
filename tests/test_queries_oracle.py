"""The full declared-query catalog vs the DuckDB oracle at sf0.001 — an
in-repo replica of the driver's correctness gate (fast smoke; the driver
runs sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

from s3_access_logs_spark.plans.catalog import load_all
from s3_access_logs_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    return sorted((tuple(norm(r[i]) for i in order) for r in rows), key=repr)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: runs and yields a stable schema
        assert sdf.columns
        return
    cur = duck.execute(q.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), "column names must match oracle"
    assert len(srows) == len(drows), "row count mismatch"
    assert canon(srows, sdf.columns) == canon(drows, dcols)
