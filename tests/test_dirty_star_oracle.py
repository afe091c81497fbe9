"""Dirty star-schema oracle sweep (round 7, sibling of the unicode and
dirty-events sweeps).

The driver's TPC-H-style tables carry no NULLs, so a cross-engine
divergence in NULL join-key / NULL-measure / NULL-date handling would
never hit the correctness gate. This sweep copies the sf0.001 star
schema and salts lineitem/orders/customer with NULL keys, measures,
dates and flags, then runs every star-schema catalog entry against its
DuckDB oracle.

It already earned its keep: ``kmv_distinct_estimate``'s oracle hashed
NULL ``l_partkey`` into a NULL unit-hash that its exact-count branch
counted as a value (kmv_build documents NULLs as not-a-value), and the
entry's parity split dropped NULL-``l_orderkey`` rows from BOTH halves
(NULL % 2 is NULL), so the merged sketch silently missed their
partkeys while the whole-table sketch kept them — merge-equals-whole,
the property the entry exists to prove, broke exactly on dirty data.
Round 8 salts a NEGATIVE ``l_orderkey`` too: Spark's ``%`` keeps the
dividend's sign, so an ``== 0`` / ``== 1`` parity split drops negative
keys from both halves — the same break by another route, closed by
making the second half the exact complement of the first.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import re
import shutil

import duckdb
import pytest

from s3_access_logs_spark.plans.catalog import load_all
from s3_access_logs_spark.sources.tables import TABLE_NAMES

_SRC = "/root/testdata/sf0.001"
_STAR = {
    "lineitem", "orders", "customer", "supplier", "part", "region",
    "nation",
}
_NON_STAR = {"events", "documents", "embeddings"}


def _canon(rows, colnames):
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
def dirty_star_sf(spark, tmp_path_factory):
    sf_dir = str(tmp_path_factory.mktemp("dirty_star_sf"))
    for t in TABLE_NAMES:
        s, d = f"{_SRC}/{t}.parquet", f"{sf_dir}/{t}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, d)
        else:
            os.makedirs(d)
            shutil.copy(s, f"{d}/part-0.parquet")

    def append(table, dicts):
        tgt = spark.read.parquet(f"{_SRC}/{table}.parquet")
        rows = [
            tuple(d.get(f.name) for f in tgt.schema.fields) for d in dicts
        ]
        spark.createDataFrame(rows, tgt.schema).write.mode(
            "append"
        ).parquet(f"{sf_dir}/{table}.parquet")

    TS = dt.datetime
    append("lineitem", [
        dict(l_orderkey=None, l_partkey=1, l_suppkey=1, l_linenumber=1,
             l_quantity=2.0, l_extendedprice=100.0, l_discount=0.05,
             l_tax=0.02, l_returnflag="N", l_linestatus="O",
             l_shipdate=TS(2024, 1, 5)),
        dict(l_orderkey=999901, l_partkey=None, l_suppkey=1,
             l_linenumber=2, l_quantity=3.0, l_extendedprice=200.0,
             l_discount=0.06, l_tax=0.03, l_returnflag="R",
             l_linestatus="F", l_shipdate=TS(2024, 2, 5)),
        dict(l_orderkey=999902, l_partkey=2, l_suppkey=None,
             l_linenumber=3, l_quantity=4.0, l_extendedprice=None,
             l_discount=0.07, l_tax=0.04, l_returnflag=None,
             l_linestatus="F", l_shipdate=None),
        dict(l_orderkey=999903, l_partkey=3, l_suppkey=2, l_linenumber=4,
             l_quantity=None, l_extendedprice=300.0, l_discount=None,
             l_tax=None, l_returnflag="A", l_linestatus=None,
             l_shipdate=TS(2024, 3, 5)),
        # NEGATIVE key (round 8): Spark's % keeps the dividend's sign
        # (-3 % 2 = -1), so a parity split written as `== 0` / `== 1`
        # drops this row from BOTH halves — the sign-route twin of the
        # NULL break above; kmv_distinct_estimate's complement split
        # must keep its (unique) partkey in the merged sketch
        dict(l_orderkey=-3, l_partkey=999999, l_suppkey=3, l_linenumber=5,
             l_quantity=1.0, l_extendedprice=50.0, l_discount=0.01,
             l_tax=0.01, l_returnflag="N", l_linestatus="O",
             l_shipdate=TS(2024, 4, 5)),
    ])
    append("orders", [
        dict(o_orderkey=None, o_custkey=5, o_orderstatus="O",
             o_totalprice=100.0, o_orderdate=TS(2024, 1, 2),
             o_orderpriority="1-URGENT"),
        dict(o_orderkey=999801, o_custkey=None, o_orderstatus="F",
             o_totalprice=None, o_orderdate=None, o_orderpriority=None),
    ])
    append("customer", [
        dict(c_custkey=None, c_name="NULLKEY CUST", c_nationkey=None,
             c_acctbal=1.0, c_mktsegment="BUILDING"),
        dict(c_custkey=999701, c_name=None, c_nationkey=None,
             c_acctbal=None, c_mktsegment=None),
    ])
    return sf_dir


def _star_entries():
    out = []
    for name, q in sorted(load_all().items()):
        if q.oracle is None or q.members:
            continue
        used = {t for t in TABLE_NAMES if re.search(rf"\b{t}\b", q.oracle)}
        if not (used & _STAR) or (used & _NON_STAR):
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", _star_entries())
def test_dirty_star_matches_oracle(spark, dirty_star_sf, name):
    q = load_all()[name]
    sdf = q.builder(spark, dirty_star_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{dirty_star_sf}/{t}.parquet/*.parquet')"
            )
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: row count"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), name
