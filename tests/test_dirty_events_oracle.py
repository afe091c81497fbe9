"""Dirty-events oracle sweep (round 7, sibling of the unicode sweep).

The driver's ``events`` table carries no NULLs and only valid JSON, so a
cross-engine divergence in NULL or malformed-input handling would never
hit the correctness gate. This sweep runs every events-only catalog
entry on a fixture salted with NULL id/ts/user/type/value rows plus
NULL, malformed and key-missing ``props`` — against its DuckDB oracle.

It already earned its keep (all fixed in lockstep with documented
contracts):

* the log-line synthesis produced token-dropping short lines for NULL
  fields while the oracles NULL-propagated — synthesis is now defined
  for well-formed events only, with the shared
  ``SQL_EVENTS_WELL_FORMED`` fragment in every consumer oracle;
* ``sessionize_events`` / ``running_distinct_users`` ordered NULL
  timestamps engine-specifically inside their windows (Spark NULLS
  FIRST, DuckDB NULLS LAST) — NULL user/ts are now out of contract on
  both sides;
* the JSON oracles ERRORED on malformed props where Spark's
  ``get_json_object`` / ``from_json`` degrade to NULL — now guarded
  with ``json_valid``.
"""

from __future__ import annotations

import datetime as dt
import math
import re

import duckdb
import pytest

from s3_access_logs_spark.plans.catalog import load_all

_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem documents "
    "embeddings"
).split()


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
def dirty_events_sf(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    types = ["click", "view", "error", "purchase"]
    rows = [
        (
            i,
            base + dt.timedelta(minutes=3 * i, seconds=i % 47),
            i % 25,
            types[i % 4],
            round(0.5 + i * 0.37, 2),
            '{"k": %d}' % (i % 90),
        )
        for i in range(400)
    ]
    rows += [
        (1000, None, 3, "click", 1.0, '{"k": 5}'),     # NULL ts
        (1001, base, None, "view", 2.0, '{"k": 6}'),   # NULL user
        (1002, base, 4, None, 3.0, '{"k": 7}'),        # NULL type
        (1003, base, 5, "error", None, '{"k": 8}'),    # NULL value
        (1004, base, 6, "click", 4.0, None),           # NULL props
        (1005, base, 7, "view", 5.0, "not-json"),      # malformed props
        (1006, base, 8, "purchase", 6.0, '{"other": 1}'),  # key missing
        # round 8: ID salting (the dirty-docs/embeddings lesson) — a
        # NULL event_id is excluded from log synthesis by
        # SQL_EVENTS_WELL_FORMED but must flow through every other
        # events entry; NEGATIVE ids caught two sign-kept-% bugs: the
        # synthesized IP octets parsed to NULL remoteip_int while the
        # oracles' arithmetic stayed numeric (now pmod on both sides),
        # and the z-interleave sign-extended engine-specifically (the
        # z-order coordinates are now pmod'd — unsigned space)
        (None, base + dt.timedelta(minutes=1), 9, "click", 7.0,
         '{"k": 9}'),
        (-5, base + dt.timedelta(minutes=2), -3, "view", 8.0,
         '{"k": 4}'),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path_factory.mktemp("dirty_events_sf"))
    events.write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _events_only_entries():
    out = []
    for name, q in sorted(load_all().items()):
        if q.oracle is None or q.members:
            continue
        if "events" not in q.oracle:
            continue
        if any(re.search(rf"\b{t}\b", q.oracle) for t in _OTHER_TABLES):
            continue
        if name == "sql_logs_report":
            # builder registers the full warehouse (sql_catalog); the
            # synthesis contract it rides is covered by log_line_parse
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", _events_only_entries())
def test_dirty_events_matches_oracle(spark, dirty_events_sf, name):
    q = load_all()[name]
    sdf = q.builder(spark, dirty_events_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{dirty_events_sf}/events.parquet/*.parquet')"
        )
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: row count"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), name
