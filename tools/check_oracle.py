"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle on the same parquet
tables, canonicalizes (sort columns by name, sort rows, round floats) and
compares row counts + values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from s3_access_logs_spark.plans.catalog import load_all  # noqa: E402
from s3_access_logs_spark.session import get_spark  # noqa: E402
from s3_access_logs_spark.sources.tables import TABLE_NAMES  # noqa: E402


def canon(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = load_all()
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_rowsonly = 0
    for name, q in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(q.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs == cd:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: spark {len(cs)} rows vs duck {len(cd)} rows")
            for a, b in list(zip(cs, cd))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            extra_s = [r for r in cs if r not in cd][:3]
            extra_d = [r for r in cd if r not in cs][:3]
            if extra_s:
                print(f"  only-spark: {extra_s}")
            if extra_d:
                print(f"  only-duck : {extra_d}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
