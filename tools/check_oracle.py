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
    """Canonicalize like the driver: sort columns by name, sort rows, round
    floats to 6dp — and keep the int/float distinction. The driver pulls the
    oracle result through pandas, where DuckDB HUGEINT (un-cast SUM and every
    windowed SUM) becomes float64 and hash-mismatches Spark's int64; tagging
    the numeric kind here reproduces that instead of hiding it behind
    Python's ``5.0 == 5``."""
    import numpy as np

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return ("null",)
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("null",)  # pandas NaN == SQL NULL in the driver
            return ("f", round(v, 6))
        if hasattr(v, "isoformat"):
            return ("t", v.isoformat()[:26])
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
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
            # toPandas, mirroring the driver: a nullable int64 column with
            # nulls degrades to float64 on BOTH sides (so it still matches),
            # while an oracle-only HUGEINT degrades on one side (mismatch).
            spdf = sdf.toPandas()
            srows = [
                tuple(row)
                for row in spdf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            # fetchdf, not fetchall: the driver materializes the oracle via
            # pandas, which is where HUGEINT degrades to float64.
            odf = con.execute(q.oracle).fetchdf()
            dcols = list(odf.columns)
            drows = [
                tuple(row)
                for row in odf.itertuples(index=False, name=None)
            ]
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
