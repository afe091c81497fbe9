"""SQL entry surface (plans/sql_surface.py, VERDICT r6 item 8): one call
registers the warehouse as views, after which arbitrary ``spark.sql``
replaces the reference's Athena layer. Pins: registration is complete,
the two sql-surface catalog entries run, and re-expressing existing
DataFrame catalog queries as pure SQL over the views returns
row-identical results (same Catalyst plans, so same answers)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")


def _sorted_rows(df):
    return sorted([tuple(r) for r in df.collect()])


class TestSqlCatalog:
    def test_registers_all_views(self, spark):
        from s3_access_logs_spark.plans.sql_surface import (
            SQL_VIEW_NAMES,
            sql_catalog,
        )

        names = sql_catalog(spark, SF_SMOKE)
        assert names == SQL_VIEW_NAMES
        listed = {t.name for t in spark.catalog.listTables()}
        assert set(SQL_VIEW_NAMES) <= listed
        # every view is queryable
        for n in names:
            assert spark.sql(f"SELECT * FROM {n} LIMIT 1").count() >= 0

    def test_logs_view_has_parse_schema(self, spark):
        from s3_access_logs_spark.plans.sql_surface import sql_catalog

        sql_catalog(spark, SF_SMOKE)
        cols = set(spark.table("logs").columns)
        # the parse pipeline's derived columns, not raw lines
        assert {
            "bucket_name",
            "operation",
            "remoteip_int",
            "is_user",
            "ts",
            "hour",
        } <= cols

    def test_include_logs_false_skips_parse(self, spark):
        from s3_access_logs_spark.plans.sql_surface import sql_catalog
        from s3_access_logs_spark.sources.tables import TABLE_NAMES

        spark.catalog.dropTempView("logs")
        assert sql_catalog(spark, SF_SMOKE, include_logs=False) == TABLE_NAMES
        assert not any(
            t.name == "logs" for t in spark.catalog.listTables()
        )


class TestSqlReexpression:
    """3 catalog queries re-expressed as pure SQL over sql_catalog views
    must match their DataFrame builders row-for-row (VERDICT r6 item 8:
    'smoke-test 3-4 catalog queries re-expressed as pure SQL')."""

    def _check(self, spark, name: str, sql: str):
        from s3_access_logs_spark.plans.catalog import load_all
        from s3_access_logs_spark.plans.sql_surface import sql_catalog

        sql_catalog(spark, SF_SMOKE)
        want = _sorted_rows(load_all()[name].builder(spark, SF_SMOKE))
        got = _sorted_rows(spark.sql(sql))
        assert got == want

    def test_q1_pricing_summary_as_sql(self, spark):
        self._check(
            spark,
            "q1_pricing_summary",
            """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            """,
        )

    def test_q5_region_revenue_as_sql(self, spark):
        self._check(
            spark,
            "q5_region_revenue",
            """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n_name
            """,
        )

    def test_logs_hourly_agg_as_sql(self, spark):
        self._check(
            spark,
            "logs_hourly_agg",
            """
            SELECT bucket_name, operation, hour,
                   COUNT(*) AS n_requests,
                   SUM(bytessent) AS total_bytes,
                   ROUND(AVG(totaltime), 4) AS avg_totaltime
            FROM logs
            GROUP BY bucket_name, operation, hour
            """,
        )


class TestSqlSurfaceEntries:
    def test_sql_tpch_q6_portable_string_runs_on_spark(self, spark):
        from s3_access_logs_spark.plans.catalog import load_all

        q = load_all()["sql_tpch_q6"]
        rows = q.builder(spark, SF_SMOKE).collect()
        assert rows, "Q6 filter matched nothing at sf0.001"
        # the oracle IS the Spark SQL — the portability contract
        from s3_access_logs_spark.plans.sql_surface import (
            TPCH_Q6_PORTABLE_SQL,
        )

        assert q.oracle == TPCH_Q6_PORTABLE_SQL
        years = {r["ship_year"] for r in rows}
        assert all(1995 <= y <= 2001 for y in years)
        assert all(r["n_items"] > 0 for r in rows)

    def test_sql_logs_report_runs_and_filters(self, spark):
        from s3_access_logs_spark.plans.catalog import load_all

        rows = load_all()["sql_logs_report"].builder(spark, SF_SMOKE).collect()
        assert rows
        assert all(r["n_requests"] >= r["n_ips"] > 0 for r in rows)

    def test_round8_entries_are_portable_strings(self, spark):
        """The four round-8 entries keep the sql_tpch_q6 discipline: the
        oracle IS the Spark SQL, byte for byte."""
        from s3_access_logs_spark.plans import sql_surface as S
        from s3_access_logs_spark.plans.catalog import load_all

        allq = load_all()
        for name, const in [
            ("sql_window_top_orders", S.SQL_WINDOW_TOP_ORDERS),
            ("sql_rollup_linestatus", S.SQL_ROLLUP_LINESTATUS),
            ("sql_semi_anti_segments", S.SQL_SEMI_ANTI_SEGMENTS),
            ("sql_corpus_report", S.SQL_CORPUS_REPORT),
        ]:
            assert allq[name].oracle == const, name

    def test_sql_semi_anti_compiles_to_semi_and_anti_joins(self, spark):
        """EXISTS/NOT EXISTS through the SQL surface must land on the
        same physical join shapes the DataFrame catalog pins."""
        from s3_access_logs_spark.plans.catalog import load_all

        df = load_all()["sql_semi_anti_segments"].builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "LeftAnti" in plan
        df.collect()

    def test_sql_window_single_exchange(self, spark):
        """Rank and running total share one PARTITION BY/ORDER BY, so the
        plan must carry ONE shuffle and one Window node evaluating both
        functions — not a shuffle per function."""
        from s3_access_logs_spark.plans.catalog import load_all

        df = load_all()["sql_window_top_orders"].builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        rows = df.collect()
        assert rows and max(r["rnk"] for r in rows) <= 3
