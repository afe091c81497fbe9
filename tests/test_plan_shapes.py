"""Physical-plan shape assertions: the properties that make these plans
survive a 100x scale-up (broadcasts, pushdown, pruning, partial agg) are
pinned here so a refactor can't silently regress them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_access_logs_spark.plans.catalog import load_all
from s3_access_logs_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def catalog():
    return load_all()


def test_dim_joins_are_broadcast(spark, catalog):
    # q5: nation/region/supplier are dims -> must broadcast, never shuffle
    plan = plan_of(catalog["q5_region_revenue"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the big fact-fact side must NOT be broadcast at scale; orders-lineitem
    # stays a shuffle join under the size stats of real data, but with tiny
    # test files AQE may legally broadcast it — so only assert dims here.


def test_brute_force_topk_broadcasts_queries(spark, catalog):
    plan = plan_of(catalog["embedding_topk"].builder(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # untouched columns not read


def test_aggregation_is_partial_then_final(spark, catalog):
    # map-side partial agg: two HashAggregate levels around the exchange,
    # so the shuffle carries one row per group per task, not raw rows
    plan = plan_of(catalog["dedup_exact"].builder(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_topk_uses_take_ordered(spark, catalog):
    # orderBy().limit() must plan TakeOrderedAndProject: per-partition
    # heaps + single merge, never a global sort of the full input
    plan = plan_of(catalog["top_customers"].builder(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_parse_pipeline_is_whole_stage_codegen(spark):
    from s3_access_logs_spark.operators.parse import parse_logs

    lines = spark.createDataFrame([("x",)], ["value"])
    plan = plan_of(parse_logs(lines))
    # the whole tokenize->project->derive path fuses into codegen stages
    # (the "*(n)" prefix marks WholeStageCodegen spans); no BatchEvalPython
    # (row-at-a-time UDF) anywhere
    assert "*(" in plan
    assert "BatchEvalPython" not in plan


def test_no_python_udfs_in_relational_catalog(spark, catalog):
    # Python only appears where Arrow-batched by design (mapInPandas in the
    # multimodal operators); the relational/text/vector catalog stays JVM-side
    for name in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "revenue_rollup",
        "minhash_signatures",
        "ngram_jaccard_pairs",
        "embedding_ivf_topk",
        "token_stats_by_source",
    ):
        plan = plan_of(catalog[name].builder(spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name
