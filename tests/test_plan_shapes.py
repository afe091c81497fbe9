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


def test_brute_force_topk_window_input_is_bounded(spark, catalog):
    """The per-query ranking window must consume the per-partition JVM
    top-k pre-reduce (~partitions x k x queries rows), never the raw
    |corpus| x |queries| score stream — and the whole path must stay
    JVM-side (VERDICT r5 item 8: the Arrow stage was the one Python hop
    in an otherwise codegen'd vector path)."""
    plan = plan_of(catalog["embedding_topk"].builder(spark, SF))
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    # plan prints top-down: the pre-reduce aggregate sits BELOW the window
    # (later in the string), so the window's exchange carries reduced rows
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.rindex("HashAggregate") > plan.index("Window")
    # the pre-reduce groups per input slice: spark_partition_id is the salt
    assert "SPARK_PARTITION_ID" in plan.upper()
    # and its collected struct stays narrow — (key, id, sim) scalars only,
    # vectors pruned before the fold (review r6: the old Arrow-path test
    # pinned input narrowness; keep the equivalent pin on the JVM path)
    agg_lines = [ln for ln in plan.splitlines() if "collect_list" in ln]
    assert agg_lines, "pre-reduce collect_list missing from plan"
    assert all("vec" not in ln for ln in agg_lines)


def test_lsh_multiprobe_explodes_query_side_only(spark, catalog):
    """The distance-1 probe ring must fan out the broadcast QUERY side,
    never replicate the corpus: exactly one Generate(explode), and it
    sits inside the BroadcastExchange subtree (the plan string prints the
    streamed corpus child before the broadcast child, so a corpus-side
    explode would appear BEFORE the exchange). This is the plan property
    the operator's 100 TB probed-IO claim rests on."""
    plan = plan_of(catalog["embedding_ann_lsh"].builder(spark, SF))
    assert plan.count("Generate") == 1
    assert "BroadcastExchange" in plan
    assert plan.index("Generate") > plan.index("BroadcastExchange")


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
    plan = plan_of(catalog["q3_shipping_priority"].builder(spark, SF))
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
        "corpus_cleaning_pipeline",
    ):
        plan = plan_of(catalog[name].builder(spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name


def test_cidr_predicate_pushes_to_parquet_scan(spark, tmp_path):
    """ip_in_cidr compiles to literal BETWEEN bounds that reach the parquet
    scan of the ETL output as PushedFilters — the row-group-skip path the
    reference's remoteip_int column + row-group clustering was built for."""
    from s3_access_logs_spark.functions.ip import cidr_range, ip_in_cidr
    from s3_access_logs_spark.operators.etl import read_parsed, write_logs
    from s3_access_logs_spark.operators.parse import parse_logs
    from s3_access_logs_spark.sources.logs import read_logs
    from tests.test_parse import AWS_DOC_LINE

    src = tmp_path / "logs"
    src.mkdir()
    (src / "2019-02-06-00-00-38-AAAA").write_text(AWS_DOC_LINE + "\n")
    dst = str(tmp_path / "out")
    write_logs(parse_logs(read_logs(spark, str(src))), dst)

    lo, hi = cidr_range("192.0.2.0/24")
    q = (
        read_parsed(spark, dst)
        .filter(ip_in_cidr("remoteip_int", "192.0.2.0/24"))
        .select("requestid", "remoteip_int")
    )
    plan = plan_of(q)
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    # plan toString truncates long filter lists with '…', so match the
    # lower bound exactly and the upper bound by prefix
    assert f"GreaterThanOrEqual(remoteip_int,{lo})" in pushed
    assert "LessThanOrEqual(remoteip_i" in pushed
    assert q.count() == 1  # 192.0.2.3 is inside the block


def test_subquery_queries_decorrelate(spark, catalog):
    # correlated scalar subquery (q17) must plan as agg + join, never a
    # per-row subquery; NOT EXISTS (q22) must plan as a left-anti join
    p17 = plan_of(catalog["q17_small_quantity_revenue"].builder(spark, SF))
    assert "Join" in p17 and "Subquery" not in p17
    p22 = plan_of(catalog["q22_idle_rich_customers"].builder(spark, SF))
    assert "LeftAnti" in p22


def test_cidr_traffic_filter_not_pushed_into_parse(spark):
    """The catalog cidr_traffic filters a PARSED column; Catalyst's
    cost-blind alias substitution would inline the tokenizer into the
    Filter and the scan's DataFilters (6 regexp evals/row measured, ~6x
    slower). functions/expr.py:filter_unpushed pins the predicate above
    the projection — exactly one tokenizer evaluation in the whole plan."""
    from s3_access_logs_spark.plans.catalog import load_all

    df = load_all()["cidr_traffic"].builder(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") == 1


def test_shingle_explode_evaluates_hash_pipeline_once(spark, catalog):
    """InferFiltersFromGenerate used to add `size(e)>0 AND isnotnull(e)`
    above the shingle explode, and predicate pushdown inlined the md5
    pipeline into that filter — 12 md5 evaluations per row in the physical
    plan (the rule is excluded in session.py / sources/tables.py). The
    whole jaccard plan must evaluate the word-hash expression exactly
    once."""
    df = catalog["ngram_jaccard_pairs"].builder(spark, SF)
    plan = plan_of(df)
    assert plan.count("md5") == 1


def test_jaccard_pairs_generate_in_codegen(spark, catalog):
    """Posting-list pair generation must be chained Generate nodes
    (posexplode + explode run in whole-stage codegen), never a nested
    transform/flatten HOF (interpreted, O(c^3) array copies)."""
    plan = plan_of(catalog["ngram_jaccard_pairs"].builder(spark, SF))
    assert plan.count("Generate") >= 2
    assert "flatten" not in plan


def test_simhash_banding_has_no_candidate_join(spark, catalog):
    """The band-bucket candidate stage must be posting lists
    (group-then-generate, the jaccard_pairs pattern): in-bucket pairs come
    from codegen generators over the collected list, so the whole plan has
    ZERO join nodes — nothing for skew or a missing equi-condition to
    degrade into a nested-loop join at corpus scale."""
    plan = plan_of(catalog["simhash_near_pairs"].builder(spark, SF))
    assert "Join" not in plan
    assert plan.count("Generate") >= 2  # pair generators, not HOF flatten
    assert "flatten" not in plan
    # the md5 token-hash pipeline is evaluated once per 32-bit word per
    # union branch (2 words x 2 branches), never once per bit
    assert plan.count("md5") <= 4


def test_ivf_centroids_ride_broadcast_not_plan_literals(spark, catalog):
    """Centroid components must reach the executors as broadcast DATA.
    The literal-SQL variant embedded 10x64 floats in the plan: ~0.5 s
    parse per build and an oversized codegen method — and could never
    scale to production nlist."""
    df = catalog["embedding_ivf_topk"].builder(spark, SF)
    plan = plan_of(df)
    # one row of collect_list'd centroids is broadcast to both sides
    assert "BroadcastNestedLoopJoin" in plan
    # no plan-literal centroid arrays: a 64-element literal array would
    # print hundreds of comma-separated doubles in one expression
    assert max(
        (len(line) for line in plan.splitlines()), default=0
    ) < 20_000


def test_packed_windows_single_exchange_groupby_reuses_partitioning(
    spark, catalog
):
    """pack_id_windows' scale claim (round 10): the cumulative-offset
    window shuffles ONCE on the partition key, and the (part, window)
    groupBy must reuse that hash partitioning — grouping keys whose
    prefix is the existing distribution never re-exchange. A refactor
    that re-keys the groupBy (or materializes per-token rows) would
    show up here as a second Exchange / a Generate explosion per id."""
    plan = plan_of(catalog["packed_token_windows"].builder(spark, SF))
    # exactly ONE shuffle: the source-keyed window exchange
    n_exchanges = sum(
        1
        for ln in plan.splitlines()
        if ln.lstrip("+- :*( ").startswith("Exchange")
        and "Broadcast" not in ln
    )
    assert n_exchanges == 1, plan
    # segments explode via ONE generator (per ~doc_len/W slices), and
    # the token arrays never row-explode (no posexplode over ids)
    assert plan.count("Generate") == 1
    assert "Window" in plan
    # the id encode is the Arrow path (pandas UDF), never row-at-a-time
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_padded_and_span_windows_add_no_exchange(spark, catalog):
    """Round 11: the pad tail is a projection on the assembled windows
    and the spans aggregate rides the SAME groupBy — neither variant
    may add a shuffle or a generator to the packing plan."""
    for entry in ("packed_padded_windows", "packed_window_spans"):
        plan = plan_of(catalog[entry].builder(spark, SF))
        n_exchanges = sum(
            1
            for ln in plan.splitlines()
            if ln.lstrip("+- :*( ").startswith("Exchange")
            and "Broadcast" not in ln
        )
        assert n_exchanges == 1, (entry, plan)
        assert plan.count("Generate") == 1, entry
        assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
