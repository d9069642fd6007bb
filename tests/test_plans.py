"""Physical-plan audits: the properties that matter at 100 TB must be
visible in the Catalyst plan at any SF."""

import pyspark.sql.functions as F
import pytest

from fastqdedup_spark.plans import formatted_plan, plan_audit

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.filter(F.col("event_type") == "error").select("user_id", "value")
    plan = formatted_plan(q)
    assert "PushedFilters" in plan and "event_type" in plan
    # column pruning: props (the widest column) must NOT be read
    assert "props" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_agg_uses_partial_aggregation(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = formatted_plan(q)
    # map-side combine: partial_sum below the exchange, final above
    assert "partial_sum" in plan
    audit = plan_audit(q)
    assert audit["exchanges"] == 1


def test_semi_join_broadcasts_small_side(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    q = c.join(
        F.broadcast(o.select(F.col("o_custkey").alias("c_custkey"))),
        "c_custkey",
        "left_semi",
    )
    audit = plan_audit(q)
    assert audit["broadcast_joins"] >= 1
    assert audit["sort_merge_joins"] == 0


def test_exact_dedup_single_shuffle(spark):
    """The exact-dup tier must be one exchange on sha (partial agg
    map-side), not a window sort."""
    from fastqdedup_spark.operators.exact_dedup import exact_group_counts, with_sha256

    files = spark.createDataFrame(
        [("r", "p", "c", "py", "x", 1)],
        "repo string, path string, commit string, lang string, content string, id long",
    )
    q = exact_group_counts(with_sha256(files))
    audit = plan_audit(q)
    assert audit["exchanges"] == 1
    assert "Window" not in formatted_plan(q)
