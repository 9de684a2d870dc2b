"""Physical-plan shape guards over the real parquet fixtures.

These assert the properties the engine's scale story depends on:
predicate pushdown into the parquet scan, broadcast closure joins (no
shuffle exchange for node filters), and single-shuffle partial+final
hash aggregation.  A regression here means a plan silently degraded
even if results stay correct.
"""

from __future__ import annotations

import os

import pytest

from networkframe_spark.sources import tpch_graph

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver fixtures not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_closure_plan_is_broadcast_and_pushed(spark):
    nf = tpch_graph(spark, SF_DIR)
    plan = _plan(nf.query_nodes("acctbal > 1000").edges)
    # node filter reaches the parquet scan
    assert "acctbal" in plan and "1000" in plan
    assert "DataFilters" in plan or "PushedFilters" in plan
    # closure semi-joins broadcast; no shuffle exchange anywhere
    assert plan.count("BroadcastHashJoin") >= 3  # edge join + 2 semi-joins
    assert "Exchange hashpartitioning" not in plan


def test_condense_plan_single_shuffle_partial_agg(spark):
    nf = tpch_graph(spark, SF_DIR)
    plan = _plan(nf.condense("nationkey", func="sum", columns=["weight"]).edges)
    # partial+final hash aggregation with exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") == 2


def test_scan_prunes_columns(spark):
    nf = tpch_graph(spark, SF_DIR)
    plan = _plan(nf.edges.select("source", "target"))
    # lineitem scan must not read unreferenced columns
    assert "l_comment" not in plan and "l_shipdate" not in plan


def test_filter_chain_fuses(spark):
    nf = tpch_graph(spark, SF_DIR)
    chained = nf.query_nodes("acctbal > 0").query_nodes("nationkey < 10")
    assert _plan(chained.edges).count("LeftSemi") == 2
