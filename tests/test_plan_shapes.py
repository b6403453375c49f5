"""Plan-shape regression battery for the headline bench legs.

The bench numbers (BENCH_r{N}.json) tell you a leg got slower; these
tests tell you WHY before it ships — they pin the physical-plan
properties each leg's speed depends on (broadcast vs shuffle join,
rank-limit pushdown, parquet filter pushdown, map-side combine, and
the row-at-a-time-Python ban from SURVEY.md §7). A refactor that keeps
the answer but silently trades TakeOrderedAndProject for a global sort,
or a broadcast for a SortMergeJoin, fails here instead of surfacing as
an unexplained bench drift three recordings later.

Assertions run on the UNEXECUTED plan (AQE's initial plan): every
property pinned here is decided statically — join strategy from file
statistics, pushdown and limit placement from the optimizer — so no
job needs to run.
"""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (  # noqa: E402
    queries,
)


def _plan(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_k1_topk_is_take_ordered_no_shuffle(spark, sf_dir):
    """1xN cosine top-k: the query row is broadcast (nested-loop, one
    row) and the top-k is TakeOrderedAndProject — per-partition heaps +
    driver merge, NO global sort and NO shuffle. A hashpartitioning
    Exchange here would mean the k=4 result pays a full-data shuffle."""
    plan = _plan(spark, sf_dir, "k1_topk_search")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # the query-vector lookup is pushed into the parquet scan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(vec_id", plan)


def test_k3_per_group_topk_uses_window_group_limit(spark, sf_dir):
    """Per-section top-k must keep Spark 4's WindowGroupLimit (rank
    limit pushed below the Window): each group keeps k rows in a heap
    instead of fully sorting every partition."""
    plan = _plan(spark, sf_dir, "k3_topk_per_section")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row query side broadcast


def test_knn_join_group_limit_and_pushdown(spark, sf_dir):
    """NxM knn join: query side is a pushed-down range scan
    (vec_id < n_queries reaches the parquet reader) broadcast against
    the corpus, and the per-query k-limit runs as WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "sim_knn_bruteforce")
    assert "WindowGroupLimit" in plan
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(vec_id", plan)
    assert "SortMergeJoin" not in plan


def test_q1_pushdown_and_single_agg_exchange(spark, sf_dir):
    """TPC-H Q1: the shipdate predicate reaches the parquet scan
    (row-group pruning at scale), and the plan holds exactly one
    shuffle — partial HashAggregate map-side, final after one
    hashpartitioning Exchange. A second Exchange would mean the
    partial-combine collapsed."""
    plan = _plan(spark, sf_dir, "rel_q1_pricing")
    assert re.search(
        r"PushedFilters: \[[^\]]*LessThanOrEqual\(l_shipdate", plan
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan  # map-side combine present


def test_q5_small_dims_broadcast(spark, sf_dir):
    """TPC-H Q5 join pyramid: region/nation/supplier-side dims must go
    out as broadcasts — at 100 TB the fact-fact edges may legitimately
    shuffle, but a dim table falling back to SortMergeJoin means file
    statistics stopped reaching the planner."""
    plan = _plan(spark, sf_dir, "rel_q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "partial_sum" in plan


def test_headline_legs_ban_row_python(spark, sf_dir):
    """SURVEY §7 boundary rule, enforced on every catalog-registered
    headline leg: no BatchEvalPython (row-at-a-time Python UDF)
    anywhere in the plan. Python is allowed only Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)."""
    import bench

    qs = queries()
    for name in bench.HEADLINE:
        assert name in qs, f"headline leg {name} not in catalog"
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the hot path"
        )


@pytest.mark.parametrize(
    "name",
    [
        # map-only contracts: entries whose scale story is "zero
        # shuffle" — a Generate/project/filter pipeline over the scan.
        "f1_title_filter",
        "text_quality_score",
        "text_token_count",
        "text_lang_id",
        "cur_pii_scrub",
    ],
)
def test_map_only_entries_have_no_exchange(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan, f"{name}: map-only contract broken"
