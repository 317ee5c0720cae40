"""Bounded-driver-fast-path contract (plans/bounded.py): gate math,
decision recording, and the registered sites actually routing through
it (result-identity of fast vs distributed paths is covered by
test_graph.py / test_similarity.py)."""

from __future__ import annotations

import pytest

from fugue_warehouses_spark.plans.bounded import decisions, driver_fast_path_ok


def test_gate_requires_every_cost_within_budget():
    assert driver_fast_path_ok("t1", a=(5, 10))
    assert driver_fast_path_ok("t2", a=(5, 10), b=(3, 3))  # inclusive
    assert not driver_fast_path_ok("t3", a=(5, 10), b=(4, 3))
    with pytest.raises(ValueError, match="at least one"):
        driver_fast_path_ok("t4")


def test_decisions_recorded_per_site():
    driver_fast_path_ok("probe_site", flops=(2.0, 1.0))
    d = decisions["probe_site"]
    assert d["taken"] is False
    assert d["costs"]["flops"] == {"estimate": 2.0, "budget": 1.0}
    driver_fast_path_ok("probe_site", flops=(1.0, 1.0))
    assert decisions["probe_site"]["taken"] is True  # latest wins


def test_pagerank_routes_through_gate(spark):
    from fugue_warehouses_spark.extensions.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    decisions.pop("pagerank_local", None)
    pagerank(e, iters=1).count()
    d = decisions["pagerank_local"]
    assert d["taken"] is True
    assert d["costs"]["edges"]["estimate"] == 2
    assert d["costs"]["driver_bytes"]["estimate"] > 0
    # over-budget bytes: gate refuses, decision says so, result still ok
    decisions.pop("pagerank_local", None)
    pagerank(e, iters=1, local_bytes_below=1).count()
    assert decisions["pagerank_local"]["taken"] is False
    # over-EDGE-cap: must record a refusal too, not leave the earlier
    # verdict stale (round-8 review: the decision registry is only
    # useful if every call updates it)
    pagerank(e, iters=1).count()
    assert decisions["pagerank_local"]["taken"] is True
    pagerank(e, iters=1, local_edges_below=1).count()
    assert decisions["pagerank_local"]["taken"] is False


def test_within_batch_cc_routes_through_gate(spark):
    from fugue_warehouses_spark.extensions.similarity import (
        incremental_embedding_dedup,
    )

    hist = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(10, [0.0, 1.0]), (11, [0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    decisions.pop("within_batch_cc", None)
    incremental_embedding_dedup(batch, hist, threshold=0.9).count()
    d = decisions["within_batch_cc"]
    assert d["taken"] is True
    assert d["costs"]["flops"]["estimate"] == 2.0**2 * 2
