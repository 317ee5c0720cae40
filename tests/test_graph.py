"""Graph operators (extensions/graph.py): edge extraction, degrees,
PageRank invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions.graph import (
    cooccurrence_edges,
    degree_stats,
    pagerank,
)


def _orders(spark):
    # groups: order 1 holds items a,b,c; order 2 holds a,b; order 3: d alone
    return spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "d")],
        "oid long, item string",
    )


def test_edges_symmetric_distinct_no_self_loops(spark):
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b"),
    }
    # d co-occurs with nothing; (a,b) seen in two orders collapses to one edge


def test_degree_stats(spark):
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    d = {r["node"]: r["degree"] for r in degree_stats(e).collect()}
    assert d == {"a": 2, "b": 2, "c": 2}


def test_pagerank_sums_to_one_and_ranks_hubs(spark):
    # star: hub h linked with 3 spokes -> h gets the highest score
    edges = spark.createDataFrame(
        [("h", s) for s in "xyz"] + [(s, "h") for s in "xyz"],
        "src string, dst string",
    )
    r = {row["node"]: row["score"] for row in pagerank(edges, iters=5).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9  # dangling-free: mass conserved
    assert r["h"] > max(r[s] for s in "xyz")
    assert len({r[s] for s in "xyz"}) == 1   # symmetry -> equal spoke scores


def test_pagerank_deterministic_across_layouts(spark):
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    r1 = sorted(map(tuple, pagerank(e, iters=3).collect()))
    r2 = sorted(map(tuple, pagerank(e.repartition(7), iters=3).collect()))
    assert [(n, round(s, 12)) for n, s in r1] == [(n, round(s, 12)) for n, s in r2]


def test_pagerank_validates_iters(spark):
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=0)


def test_pagerank_checkpoint_bounds_plan_depth(spark):
    """With checkpointing every 2 rounds, 6 rounds must not build a
    6-deep join lineage: the plan string stops growing linearly."""
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    # local_edges_below=0: the lineage bound is a property of the
    # DISTRIBUTED loop; the default would take the local path here
    deep = pagerank(e, iters=6, checkpoint_every=2, local_edges_below=0)
    shallow = pagerank(e, iters=2, checkpoint_every=2, local_edges_below=0)
    dlen = len(deep._jdf.queryExecution().optimizedPlan().toString())
    slen = len(shallow._jdf.queryExecution().optimizedPlan().toString())
    assert dlen < 3 * slen


def test_pagerank_local_gate_respects_string_id_bytes(spark):
    """The local-path gate is edges AND estimated driver bytes (round-8
    ADVICE fix): string node ids cost 60+ B each as pandas objects, so
    a string-id graph under the edge cap but over the byte cap must
    take the distributed loop — and still answer identically."""
    e = cooccurrence_edges(_orders(spark), "oid", "item")

    took_local = []

    # patch the CONCRETE class (pyspark 4's classic DataFrame defines
    # its own toPandas, shadowing the abstract base)
    cls = type(e)
    real_topandas = cls.toPandas
    try:
        def spy(self):
            took_local.append(True)
            return real_topandas(self)

        cls.toPandas = spy
        # byte cap of 1: even this tiny string graph must refuse the
        # driver transfer
        tight = {
            r["node"]: r["score"]
            for r in pagerank(e, iters=3, local_bytes_below=1).collect()
        }
        assert not took_local
        # default caps: 12 edges of 1-char ids fit easily -> local path
        loose = {
            r["node"]: r["score"] for r in pagerank(e, iters=3).collect()
        }
        assert took_local
    finally:
        cls.toPandas = real_topandas
    assert tight.keys() == loose.keys()
    for k in tight:
        assert abs(tight[k] - loose[k]) < 1e-12, k


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, iters=3).count() == 0


def test_pagerank_local_and_distributed_paths_agree(spark):
    """The driver-local small-graph path (round 7) must reproduce the
    distributed loop's scores: same nodes, same values to 1e-12 (the
    two differ only in float summation order; the facet's 6-digit
    rounding is far coarser). local_edges_below=0 forces the
    distributed loop, the default takes the local one."""
    e = cooccurrence_edges(_orders(spark), "oid", "item")
    local = {r["node"]: r["score"] for r in pagerank(e, iters=4).collect()}
    dist = {
        r["node"]: r["score"]
        for r in pagerank(e, iters=4, local_edges_below=0).collect()
    }
    assert local.keys() == dist.keys()
    for k in local:
        assert abs(local[k] - dist[k]) < 1e-12, k
    # mass conserved on both paths
    assert abs(sum(local.values()) - 1.0) < 1e-9
    # materialize_edges=False skips the gate count and stays distributed
    nomat = {
        r["node"]: r["score"]
        for r in pagerank(e, iters=4, materialize_edges=False).collect()
    }
    for k in local:
        assert abs(local[k] - nomat[k]) < 1e-12, k


def test_pagerank_byte_gate_counts_utf8_bytes_not_chars(spark):
    """The byte estimate feeds a BYTES bound, so multibyte UTF-8 node
    ids must be costed at their octet length (round-9 ADVICE: F.length
    counts characters and underestimates CJK/emoji ids 3-4x). A graph
    whose ids are 4-byte emoji must estimate more bytes than the same
    shape with 1-byte ascii ids of equal character count."""
    from fugue_warehouses_spark.plans.bounded import decisions

    ascii_e = spark.createDataFrame(
        [(chr(97 + i) * 8, chr(98 + i) * 8, 1.0) for i in range(5)],
        "src string, dst string, weight double",
    )
    emoji_e = spark.createDataFrame(
        [("\U0001f600" * 8 + str(i), "\U0001f601" * 8 + str(i), 1.0)
         for i in range(5)],
        "src string, dst string, weight double",
    )
    estimates = {}
    for name, e in (("ascii", ascii_e), ("emoji", emoji_e)):
        pagerank(e, iters=1)
        dec = decisions["pagerank_local"]
        assert "driver_bytes" in dec["costs"], dec
        estimates[name] = dec["costs"]["driver_bytes"]["estimate"]
    # 8 emoji are 32 B + 1 digit vs 8 ascii B + 1-char pad; the flat
    # 120 B/row object overhead is identical on both sides, so a
    # char-counting estimator would return near-equal numbers while a
    # byte-counting one separates them by ~2x/row-width
    assert estimates["emoji"] > estimates["ascii"] * 1.15
