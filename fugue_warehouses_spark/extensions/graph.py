"""Graph operators on relational co-occurrence graphs: edge
extraction, degree statistics, and PageRank.

A warehouse-native graph stack: the graph IS a DataFrame of edges, and
every iteration is a join + aggregate Catalyst can plan — no graph
runtime needed. Complements the connected-components resolver in
extensions/dedup.py (label propagation) with a score-propagation
algorithm.

Scale shapes:

- **edge extraction** self-joins the fact on its group key — the join
  is co-partitioned on that key (one shuffle), and the pair fan-out is
  Σ group_size², bounded by the natural group grain (items per order),
  never |fact|².
- **PageRank** iterations are (edges ⋈ ranks) on src — edges shuffle
  ONCE into that keying and the tiny ranks side re-shuffles per round;
  ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
  doubling lineage exactly like dedup's connected components
  (extensions/dedup.py).

Determinism: rank updates are pure arithmetic on doubles; rounding at
presentation (6 dp) absorbs summation-order ulps, which is what makes
the unrolled DuckDB oracle exact (queries.py: part_pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Distinct directed edges (src, dst) between items sharing a
    group (both directions; self-loops excluded)."""
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "__g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
    materialize_edges: bool = True,
) -> DataFrame:
    """PageRank over a dangling-free edge list (every node has
    out-degree >= 1 — true for co-occurrence graphs, where edges are
    symmetric). Returns (node, score).

    Uniform 1/N init; each iteration: score(v) = (1-d)/N +
    d * Σ_{u→v} score(u)/outdeg(u). N is the distinct node count.

    ``materialize_edges`` localCheckpoints the edge list before
    iterating: every iteration (and the node/degree derivation)
    consumes edges, so without it an expensive upstream edge extraction
    re-executes once per round — measured 4.3× slower at sf0.1. At
    cluster scale the same move is "write edges once, iterate over the
    materialization", the standard iterative-graph discipline.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if materialize_edges:
        edges = edges.localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst"))
    ).distinct()
    n = nodes.count()  # scalar: drives the teleport constant
    if n == 0:
        # empty graph: empty result with the contract schema
        return nodes.select("node", F.lit(0.0).alias("score"))
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    e = edges.join(deg, "src").select("src", "dst", "__deg")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("score"))
    for i in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("score") / F.col("__deg")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
            ).alias("score"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node out-degree (symmetric graphs: == in-degree)."""
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )
