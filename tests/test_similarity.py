import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark, vecs):
    out = S.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: -r["cosine_sim"])
    assert [r["match_id"] for r in rows] == [1, 2]
    assert rows[0]["cosine_sim"] > 0.99


def test_brute_force_topk_deterministic_ties(spark):
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["match_id"] for r in out] == [1, 2, 3]


def test_similarity_pairs(spark, vecs):
    out = S.similarity_pairs(vecs, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(0, 1)}


def test_similarity_pairs_block_no_driver_collect(spark, vecs, monkeypatch):
    """The default (block) path must never pull the corpus to the
    driver — the round-1 scale-killer was a full-corpus collect."""

    def boom(*a, **k):
        raise AssertionError("driver-side corpus collect in block path")

    monkeypatch.setattr(S, "_collect_query_matrix", boom)
    out = S.similarity_pairs(vecs, threshold=0.9)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(0, 1)}


def test_similarity_pairs_methods_agree(spark, tables):
    """block (distributed) == broadcast (driver matmul) == expr (JVM),
    on real fixture embeddings across many blocks."""
    emb = tables["embeddings"]

    def pairs(method):
        out = S.similarity_pairs(emb, threshold=0.35, method=method, n_blocks=7)
        return {
            (r["id_a"], r["id_b"], r["cosine_sim"]) for r in out.collect()
        }

    blocked = pairs("block")
    assert blocked == pairs("broadcast")


def test_similarity_pairs_block_handles_string_ids(spark):
    rows = [("a", [1.0, 0.0]), ("b", [0.99, 0.01]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = S.similarity_pairs(df, threshold=0.9, n_blocks=3)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {("a", "b")}


def test_lsh_topk_recall_on_real_embeddings(spark, tables):
    emb = tables["embeddings"].withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, queries, k=5)
    # fixture embeddings are near-random (top-5 cosine ~0.3), so use
    # short signatures + many tables; real clustered embeddings would
    # take longer signatures and fewer tables
    approx = S.lsh_topk(emb, queries, k=5, dim=64, n_planes=4, n_tables=16)
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_topk_caps_k(spark, vecs):
    out = S.lsh_topk(vecs, vecs, k=2, dim=3, n_planes=4, n_tables=8)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_ivf_topk_recall_on_real_embeddings(spark, tables):
    from pyspark.sql import functions as F

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, queries, k=5)
    approx = S.ivf_topk(emb, queries, k=5, n_centroids=32, n_probe=8)
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # determinism: same call twice, same rows
    b = {(r["query_id"], r["match_id"]) for r in S.ivf_topk(
        emb, queries, k=5, n_centroids=32, n_probe=8).collect()}
    assert a == b


def test_lsh_topk_dim_mismatch_raises(spark, vecs):
    import pytest

    # vecs are 3-dim; dim=5 must raise, not silently degrade buckets
    with pytest.raises(Exception, match="!= dim 5"):
        S.lsh_topk(vecs, vecs, k=2, dim=5, n_planes=4, n_tables=2).collect()


def test_brute_force_topk_string_ids(spark):
    rows = [("q", [1.0, 0.0]), ("m1", [0.9, 0.1]), ("m2", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = S.brute_force_topk(
        df, df.filter(F.col("vec_id") == "q"), k=1
    ).collect()
    assert [(r["query_id"], r["match_id"]) for r in out] == [("q", "m1")]


def test_srp_planes_duckdb_exact_parity():
    """The sha256 hyperplane family must be regenerable in plain SQL
    with EXACT float64 equality — this is what lets embedding_lsh_topk
    carry a hash-checked oracle instead of a rows-only check."""
    import duckdb

    dim, n_planes, n_tables, seed = 7, 3, 2, 42
    py = S.srp_planes(dim, n_planes, n_tables, seed)
    rows = duckdb.sql(
        f"""
        SELECT tt.range AS t, pp.range AS p, dd.range AS d,
               (CAST(('0x' || substring(sha256('{seed}:'
                   || CAST(tt.range AS VARCHAR) || ':'
                   || CAST(pp.range AS VARCHAR) || ':'
                   || CAST(dd.range AS VARCHAR)), 1, 8)) AS UBIGINT)::DOUBLE
                - 2147483648.0) / 2147483648.0 AS comp
        FROM range({n_tables}) tt, range({n_planes}) pp, range({dim}) dd
        """
    ).fetchall()
    assert len(rows) == n_tables * n_planes * dim
    for t, p, d, comp in rows:
        assert py[t][p][d] == comp  # exact, no tolerance
    flat = [c for tb in py for pl in tb for c in pl]
    assert min(flat) >= -1.0 and max(flat) < 1.0
    assert len(set(flat)) == len(flat)  # sha256 components don't collide


def test_similarity_pairs_auto_selects_by_plan_stats(spark, sf_dir):
    """auto = broadcast under the size threshold (MapInPandas, no
    grouped shuffle), block above it (FlatMapGroupsInPandas)."""
    from fugue_warehouses_spark.extensions.similarity import similarity_pairs
    from fugue_warehouses_spark.sources import load_star_table

    emb = load_star_table(spark, sf_dir, "embeddings")
    small = similarity_pairs(emb, 0.35)  # fixture is far below 64 MB
    plan_s = small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_s and "FlatMapGroupsInPandas" not in plan_s

    big = similarity_pairs(emb, 0.35, broadcast_max_bytes=1)
    plan_b = big._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan_b


def test_hard_negative_topk_masks_same_label(spark, tables):
    from fugue_warehouses_spark.extensions import similarity as S

    emb = tables["embeddings"]
    anchors = emb.filter(F.col("vec_id") < 5)
    out = S.hard_negative_topk(emb, anchors, k=5, label_col="label")
    rows = out.collect()
    assert len(rows) == 25  # 5 anchors x k
    labels = {r["vec_id"]: r["label"] for r in anchors.collect()}
    for r in rows:
        assert r["match_label"] != labels[r["query_id"]]
        assert r["match_id"] != r["query_id"]


def test_hard_negative_topk_all_same_label_empty(spark):
    from fugue_warehouses_spark.extensions import similarity as S

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], 7) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    assert S.hard_negative_topk(df, df, k=3, label_col="label").count() == 0


def test_topk_empty_query_set_returns_typed_empty(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    none = emb.filter("vec_id < 0")
    out = S.brute_force_topk(emb, none, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "match_id", "cosine_sim"]
    hn = S.hard_negative_topk(
        emb.withColumn("label", F.lit(1)), none.withColumn("label", F.lit(1)),
        k=3, label_col="label",
    )
    assert hn.count() == 0

    from fugue_warehouses_spark.extensions.quantization import quantized_topk

    qt = quantized_topk(emb, none, k=3, id_col="vec_id")
    assert qt.count() == 0
    assert qt.columns == ["query_id", "match_id", "q_dot"]


def test_hard_negative_topk_null_labels_excluded(spark):
    # SQL `q.label <> c.label`: NULL on either side excludes the pair
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.1], None), (3, [0.9, 0.1], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    anchors = spark.createDataFrame(
        [(10, [1.0, 0.0], 0), (11, [1.0, 0.0], None)],
        "vec_id long, embedding array<double>, label int",
    )
    rows = S.hard_negative_topk(corpus, anchors, k=5, label_col="label").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["match_id"])
    # anchor 10 (label 0): only corpus 3 (label 1) qualifies — 1 has the
    # same label, 2 has NULL; anchor 11 (NULL label) mines nothing
    assert by_q == {10: {3}}


def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    from fugue_warehouses_spark.plans import versioned as V

    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(size=16)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 5")
    inline = S.ivf_topk_hash(emb, queries, k=5, n_centroids=16, n_probe=4)
    assigned, centroids = S.build_ivf_hash_index(emb, n_centroids=16)
    V.write_version(assigned, str(tmp_path / "a"), spark)
    V.write_version(centroids, str(tmp_path / "c"), spark)
    persisted = S.ivf_topk_from_index(
        V.read_version(spark, str(tmp_path / "a")),
        V.read_version(spark, str(tmp_path / "c")),
        queries, k=5, n_probe=4,
    )
    key = lambda df: sorted(
        (r["query_id"], r["match_id"], round(r["cosine_sim"], 6))
        for r in df.collect()
    )
    assert key(inline) == key(persisted)
    # the probe plan reads the stored index, not the raw embeddings
    assert any("/a/" in f or "\\a\\" in f for f in persisted.inputFiles())
    # pre-collected centroid rows (serving-loop cache) — same result,
    # and no per-call collect of the centroid table
    cached = S.ivf_topk_from_index(
        V.read_version(spark, str(tmp_path / "a")),
        V.read_version(spark, str(tmp_path / "c")),
        queries, k=5, n_probe=4,
        centroid_rows=V.read_version(spark, str(tmp_path / "c")).collect(),
    )
    assert key(cached) == key(persisted)


def test_ivf_empty_corpus_raises_clearly(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        S.build_ivf_hash_index(emb, n_centroids=8)


def test_ivf_duplicate_query_rows_collapse(spark):
    """A duplicated query row must not emit duplicate candidates that
    eat row_number top-k slots (the old row-level distinct absorbed
    this; the probe build now dedupes ids driver-side)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q1 = emb.filter("vec_id < 3")
    q_dup = q1.unionAll(q1)  # every query row twice
    a = S.ivf_topk_hash(emb, q1, k=5, n_centroids=8, n_probe=4)
    b = S.ivf_topk_hash(emb, q_dup, k=5, n_centroids=8, n_probe=4)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(a) == key(b)


def test_ivf_conflicting_duplicate_query_id_raises(spark):
    """The SAME query id carrying DIFFERENT vectors is a contract
    violation: scoring an arbitrary one of the two would be a silent
    wrong answer, so the probe must raise instead."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0] * 8), (0, [2.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="different vectors"):
        S.ivf_topk_hash(emb, q, k=5, n_centroids=8, n_probe=4)


def test_ivf_empty_query_set_returns_typed_empty(spark):
    """An empty query set short-circuits (no (0,0)-matmul shape error)
    with the result schema intact — mirroring _topk_scaffold."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    none = emb.filter("vec_id < 0")
    for out in (
        S.ivf_topk_hash(emb, none, k=5, n_centroids=8, n_probe=2),
        S.ivf_topk_from_index(
            *S.build_ivf_hash_index(emb, n_centroids=8), none, k=5, n_probe=2
        ),
    ):
        assert out.columns == ["query_id", "match_id", "cosine_sim"]
        assert out.count() == 0


# ---------------- incremental embedding dedup -----------------------


def _vec(*xs):
    return [float(x) for x in xs]


def test_incremental_embedding_dedup_exact(spark):
    """History-near batch vectors drop; the remainder near-dedups
    within the batch by exact CC keep-min; far vectors survive."""
    import pytest

    from fugue_warehouses_spark.extensions.similarity import (
        incremental_embedding_dedup,
    )

    hist = spark.createDataFrame(
        [(1, _vec(1, 0, 0), 0), (2, _vec(0, 1, 0), 0)],
        "vec_id long, embedding array<double>, label int",
    )
    batch = spark.createDataFrame(
        [
            (10, _vec(0.99, 0.14, 0), 1),   # ~cos 0.99 to hist 1 -> drop
            (11, _vec(0, 0, 1), 1),          # orthogonal to history
            (12, _vec(0, 0.05, 0.99), 1),    # near 11 -> within-batch dup
            (13, _vec(-1, 1, -1), 1),        # far from everything
        ],
        "vec_id long, embedding array<double>, label int",
    )
    kept = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            batch, hist, threshold=0.9
        ).collect()
    }
    assert kept == {11, 13}  # 10 drops vs history, 12 loses to 11
    with pytest.raises(ValueError, match="history"):
        incremental_embedding_dedup(batch, threshold=0.9)


def test_incremental_embedding_dedup_indexed_matches_exact(spark):
    """Full-probe index serving (n_probe=ALL) is exact by construction
    — identical survivor set to the brute-force path; and pruned
    probing (n_probe=1) can only OVER-KEEP (a missed neighbor keeps a
    duplicate), never over-drop."""
    import random

    from fugue_warehouses_spark.extensions.similarity import (
        build_ivf_hash_index,
        incremental_embedding_dedup,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)], i % 3) for i in range(80)
    ]
    # plant exact-duplicate vectors across the id split so real drops occur
    for dup, src in [(60, 3), (61, 10), (70, 45), (71, 70)]:
        rows[dup] = (dup, list(rows[src][1]), rows[dup][2])
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    hist = emb.filter("vec_id < 40")
    batch = emb.filter("vec_id >= 40")
    exact = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            batch, hist, threshold=0.999
        ).collect()
    }
    assert 60 not in exact and 61 not in exact  # history dups dropped
    # {45, 70, 71} share one vector and all sit in the batch: CC
    # keep-min keeps 45, drops both copies
    assert 45 in exact and 70 not in exact and 71 not in exact
    assigned, centroids = build_ivf_hash_index(hist, n_centroids=8)
    indexed = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            batch, assigned=assigned, centroids=centroids, threshold=0.999
        ).collect()
    }
    assert indexed == exact
    pruned = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            batch,
            assigned=assigned,
            centroids=centroids,
            threshold=0.999,
            n_probe=1,
        ).collect()
    }
    assert exact <= pruned  # pruning may over-keep, never over-drop


def test_ivf_threshold_hits_non_contiguous_cidx(spark):
    """Pruned probing must key cells by the STORED cidx values, not by
    positions in the cidx-sorted centroid matrix (round-8 ADVICE fix):
    with cidx remapped to a non-contiguous range (i*10+5) the pruned
    path previously looked up positional keys 0..n_c-1, probed nothing,
    and silently returned no hits."""
    import random

    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.similarity import (
        _ivf_threshold_hits,
        build_ivf_hash_index,
    )

    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = build_ivf_hash_index(emb, n_centroids=8)
    remap = F.col("cidx") * 10 + 5
    assigned_nc = assigned.withColumn("cidx", remap)
    cents_nc = cents.withColumn("cidx", remap)
    # queries: exact copies of corpus vectors (cosine 1.0) under new ids
    queries = emb.filter("vec_id < 6").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    full = {
        r["query_id"]
        for r in _ivf_threshold_hits(
            assigned_nc, queries, 0.999, 8, cents_nc, None,
            "embedding", "vec_id", "embedding", 6,
        ).collect()
    }
    pruned = {
        r["query_id"]
        for r in _ivf_threshold_hits(
            assigned_nc, queries, 0.999, 2, cents_nc, None,
            "embedding", "vec_id", "embedding", 6,
        ).collect()
    }
    expect = {1000 + i for i in range(6)}
    assert full == expect
    # an identical copy lives in its query's own top-1 cell, so even a
    # pruned probe must find every planted hit
    assert pruned == expect


def test_incremental_embedding_dedup_overkeeps_recoverable(spark):
    """The over-keep escape hatch is closed: whatever a pruned probe
    (n_probe=1) over-keeps is recovered by one exact CC pass over the
    ACCEPTED set (dedup_near) — embeddings need no drop-log, because a
    missed duplicate leaves BOTH vectors in the accepted corpus.
    history ∪ pruned-survivors, exactly reconciled, equals
    history ∪ exact-survivors."""
    import random

    from fugue_warehouses_spark.extensions.dedup import dedup_near
    from fugue_warehouses_spark.extensions.similarity import (
        build_ivf_hash_index,
        incremental_embedding_dedup,
        similarity_pairs,
    )

    rng = random.Random(23)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)], i % 3) for i in range(80)
    ]
    for dup, src in [(55, 2), (62, 17), (66, 33), (77, 41)]:
        rows[dup] = (dup, list(rows[src][1]), rows[dup][2])
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    hist = emb.filter("vec_id < 50")
    batch = emb.filter("vec_id >= 50")
    exact = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            batch, hist, threshold=0.999
        ).collect()
    }
    assigned, centroids = build_ivf_hash_index(hist, n_centroids=8)
    pruned = incremental_embedding_dedup(
        batch,
        assigned=assigned,
        centroids=centroids,
        threshold=0.999,
        n_probe=1,
    )
    accepted = hist.select("vec_id", "embedding", "label").unionByName(
        pruned.select("vec_id", "embedding", "label")
    )
    reconciled = {
        r["vec_id"]
        for r in dedup_near(
            accepted,
            similarity_pairs(accepted, 0.999, "vec_id", "embedding"),
            "vec_id",
        ).collect()
    }
    hist_ids = {r["vec_id"] for r in hist.select("vec_id").collect()}
    assert reconciled == hist_ids | exact


def test_ivf_topk_from_index_sim_floor(spark):
    """sim_floor filters scored candidates BEFORE the rank window:
    results are exactly the no-floor results with cosine_sim below
    the floor removed."""
    import random

    from fugue_warehouses_spark.extensions.similarity import (
        build_ivf_hash_index,
        ivf_topk_from_index,
    )

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = build_ivf_hash_index(emb, n_centroids=4)
    queries = emb.filter("vec_id < 6")
    base = ivf_topk_from_index(assigned, centroids, queries, k=3, n_probe=4)
    floored = ivf_topk_from_index(
        assigned, centroids, queries, k=3, n_probe=4, sim_floor=0.2
    )
    b = {(r["query_id"], r["match_id"], r["cosine_sim"]) for r in base.collect()}
    f = {(r["query_id"], r["match_id"], r["cosine_sim"]) for r in floored.collect()}
    assert f == {t for t in b if t[2] >= 0.2}
    assert all(t[2] >= 0.2 for t in f)


def test_recall_at_k_full_probe_is_exactly_one(spark, tables):
    """The ANN quality harness's anchor (round 11, VERDICT r10 next
    #5): IVF probing EVERY cell must reproduce brute-force truth
    exactly — recall@10 == 1.0, tying the recall curve recorded in
    SCALE_NOTES to the long-standing full-probe identity property.
    Also pins recall_at_k's own semantics: truth against itself is
    1.0, and a query missing entirely from the approximate result
    counts as 0 for its rows (not skipped)."""
    from fugue_warehouses_spark.extensions.similarity import (
        brute_force_topk,
        build_ivf_hash_index,
        ivf_topk_from_index,
        recall_at_k,
    )

    emb = tables["embeddings"]
    queries = emb.filter("vec_id < 20")
    truth = brute_force_topk(emb, queries, k=10)
    assert recall_at_k(truth, truth) == 1.0

    assigned, centroids = build_ivf_hash_index(emb)
    n_cells = centroids.count()
    full = ivf_topk_from_index(
        assigned, centroids, queries, k=10, n_probe=n_cells
    )
    assert recall_at_k(truth, full) == 1.0

    # fewer probes can only lose truth rows, never gain recall
    one = ivf_topk_from_index(
        assigned, centroids, queries, k=10, n_probe=1
    )
    r1 = recall_at_k(truth, one)
    assert 0.0 <= r1 < 1.0

    # a dropped query counts as zero, not as absent from the average:
    # keeping 10 of 20 queries whole and dropping the rest entirely
    # must average to exactly 0.5
    n_kept = truth.filter("query_id < 10").select("query_id").distinct().count()
    n_all = truth.select("query_id").distinct().count()
    assert (n_kept, n_all) == (10, 20)
    assert recall_at_k(truth, truth.filter("query_id < 10")) == 0.5


def test_recall_anchors_matryoshka_and_quantized(spark, tables):
    """The two round-11 recall-harness axes keep their anchors:
    full-dim matryoshka slicing is a no-op (recall 1.0 vs truth), and
    int8 quantization over unit-normalized vectors — where cosine and
    dot rank identically, so the gap is pure quantization error —
    loses only a few percent of recall@10."""
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.quantization import quantized_topk
    from fugue_warehouses_spark.extensions.similarity import (
        brute_force_topk,
        recall_at_k,
    )

    emb = tables["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter("vec_id < 20")
    truth = brute_force_topk(emb, queries, k=10)

    full_slice = emb.select(
        "vec_id", F.slice("embedding", 1, dim).alias("embedding")
    )
    assert recall_at_k(
        truth,
        brute_force_topk(full_slice, full_slice.filter("vec_id < 20"), k=10),
    ) == 1.0

    normed = (
        emb.withColumn(
            "__norm",
            F.sqrt(F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x * x
            )),
        )
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: x / F.greatest(F.col("__norm"), F.lit(1e-12)),
            ).alias("embedding"),
        )
    )
    qd = quantized_topk(
        normed, normed.filter("vec_id < 20"), k=10
    ).filter("query_id != match_id")
    assert recall_at_k(truth, qd) >= 0.9


def test_decontaminate_semantic_hand_built(spark):
    from fugue_warehouses_spark.extensions.similarity import (
        decontaminate_semantic,
    )

    # benchmark: two orthogonal axes; ids deliberately unsorted on
    # input to exercise the min-id tie-break sort
    bench = spark.createDataFrame(
        [(11, [0.0, 1.0, 0.0]), (10, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (100, [2.0, 0.0, 0.0], 1),   # cos=1.0 vs bench 10
            (101, [0.0, 0.0, 3.0], 2),   # orthogonal to both -> clean
            (102, [1.0, 1.0, 0.0], 3),   # cos=.7071 vs BOTH -> tie -> 10
            (103, [0.1, 0.9, 0.0], 4),   # closest to bench 11
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.vec_id: r
        for r in decontaminate_semantic(
            corpus, bench, extra_cols=("label",), threshold=0.5
        ).collect()
    }
    assert set(out) == {100, 102, 103}
    assert out[100].nearest_benchmark == 10 and out[100].max_sim == 1.0
    assert out[102].nearest_benchmark == 10  # tie broken to min id
    assert out[102].max_sim == 0.707107
    assert out[103].nearest_benchmark == 11
    assert out[103].label == 4

    # threshold just above the tie similarity drops the tied row
    out2 = decontaminate_semantic(
        corpus, bench, extra_cols=("label",), threshold=0.71
    ).collect()
    assert {r.vec_id for r in out2} == {100, 103}

    import pytest as _pt

    with _pt.raises(ValueError):
        decontaminate_semantic(
            corpus, bench.filter("vec_id < 0"), threshold=0.5
        )


def test_decontaminate_semantic_string_benchmark_ids(spark):
    from fugue_warehouses_spark.extensions.similarity import (
        decontaminate_semantic,
    )

    bench = spark.createDataFrame(
        [("mmlu", [1.0, 0.0]), ("gsm8k", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(7, [2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # corpus ids long, benchmark ids string: nearest_benchmark must
    # carry the BENCHMARK id type
    out = decontaminate_semantic(
        corpus.withColumnRenamed("vec_id", "cid"),
        bench.withColumnRenamed("vec_id", "cid"),
        corpus_id="cid", threshold=0.5,
    ).collect()
    assert out[0].nearest_benchmark == "mmlu"
