"""Deterministic sampling for reproducible training-data pipelines.

``DataFrame.sample`` (engine.sample, SURVEY §2.A12) is seeded but
partition-layout dependent: the same seed over a repartitioned input
selects different rows, which is poison for dataset reproducibility.
The samplers here derive inclusion from a cryptographic hash of the
ROW KEY alone, so the sample is a pure function of the data — stable
across partitioning, cluster size, and engine (the DuckDB oracle
reproduces it bit-for-bit).

Scale design: stratified quota = one window rank per stratum (single
shuffle on the strata key); hash-threshold sampling is a narrow filter
(no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _key_hash(key_col: str) -> F.Column:
    """Lowercase md5 hex of the key's string form — identical in Spark
    (md5 over utf-8 bytes) and DuckDB (md5(varchar))."""
    return F.md5(F.col(key_col).cast("string").cast("binary"))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by ascending key-hash — a deterministic uniform
    draw without replacement, reproducible from the data alone."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    w = Window.partitionBy(*strata_cols).orderBy(_key_hash(key_col), F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def hash_threshold_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose key-hash falls below ``fraction`` of the hash
    space — a shuffle-free deterministic Bernoulli sample. The first 8
    hex chars of md5 give a uniform 32-bit draw."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    draw = F.conv(F.substring(_key_hash(key_col), 1, 8), 16, 10).cast("long")
    return df.filter(draw < F.lit(int(fraction * 2**32)))


def weighted_mixture(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-weighted corpus mixing: keep each domain's rows at its
    own deterministic rate — the dataset-mixture step of a pretraining
    pipeline (e.g. upweight wiki, downweight crawl), reproducible from
    the data alone. Domains absent from ``weights`` keep
    ``default_rate`` of their rows. Rates are capped at 1.0 (this
    samples; it does not replicate)."""
    for d, r in weights.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {d!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError("default_rate must be in [0, 1]")
    draw = F.conv(F.substring(_key_hash(key_col), 1, 8), 16, 10).cast("long")
    rate = F.lit(int(default_rate * 2**32))
    for d, r in weights.items():
        rate = F.when(F.col(domain_col) == d, F.lit(int(r * 2**32))).otherwise(rate)
    return df.filter(draw < rate)


def weighted_bernoulli_sample(
    df: DataFrame, key_col: str, weight_col: str, rate_per_unit: float
) -> DataFrame:
    """Per-row weighted sampling: keep probability = min(1, weight *
    rate_per_unit), decided by the key-hash draw — importance sampling
    with a continuous weight column (e.g. quality score, price), still
    a pure function of the data. Shuffle-free narrow filter.

    The threshold is floored to an integer in [0, 2^32] on BOTH
    engines (floor(x) is deterministic on doubles; CAST would round),
    so the kept row set is engine-exact.
    """
    if rate_per_unit <= 0:
        raise ValueError("rate_per_unit must be positive")
    draw = F.conv(F.substring(_key_hash(key_col), 1, 8), 16, 10).cast("long")
    thresh = F.floor(
        F.least(F.col(weight_col) * F.lit(rate_per_unit), F.lit(1.0))
        * F.lit(float(2**32))
    )
    return df.filter(draw < thresh)


def alpha_flatten_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture flattening (the multilingual
    "alpha-sampling" of mBERT/XLM-R and data-mixture work): keep each
    domain at rate ``(n_min / n_domain)^(1-alpha)`` — relative keep
    rates ∝ n^(alpha-1), so domain sizes after sampling ∝ n^alpha.
    ``alpha=1`` keeps everything (natural mixture), ``alpha=0`` would
    equalize all domains to the smallest, 0.5 is the common middle.
    The smallest domain anchors at rate 1 (this samples, never
    replicates).

    Inclusion is the same key-hash threshold as the other samplers —
    a pure function of the data — and the rate derivation stays IN the
    plan (counts aggregate + two broadcasts), no driver collect, so
    the whole thing is one narrow filter behind two tiny joins at any
    scale.

    Cross-engine exactness: for ``alpha=0.5`` the rate is
    ``sqrt(n_min/n)`` — integer division then sqrt, both correctly
    rounded under IEEE-754, so the kept row set is bit-identical in
    the DuckDB oracle. Other alphas go through ``pow``, which may
    differ by 1 ulp across libm implementations (a ~2^-20 per-domain
    chance of one boundary row flipping); prefer 0.5 when the sample
    must be oracle-exact.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("alpha must be in [0, 1]")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("__n").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    # null-safe domain join: a NULL domain is a domain like any other
    # (groupBy already counts it); a plain equi-join would silently
    # drop its rows while its count still set __nmin
    renamed = counts.withColumnRenamed(domain_col, "__dom")
    with_rate = (
        df.join(
            F.broadcast(renamed),
            df[domain_col].eqNullSafe(renamed["__dom"]),
        )
        .drop("__dom")
        .join(F.broadcast(nmin))
        .withColumn("__thresh", F.floor(rate * F.lit(float(2**32))))
    )
    draw = F.conv(F.substring(_key_hash(key_col), 1, 8), 16, 10).cast("long")
    return with_rate.filter(draw < F.col("__thresh")).drop(
        "__n", "__nmin", "__thresh"
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epochs: int,
    epoch_col: str = "epoch",
    position_col: str = "position",
) -> DataFrame:
    """Deterministic per-epoch training-data shuffle: every epoch gets
    its own full pass over the rows in a pseudo-random order that is a
    pure function of (key, epoch) — reproducible across runs, engines
    and cluster sizes, with no RNG state to ship.

    ``key_col`` must be unique per row (it is both the draw seed and
    the sort tiebreaker): duplicate keys would draw identical
    positions-neighbors whose relative order falls to physical row
    order — not reproducible. Positions come from
    ``operators/rank.add_global_rank`` over (epoch, md5-draw, key) — range partitioning plus per-partition
    offsets, NEVER a global (or per-epoch, which at 2-16 epochs is the
    same thing) window sort: shuffling 100 TB per epoch is exactly the
    workload where a partition-less ntile/row_number melts one task.
    Epoch offsets (#epochs ints) rebase the global rank to a 1-based
    position within each epoch. Writers typically follow with
    ``repartitionByRange(position)`` per epoch, which this ordering
    already provides.

    Cost: one explode (x epochs) + the rank operator's single range
    shuffle + two tiny collects (#partitions + #epochs ints).
    """
    from fugue_warehouses_spark.operators.rank import add_global_rank

    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    with_epoch = df.withColumn(
        epoch_col, F.explode(F.array(*[F.lit(e) for e in range(epochs)]))
    )
    # draw = first 8 md5 hex chars of "<key>:<epoch>" — matches the
    # module's engine-reproducible uniform-draw convention
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"),
                    F.lit(":"),
                    F.col(epoch_col).cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    keyed = with_epoch.withColumn("__draw", draw)
    ranked, total = add_global_rank(
        keyed, [epoch_col, "__draw", key_col], rank_col="__grank"
    )
    # every epoch holds the SAME n rows and epoch blocks are contiguous
    # in the (epoch, draw, key) total order, so the per-epoch offset is
    # just epoch * n — no extra counting job, no offset join
    n = total // epochs
    return ranked.withColumn(
        position_col,
        F.col("__grank") - F.col(epoch_col).cast("long") * F.lit(n),
    ).drop("__draw", "__grank")


def _hashed_tokens(
    df: DataFrame, text_col: str, n_buckets: int, *cols, ngram_max: int = 1
):
    """Whitespace n-grams of ``text_col`` (orders 1..``ngram_max``,
    joined by one space) hashed into ``n_buckets`` feature buckets
    (the hashing trick): bucket = first 8 md5 hex chars of the n-gram
    as a 32-bit integer, mod n_buckets — the same engine-reproducible
    draw convention as the module's samplers, so a SQL oracle rebuilds
    the exact feature space (bigrams: ``toks[i-1] || ' ' || toks[i]``
    over ``generate_series``)."""
    if ngram_max < 1:
        raise ValueError("ngram_max must be >= 1")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    grams = toks
    prev = toks
    for order in range(2, ngram_max + 1):
        # order-k grams from the (k-1)-gram array by offset pairing:
        # gram ending at 1-based position i = prev gram ending at i-1
        # + " " + token i, i.e. zip_with over two aligned slices. The
        # earlier per-index formulation (F.transform over a sequence
        # with F.get(toks, ...) inside the lambda) inlined the WHOLE
        # split+filter expression per gram element — O(tokens²) text
        # re-splitting per document, measured 5.8x slower at sf0.1
        # (7.5 s vs 1.3 s for the bigram facet). slice/zip_with
        # evaluate each child array once per reference, so the split
        # runs a small constant number of times per row. Guarded:
        # a doc shorter than the order yields an empty gram list
        # (F.when branches evaluate lazily, so the slices never see a
        # non-positive length).
        cnt = F.size(toks) - F.lit(order - 1)
        gk = F.when(
            F.size(toks) >= order,
            F.zip_with(
                F.slice(prev, 1, cnt),
                F.slice(toks, order, cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(grams, gk)
        prev = gk
    out = df.select(*cols, F.explode(grams).alias("__tok"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("__tok").cast("binary")), 1, 8), 16, 10
        ).cast("long")
        % n_buckets
    ).alias("__b")
    return out.select(*cols, bucket)


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    key_col: str,
    n_buckets: int = 4096,
    ngram_max: int = 1,
) -> DataFrame:
    """Per-document DSIR importance weights (Data Selection via
    Importance Resampling, Xie et al. 2023): score each raw document
    by how much more likely its hashed bag-of-tokens is under the
    TARGET distribution than under the RAW distribution —
    ``log w(d) = Σ_b count_d[b] · (log p_target[b] − log p_raw[b])``
    with add-one smoothing over ``n_buckets`` hashed feature buckets.
    ``ngram_max=2`` hashes unigrams AND bigrams (the paper's canonical
    feature set); the default 1 keeps the unigram space the facet
    oracle mirrors.
    Output: (key_col, dsir_logw), one row per raw document that has at
    least one token (an empty/whitespace-only document has no feature
    mass and is excluded — it cannot be scored).

    Scale shape: ONE wordcount-style aggregation over the tagged
    union of raw and target token streams reduces to ≤ ``n_buckets``
    rows (the canonical map-side-combine shape — partial sums collapse
    each map task to ≤ n_buckets rows before the shuffle); the
    per-bucket log-ratio table (≤ 4096 rows) broadcasts back onto the
    per-(doc, bucket) counts, and one groupBy(key) sum produces the
    weights. No UDFs, no collects: at 100 TB this is one wordcount
    plus one per-doc aggregation.

    Cross-engine exactness: bucket counts and totals are exact
    integers; each smoothing factor is cast to double individually
    (exact below 2^53 — int64 PRODUCTS would wrap silently in Spark at
    web-corpus token totals), the multiply/divide chain is correctly
    rounded identically on both engines, then one ``ln`` (≤ 1 ulp
    apart); weights are compared after 6-dp rounding downstream, which
    absorbs both the ulp and double-sum association differences (same
    standard as quality.unigram_surprisal).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from fugue_warehouses_spark.plans.scanout import fan_out_scan

    # fan out BOTH token streams before the gram explode (round 12,
    # guide §2.5): the split + n-gram build + md5 bucket hash per gram
    # is the dominant compute of this operator, and a single-row-group
    # input runs all of it serially in the scan stage — profiled 9
    # stages / 10-12 TASKS for the dsir facets at sf0.1 (one core busy,
    # 31 idle). The keyed repartition is a no-op at real scan
    # parallelism; the target side (no id column) fans out on the text
    # itself — any deterministic spread works, placement can't change
    # an aggregation's result.
    tr = _hashed_tokens(
        fan_out_scan(raw, key_col), text_col, n_buckets, F.col(key_col),
        ngram_max=ngram_max,
    )
    tt = _hashed_tokens(
        fan_out_scan(target, text_col), text_col, n_buckets,
        ngram_max=ngram_max,
    )
    # the per-(doc, bucket) counts are needed for scoring anyway, so
    # the raw text is tokenized exactly ONCE: raw bucket totals roll
    # up from perdoc rather than from a second pass over the corpus.
    # lazy localCheckpoint (round 11, guide §1.2 "fewer passes"):
    # perdoc feeds TWO plan branches (the bucket-total rollup and the
    # final per-doc weight join) — without it the regex split + n-gram
    # build + explode + first aggregate re-ran once per branch. The
    # checkpoint holds (key, bucket, count) int triples — the narrow
    # proxy rows of the guide's §8 pattern, a small fraction of the
    # text bytes they summarize. Lazy is SAFE here (unlike cb below):
    # cb's EAGER checkpoint materializes perdoc as part of its own
    # sequential job, so no two concurrent jobs ever race to
    # materialize it.
    perdoc = (
        tr.groupBy(key_col, "__b")
        .agg(F.count("*").alias("__n"))
        .localCheckpoint(eager=False)
    )
    # ONE tagged-union wordcount instead of two counts + a full-outer
    # bucket join: same <= n_buckets result, one shuffle, no join
    cb = (
        perdoc.select(
            "__b",
            F.col("__n").alias("__one_r"),
            F.lit(0).cast("long").alias("__one_t"),
        )
        .unionAll(
            tt.select(
                "__b",
                F.lit(0).cast("long").alias("__one_r"),
                F.lit(1).cast("long").alias("__one_t"),
            )
        )
        .groupBy("__b")
        .agg(
            F.sum("__one_r").alias("__cr"), F.sum("__one_t").alias("__ct")
        )
    )
    # EAGER localCheckpoint (round 12, ADVICE r11): cb is read by TWO
    # branches — the totals aggregate that feeds a BroadcastExchange
    # (built on a separate scheduler thread) and the stream-side
    # log-ratio projection — so a LAZY checkpoint would be
    # materialized by two CONCURRENT jobs, the exact race
    # retrieval.py's eager-checkpoint comment documents as emitting
    # spurious 'non-existent accumulator' scheduler errors. Eager
    # materialization here also pins perdoc (its upstream lazy
    # checkpoint materializes as part of this job), so every later
    # branch — broadcast or stream — reads finished blocks. cb is
    # BOUNDED at n_buckets (<= 4096) rows, so the extra job is tiny
    # relative to the corpus tokenization it seals.
    cb = cb.localCheckpoint()
    tot = cb.agg(
        F.sum("__cr").alias("__totr"), F.sum("__ct").alias("__tott")
    )
    # each integer FACTOR is cast to double BEFORE the multiply (both
    # engines): int64 products like (ct+1)*(totr+B) overflow past
    # 2^63 at web-corpus token totals — Spark's non-ANSI long multiply
    # would wrap silently while DuckDB's checked BIGINT errors, i.e.
    # garbage weights AND engine divergence (round-9 review). Double
    # factors are exact below 2^53 and the multiply/divide are
    # correctly rounded identically on both engines; then one ln.
    lr = cb.crossJoin(F.broadcast(tot)).select(
        "__b",
        F.log(
            (F.col("__ct") + 1).cast("double")
            * (F.col("__totr") + n_buckets).cast("double")
            / (
                (F.col("__cr") + 1).cast("double")
                * (F.col("__tott") + n_buckets).cast("double")
            )
        ).alias("__lr"),
    )
    return perdoc.join(F.broadcast(lr), "__b").groupBy(key_col).agg(
        F.sum(F.col("__n") * F.col("__lr")).alias("dsir_logw")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    key_col: str,
    n_select: int,
    n_buckets: int = 4096,
    salt: str = "dsir",
    ngram_max: int = 1,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): resample ``n_select``
    raw documents toward the target distribution by Gumbel top-k over
    the :func:`dsir_importance` weights — ``sel_key = dsir_logw + g``
    where ``g = −ln(−ln(u))`` and ``u`` is the module's deterministic
    md5 uniform draw of ``"<key>:<salt>"``. Gumbel top-k IS sampling
    without replacement proportional to ``w`` (the Gumbel-max trick),
    so the selection is a true importance resample, yet a pure
    function of the data — reproducible across partitioning, cluster
    size, and engine.

    Output: (key_col, dsir_logw, sel_key), the ``n_select`` rows with
    the largest ``sel_key`` (ties broken by ``key_col`` ascending);
    both doubles 6-dp rounded, and the ORDERING uses the rounded key,
    so the selected SET is engine-exact. Join back to the corpus on
    ``key_col`` for payload columns (the result is tiny — broadcast).

    Scale shape: everything in :func:`dsir_importance` plus one
    TakeOrdered (per-partition top-k, no global sort) — the standard
    Spark top-k physical plan.
    """
    if n_select < 1:
        raise ValueError("n_select must be >= 1")
    w = dsir_importance(
        raw, target, text_col, key_col, n_buckets, ngram_max=ngram_max
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"), F.lit(":" + salt)
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (draw + F.lit(0.5)) / F.lit(float(2**32))
    sel_key = F.round(F.col("dsir_logw") - F.log(-F.log(u)), 6)
    return (
        w.select(
            key_col,
            F.round("dsir_logw", 6).alias("dsir_logw"),
            sel_key.alias("sel_key"),
        )
        .orderBy(F.col("sel_key").desc(), F.col(key_col).asc())
        .limit(n_select)
    )
