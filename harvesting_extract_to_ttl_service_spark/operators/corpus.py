"""Training-corpus construction operators — deterministic stratified
sampling, temperature-based data mixing, shard assignment, and
concatenate-and-chunk sequence packing (SURVEY.md §2C extension surface;
no reference counterpart — the reference is an ETL service, these are the
operations a large-scale LLM training-data pipeline runs AFTER extraction
and dedup to turn a cleaned corpus into training shards).

Design for 100 TB:
  * every sampling/sharding decision is a pure function of (id, salt) via
    an md5-derived hash fraction — no RNG state, no seed plumbing, no
    driver coordination; re-running the job on any cluster layout yields
    the same sample (and the DuckDB oracle can recompute membership
    bit-for-bit, unlike `df.sample`/`rand()`);
  * per-stratum statistics (counts for rates, softmax-ish weights) are one
    tiny aggregate (rows = number of strata) broadcast back — the corpus
    itself is touched by exactly one scan-and-filter pass;
  * packing is a per-shard window cumsum: each shard's documents shuffle
    once to their shard partition, then the running-offset/bin assignment
    is a single window over (shard) — no global sort, no driver loop.

Cross-engine float determinism: the one place floating-point ADDITION
ORDER could diverge between engines (the mixture-weight denominator, a sum
of pow() terms across strata) is computed by folding a lang-sorted array,
not by an unordered SQL SUM — both engines add in the same order, so the
shares are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.text import token_count

# 2^32 as a float divisor: an 8-hex-char md5 prefix is < 2^32, and any
# such integer divided by 2^32 is exactly representable in a double
# (<= 32 significant bits), so the fraction is bit-identical across
# engines.
_HASH_SPACE = float(1 << 32)


def hash_fraction(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform fraction in [0, 1): first 8 hex chars of
    md5(key || ':' || salt) as an integer over 2^32. The salt decouples
    independent decisions on the same key (sample vs shard vs holdout) —
    same engine-portable md5 trick as the dedup hash family
    (operators/dedup.py `_portable_hash32`)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8),
        16, 10).cast("long")
    return h / F.lit(_HASH_SPACE)


def hash_fraction_sql(key_expr: str, salt: str = "sample") -> str:
    """DuckDB twin of :func:`hash_fraction` (same bytes, same double)."""
    return (f"CAST(concat('0x', substr(md5(concat(CAST({key_expr} AS VARCHAR),"
            f" ':{salt}')), 1, 8)) AS BIGINT) / {_HASH_SPACE}")


def stratified_sample(df: DataFrame, rates: dict[str, float] | DataFrame,
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Keep each row with its stratum's probability, decided by the row's
    deterministic hash fraction. ``rates`` maps stratum value → keep rate
    (missing strata keep nothing).

    Two rate-lookup forms, same semantics:
      * dict — inlined as a literal CASE chain: one scan, no shuffle, the
        right shape for a handful of strata (languages). The chain is
        O(|strata|) expression nodes, so a 10k-stratum domain map would
        blow up planning time;
      * DataFrame with columns ``(strata_col, rate)`` — broadcast hash
        join against the scan: still map-side (the rates table is
        strata-sized), but the lookup is a hash probe independent of the
        stratum count. Use this form for large strata domains — the same
        shape :func:`capped_stratified_sample` uses for its computed
        rates."""
    if isinstance(rates, DataFrame):
        if set(rates.columns) != {strata_col, "rate"}:
            raise ValueError(
                f"rates DataFrame must have columns ({strata_col!r}, "
                f"'rate'), got {rates.columns}")
        # a duplicate stratum key would silently DUPLICATE every row of
        # that stratum through the join (a sampler must never multiply
        # rows). Validated IN-PLAN — a window count over the strata-sized
        # table, evaluated once when the broadcast is built — not by an
        # eager driver collect, which would execute the rates LINEAGE a
        # second full time at call time (the documented large-domain use
        # computes rates from a corpus-scale aggregate) and make a lazy
        # plan-builder eager. The violation raises at action time.
        wdup = Window.partitionBy(strata_col)
        keyed = rates.select(
            strata_col,
            F.when(
                F.count("*").over(wdup) > 1,
                F.raise_error(F.concat(
                    F.lit(f"stratified_sample: duplicate {strata_col!r} "
                          f"key '"),
                    F.col(strata_col).cast("string"),
                    F.lit("' in the rates DataFrame — the rate join "
                          "would duplicate that stratum's rows"))
                ).cast("double"))
            .otherwise(F.col("rate")).alias("_rate"))
        return (
            df.join(F.broadcast(keyed), strata_col)
            .filter(hash_fraction(F.col(id_col), salt) < F.col("_rate"))
            .drop("_rate")
            .select(*df.columns)
        )
    rate = F.lit(None).cast("double")
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_fraction(F.col(id_col), salt)
                     < F.coalesce(rate, F.lit(0.0)))


def capped_stratified_sample(df: DataFrame, cap: int,
                             strata_col: str = "lang",
                             id_col: str = "doc_id",
                             salt: str = "sample") -> DataFrame:
    """Downsample over-represented strata toward an expected ``cap`` rows
    per stratum: rate_s = min(1, cap / n_s). The per-stratum counts are a
    tiny aggregate (rows = strata) broadcast back onto the scan; at
    warehouse scale pass precomputed counts through
    :func:`stratified_sample` instead and skip the extra pass."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    rates = counts.select(
        strata_col,
        F.least(F.lit(1.0), F.lit(float(cap)) / F.col("_n")).alias("_rate"))
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_fraction(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def score_weighted_sample(df: DataFrame, score_col: str,
                          gamma: float = 1.0, floor: float = 0.0,
                          id_col: str = "doc_id",
                          salt: str = "wsample") -> DataFrame:
    """Quality-weighted sampling: keep each row with probability
    ``floor + (1 - floor) · clamp01(score)^gamma`` — the
    keep-the-good-docs-more-often sampler of quality-classifier corpus
    construction (a high-quality doc survives ~always, a zero-scored
    doc survives at the exploration ``floor``). ``gamma > 1`` sharpens
    the preference, ``gamma < 1`` flattens it.

    Membership is the package's deterministic hash fraction of the id —
    reproducible across runs/engines, one filter expression on the
    scan, no shuffle, no RNG state. Composes with the other samplers
    (each uses its own salt, so decisions stay independent).

    NULL scores coalesce to 0.0: an unscored document survives at the
    exploration ``floor`` rather than silently vanishing (a NULL rate
    would fail the filter comparison and drop the row — the one
    outcome a sampler must never produce implicitly)."""
    s = F.least(F.lit(1.0), F.greatest(
        F.lit(0.0), F.coalesce(F.col(score_col).cast("double"),
                               F.lit(0.0))))
    rate = (F.lit(float(floor))
            + F.lit(1.0 - float(floor)) * F.pow(s, F.lit(float(gamma))))
    return df.filter(hash_fraction(F.col(id_col), salt) < rate)


def temperature_mixture(df: DataFrame, strata_col: str = "lang",
                        text_col: str = "text", alpha: float = 0.5,
                        budget_tokens: int = 1_000_000,
                        count_col: str | None = None) -> DataFrame:
    """Per-stratum token-budget allocation with temperature ``alpha``
    (multilingual-sampling tradition: share_s ∝ n_s^alpha; alpha=1 is
    proportional, alpha→0 is uniform). Returns one row per stratum with
    document/token counts, the normalized share, and the allocated token
    budget.

    The denominator Σ n_s^alpha is folded over a stratum-sorted array so
    both engines add the pow() terms in the same order (see module
    docstring); everything else is integer arithmetic until the final
    division.

    ``count_col`` switches the token unit from the whitespace count of
    ``text_col`` to a PRECOMPUTED per-document count column — pass the
    output of functions/tokenizer.bpe_token_count to budget in the
    TRAINING tokenizer's units (one upstream Arrow pass; every
    downstream budget stage then agrees on the unit)."""
    toks = (F.col(count_col) if count_col is not None
            else token_count(F.col(text_col)))
    counts = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("n_tokens"))
    w = counts.withColumn(
        "_w", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))))
    denom = (
        w.select(F.sort_array(F.collect_list(
            F.struct(F.col(strata_col).alias("s"), F.col("_w").alias("w"))))
            .alias("a"))
        .select(F.aggregate(
            "a", F.lit(0.0), lambda acc, x: acc + x.getField("w"))
            .alias("_denom"))
    )
    return (
        w.crossJoin(F.broadcast(denom))
        .select(
            strata_col, "n_docs", "n_tokens",
            F.round(F.col("_w") / F.col("_denom"), 6).alias("share"),
            F.round(F.lit(float(budget_tokens)) * F.col("_w")
                    / F.col("_denom"), 0).alias("alloc_tokens"))
    )


def temperature_sample(df: DataFrame, strata_col: str = "lang",
                       text_col: str = "text", id_col: str = "doc_id",
                       alpha: float = 0.5,
                       budget_tokens: int = 1_000_000,
                       salt: str = "tsample",
                       count_col: str | None = None) -> DataFrame:
    """The sampler that REALIZES :func:`temperature_mixture`'s
    allocation: per stratum, keep each document with probability
    alloc_tokens_s / n_tokens_s (clamped at 1), so the kept corpus's
    expected per-stratum token mass matches the temperature-``alpha``
    budget split. Membership is the deterministic
    :func:`hash_fraction` of the doc id — reproducible across runs and
    engines, no ``rand()``.

    Rate-based (expected-value budget), not an exact token-prefix cut:
    an exact cut needs a per-stratum ordered cumulative sum — one
    window task per stratum, which a 100 TB stratum turns into a
    straggler — while the rate filter is a broadcast join plus a
    per-row hash compare at scan speed. At corpus scale the relative
    deviation from the target budget is O(1/√n_docs); for an exact cut
    on small strata, sort the survivors and trim.

    Returns the sampled rows of ``df`` (original columns).
    ``count_col``: see :func:`temperature_mixture`."""
    mix = temperature_mixture(df, strata_col, text_col, alpha,
                              budget_tokens, count_col)
    # n_tokens = 0 (a stratum whose documents ALL tokenize empty) would
    # make the rate NULL (Spark division by zero) and the hash compare
    # silently false — pin that to an explicit keep-nothing 0.0: the
    # stratum cannot contribute tokens to the budget, so realizing its
    # allocation as zero documents is the honest outcome (DuckDB's
    # NULL-division oracle filters the same rows).
    rates = mix.select(
        strata_col,
        F.when(F.col("n_tokens") <= 0, F.lit(0.0))
        .otherwise(F.least(F.lit(1.0),
                           F.col("alloc_tokens") / F.col("n_tokens")))
        .alias("_rate"))
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_fraction(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
        .select(*df.columns)
    )


def temperature_sample_exact(df: DataFrame, strata_col: str = "lang",
                             text_col: str = "text",
                             id_col: str = "doc_id", alpha: float = 0.5,
                             budget_tokens: int = 1_000_000,
                             salt: str = "tsample",
                             count_col: str | None = None) -> DataFrame:
    """The EXACT token-prefix cut :func:`temperature_sample`'s docstring
    delegates for small strata: instead of realizing the per-stratum
    allocation as an expected-value keep RATE, order each stratum's
    documents by their hash fraction (ties broken by id — a total,
    deterministic, engine-portable order) and keep the prefix whose
    token mass fits the allocation. A document is kept iff the tokens
    BEFORE it in its stratum's order leave room (``cum - n_tokens <
    alloc``), so the kept mass overshoots by at most the last document —
    the per-stratum budget deviation is O(1 document), not O(√n).

    Scale caveat (why the rate sampler is still the 100 TB default):
    the running token sum is one ordered window PER STRATUM — a single
    sort task per stratum, which a 100 TB stratum turns into a
    straggler. Use this form where exactness matters and strata are
    small: final trims after :func:`capped_stratified_sample`, eval-set
    carving, per-language budget reconciliation.

    Returns the kept rows of ``df`` (original columns)."""
    mix = temperature_mixture(df, strata_col, text_col, alpha,
                              budget_tokens, count_col)
    allocs = mix.select(strata_col, "alloc_tokens")
    w = (Window.partitionBy(strata_col)
         .orderBy(hash_fraction(F.col(id_col), salt), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("_nt", F.col(count_col) if count_col is not None
                      else token_count(F.col(text_col)))
        .withColumn("_cum", F.sum("_nt").over(w))
        .join(F.broadcast(allocs), strata_col)
        .filter(F.col("_cum") - F.col("_nt") < F.col("alloc_tokens"))
        .select(*df.columns)
    )


def assign_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  salt: str = "shard") -> DataFrame:
    """Deterministic shard assignment: shard = hash32(id||salt) mod
    n_shards. Content-addressed (stable across runs and engines), unlike
    `pmod(hash(...))` whose murmur seed is Spark-private. Adds a
    ``shard`` int column; write with ``partitionBy('shard')`` for
    reproducible training shards."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(":" + salt))), 1, 8),
        16, 10).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def score_buckets(df: DataFrame, n_buckets: int = 4,
                  score_col: str = "avg_logprob",
                  bucket_col: str = "bucket",
                  exact: bool = True) -> DataFrame:
    """Curriculum / quality-ablation bucketing: split the corpus into
    ``n_buckets`` equal-population tiers of a continuous score (the
    unigram-LM log-prob, an embedding distance, a classifier logit...).
    The standard ablation/curriculum primitive — train on the top tier,
    schedule tiers easy→hard, or A/B a tier's marginal value.

    Scale shape: ONE tiny aggregation computes the n_buckets-1 quantile
    thresholds (collected to the driver — a bounded, fixed-size collect
    of doubles), then the bucket is a pure column expression counting
    thresholds at or below the row's score: no window over the corpus,
    no global sort, no join. ``exact=False`` swaps the threshold
    aggregate to t-digest ``approx_percentile`` for the 100 TB path
    (same downstream expression, no oracle guarantee).

    Determinism note: thresholds and scores are rounded to 6 decimals
    before comparison so both engines bucket identical values (the same
    convention the LM member uses). NULL scores get a NULL bucket.
    Buckets are 0 (lowest scores) .. n_buckets-1 (highest)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets={n_buckets}: need at least 2")
    qf = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(10000)))
    ps = [i / n_buckets for i in range(1, n_buckets)]
    score = F.round(F.col(score_col), 6)
    row = df.select(*[
        F.round(qf(score, F.lit(p)).cast("double"), 6).alias(f"t{i}")
        for i, p in enumerate(ps)]).first()
    thresholds = [row[i] for i in range(len(ps))]
    b = None
    for t in thresholds:
        ind = (score >= F.lit(float(t))).cast("int")
        b = ind if b is None else b + ind
    return df.withColumn(
        bucket_col, F.when(F.col(score_col).isNull(), F.lit(None)
                           .cast("int")).otherwise(b))


def split_bounds(weights: dict[str, float]) -> list[tuple[str, float]]:
    """Cumulative upper bounds for :func:`assign_split`'s CASE chain, in
    ``weights``' insertion order. Exposed so an oracle can embed the SAME
    Python-float bounds (0.8 + 0.1 is 0.9000000000000001 — re-deriving
    the cumsum in SQL would disagree on the boundary hash fractions)."""
    total = sum(weights.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split weights sum to {total}, expected 1")
    out, cum = [], 0.0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative split weight {name}={w}")
        cum += w
        out.append((name, cum))
    return out


def assign_split(df: DataFrame, weights: dict[str, float],
                 key_col: str = "doc_id", salt: str = "split",
                 split_col: str = "split") -> DataFrame:
    """Deterministic train/validation/test split: the row's hash fraction
    of ``key_col`` lands in cumulative ``weights`` ranges (insertion
    order). Pure per-row function — no sampling state, rerun-stable,
    engine-portable (the oracle recomputes membership bit-for-bit), and
    every row lands in exactly one split (the last split absorbs the
    remaining range, so float dust cannot orphan a row).

    NOTE: splitting by document id LEAKS near-duplicates across splits —
    a train doc's near-copy in the holdout set inflates eval. Use
    :func:`split_by_component` for the leakage-safe form."""
    bounds = split_bounds(weights)
    frac = hash_fraction(F.col(key_col), salt)
    expr = None
    for name, cum in bounds[:-1]:
        cond = frac < F.lit(cum)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(bounds[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_by_component(df: DataFrame, pairs: DataFrame,
                       weights: dict[str, float], id_col: str = "doc_id",
                       salt: str = "split", split_col: str = "split",
                       max_iter: int = 20) -> DataFrame:
    """Leakage-safe corpus split: hash the duplicate-cluster
    REPRESENTATIVE, not the document id, so every member of a near-dup
    cluster lands in the same split — the eval-integrity requirement a
    plain id-hash split silently violates (a held-out document whose
    near-copy trains is contamination by construction). ``pairs`` is any
    near-dup pair generator's output (``id_a``/``id_b`` —
    MinHash-LSH, SimHash, embedding-LSH, SemDeDup cells...).

    Scale shape: connected components over the pair graph (hash-to-min,
    O(diameter) rounds over the pair set — pairs, not the corpus), then
    ONE co-partitioned equi-join on id to attach labels, then the same
    pure CASE chain as :func:`assign_split` keyed on ``component``.
    Singletons are their own representative, so for them the assignment
    is literally ``assign_split`` on the id — adding a pair generator
    only MOVES cluster members between splits, never reshuffles the
    unaffected corpus.

    Returns ``df`` plus ``component`` (lineage) and ``split_col``."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(
        pairs.select("id_a", "id_b"),
        df.select(F.col(id_col).alias("id")), max_iter=max_iter)
    labeled = df.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col)
    return assign_split(labeled, weights, key_col="component", salt=salt,
                        split_col=split_col)


def epoch_shuffle(df: DataFrame, epoch: int, id_col: str = "doc_id",
                  salt: str = "epoch",
                  key_col: str = "shuffle_key") -> DataFrame:
    """Seeded deterministic global shuffle — the per-epoch document
    reordering every pretraining run needs: training order must be
    random-looking, DIFFERENT each epoch, and exactly reproducible for
    restarts/audits. Appends ``key_col`` = md5 hash fraction of
    ``(id, '{salt}{epoch}')``; ordering by ``(key_col, id)`` IS the
    shuffled order. No data moves here — the key is a pure column
    expression; the one shuffle happens where the order is consumed
    (:func:`write_training_shards` ``order_col=``, whose shard
    repartition it shares). Distinct epochs give independent orders
    (the salt decouples them, same trick as sample-vs-shard); the
    DuckDB oracle recomputes the key bit-for-bit
    (:func:`hash_fraction_sql`)."""
    return df.withColumn(
        key_col, hash_fraction(F.col(id_col), f"{salt}{epoch}"))


def _pack_columns(df: DataFrame, budget_tokens: int, shard_col: str,
                  text_col: str, id_col: str,
                  order_col: str | None = None,
                  count_col: str | None = None) -> DataFrame:
    """All of ``df``'s columns plus the packing columns (n_tokens,
    start_offset, chunk) — one window cumsum per shard. ``order_col``
    prepends a concatenation-order key (e.g. :func:`epoch_shuffle`'s)
    ahead of the ``id_col`` tiebreak. ``count_col``: a precomputed
    per-document token count to pack by (trained-tokenizer units — see
    :func:`temperature_mixture`)."""
    toks = (F.col(count_col) if count_col is not None
            else token_count(F.col(text_col)))
    order = [order_col, id_col] if order_col is not None else [id_col]
    w = (Window.partitionBy(shard_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(toks).over(w), F.lit(0).cast("long"))
    return df.select(
        *df.columns,
        toks.alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / F.lit(budget_tokens)).alias("chunk"))


def pack_chunks(df: DataFrame, budget_tokens: int,
                shard_col: str = "shard", text_col: str = "text",
                id_col: str = "doc_id",
                order_col: str | None = None,
                count_col: str | None = None,
                keep: tuple[str, ...] = ()) -> DataFrame:
    """Concatenate-and-chunk packing: within each shard, documents are
    concatenated in id order and the token stream is cut into
    ``budget_tokens``-sized context windows; a document belongs to the
    chunk where it STARTS (chunk = floor(start_offset / budget)). This is
    the packing pretraining loaders actually use — deterministic, order-
    defined, and a single window cumsum per shard (the shard is the window
    partition, so no global sort). ``order_col`` (e.g.
    :func:`epoch_shuffle`'s key) replaces id order with a seeded shuffled
    concatenation order — same plan shape, same single window.

    Returns (shard, chunk, start_offset) per document plus its token
    count. ``count_col``: see :func:`temperature_mixture`. ``keep``
    appends pass-through columns from ``df`` (e.g. a ``bpe_ids`` array
    riding next to its packing coordinates)."""
    return _pack_columns(df, budget_tokens, shard_col, text_col,
                         id_col, order_col, count_col).select(
        F.col(shard_col), F.col(id_col), "n_tokens", "start_offset",
        "chunk", *keep)


def write_training_shards(df: DataFrame, out_dir: str, n_shards: int,
                          budget_tokens: int, text_col: str = "text",
                          id_col: str = "doc_id",
                          salt: str = "shard",
                          shuffle_epoch: int | None = None,
                          count_col: str | None = None) -> None:
    """The corpus stage's deliverable: shard-partitioned parquet training
    shards, each shard's rows sorted in concatenation order so a loader
    streams the concatenate-and-chunk token stream with a plain file
    read — no sort at load time.

    ``shuffle_epoch`` switches the concatenation order from id order to
    the seeded per-epoch shuffled order (:func:`epoch_shuffle`): the
    written rows carry the ``shuffle_key`` and sort by (chunk, key, id),
    so each epoch's artifact is an independently-shuffled, exactly
    reproducible cut — at no extra cost (the shuffle key rides the one
    existing shard repartition; the window and within-partition sort
    just use it).

    Layout: ``out_dir/shard=<k>/`` with every row carrying its packing
    coordinates (n_tokens, start_offset, chunk). One shuffle total: the
    repartition ON THE SHARD COLUMN both co-locates each shard's rows in
    one task (one file per shard directory, no small-files spray) and
    feeds the same-keyed window, and the sort is within-partition only —
    there is no global sort at any scale."""
    if shuffle_epoch is not None:
        df = epoch_shuffle(df, shuffle_epoch, id_col)
    order_col = "shuffle_key" if shuffle_epoch is not None else None
    sharded = (assign_shards(df, n_shards, id_col, salt)
               .repartition(n_shards, F.col("shard")))
    # repartition BEFORE the window: the window's required clustering on
    # `shard` is already satisfied, so Catalyst adds no second exchange —
    # the plan has exactly one shuffle (pinned by test).
    packed = _pack_columns(sharded, budget_tokens, "shard", text_col,
                           id_col, order_col, count_col)
    sort_cols = (["shard", "chunk"]
                 + ([order_col] if order_col is not None else [])
                 + [id_col])
    (packed
     .sortWithinPartitions(*sort_cols)
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))


def write_shard_manifest(spark, out_dir: str, budget_tokens: int,
                         shuffle_epoch: int | None = None,
                         extra: dict | None = None) -> dict:
    """Write ``_shards_manifest.json`` next to a
    :func:`write_training_shards` artifact: the packing config plus
    per-shard document/token/chunk counts — the integrity contract a
    loader checks before training (a missing shard directory or a
    partial rewrite is silent otherwise: parquet reads whatever files
    exist). One scan of the just-written artifact, aggregated to
    shard-level rows (a bounded driver collect of n_shards rows).
    ``extra`` merges additional artifact-level keys into the manifest
    (e.g. the token-id writer's separator convention) — the integrity
    check ignores them, loaders read them. Returns the manifest
    dict."""
    import json

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    rows = (spark.read.parquet(out_dir)
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 (F.max("chunk") + 1).alias("n_chunks"))
            .collect())
    manifest = {
        "budget_tokens": budget_tokens,
        "shuffle_epoch": shuffle_epoch,
        "n_shards": len(rows),
        "shards": {str(r.shard): {"n_docs": r.n_docs,
                                  "n_tokens": int(r.n_tokens),
                                  "n_chunks": int(r.n_chunks)}
                   for r in sorted(rows, key=lambda r: r.shard)},
        **(extra or {}),
    }
    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{out_dir}/_shards_manifest.json")
    out = fs.create(jpath, True)
    try:
        out.write(json.dumps(manifest).encode())
    finally:
        out.close()
    return manifest


def check_shard_manifest(spark, out_dir: str) -> dict:
    """Loader-side integrity check: re-aggregate the artifact and
    compare against ``_shards_manifest.json``; raises on any mismatch
    (missing shard dir, partial rewrite, wrong artifact) and returns
    the verified manifest. Cost: one scan of the shard coordinates
    (column-pruned — no text column is read)."""
    import json

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{out_dir}/_shards_manifest.json")
    if not fs.exists(jpath):
        raise ValueError(f"no _shards_manifest.json under {out_dir} — "
                         f"not a manifested shard artifact")
    stream = fs.open(jpath)
    try:
        buf = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
        data = []
        line = buf.readLine()
        while line is not None:
            data.append(line)
            line = buf.readLine()
    finally:
        stream.close()
    want = json.loads("\n".join(data))
    have = {
        str(r.shard): {"n_docs": r.n_docs, "n_tokens": int(r.n_tokens),
                       "n_chunks": int(r.n_chunks)}
        for r in (spark.read.parquet(out_dir)
                  .groupBy("shard")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_tokens").alias("n_tokens"),
                       (F.max("chunk") + 1).alias("n_chunks"))
                  .collect())
    }
    if have != want["shards"]:
        missing = sorted(set(want["shards"]) - set(have))
        changed = sorted(k for k in set(want["shards"]) & set(have)
                         if want["shards"][k] != have[k])
        raise ValueError(
            f"shard artifact at {out_dir} does not match its manifest: "
            f"missing shards {missing}, changed shards {changed}")
    return want


def append_doc_separator(enc: DataFrame, eos_id: int,
                         ids_col: str = "bpe_ids",
                         count_col: str = "n_bpe_tokens") -> DataFrame:
    """Append one document-separator id to each document's id array and
    count it in the trained-unit budget — the step between BPE encoding
    and packing that keeps context windows from bleeding across
    unrelated documents (a pretraining loader cuts windows at
    ``floor(offset / budget)``; without a separator a window spanning a
    document boundary concatenates two texts with nothing marking the
    seam). NULL id arrays (NULL text — the encode's explicit NULL
    lane) become a bare ``[eos_id]``: the empty document still closes,
    so the stream's doc boundaries stay 1:1 with its rows. Counting
    the separator BEFORE packing means every offset/chunk coordinate
    already includes it — the budget is measured in exactly the units
    the loader consumes. Pure projection."""
    return (enc
            .withColumn(ids_col, F.concat(
                F.coalesce(F.col(ids_col),
                           F.array().cast("array<long>")),
                F.array(F.lit(int(eos_id)).cast("long"))))
            .withColumn(count_col, F.col(count_col) + 1))


def write_token_id_shards(df: DataFrame, merges: list[tuple[str, str]],
                          out_dir: str, n_shards: int,
                          budget_tokens: int,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          salt: str = "shard",
                          shuffle_epoch: int | None = None,
                          lowercase: bool = False,
                          vocab: dict[str, int] | None = None,
                          eos_token: str | None = None) -> dict:
    """The DIRECTLY-TRAINABLE artifact: BPE-encode every document under
    the imported tokenizer (functions/tokenizer.bpe_token_count,
    ``emit_ids``), drop the text, and write
    :func:`write_training_shards`-shaped shard-partitioned parquet
    whose rows carry ``bpe_ids array<long>`` with packing coordinates
    already in TRAINED-TOKENIZER units (``count_col='n_bpe_tokens'``)
    — the last step between :func:`finalize_corpus`'s text survivors
    and what a pretraining loader actually consumes (id arrays, not
    strings). Also writes the ``_shards_manifest.json`` integrity
    contract and a ``_vocab.json`` sidecar (token→id,
    functions/tokenizer.bpe_vocab) so the loader can decode/debug
    without re-deriving the table.

    ``eos_token`` reserves a document-separator special in the vocab
    (``bpe_vocab(merges, specials=('<unk>', eos_token))`` when the
    vocab is derived; a caller-supplied vocab must already contain it)
    and appends its id to every document (:func:`append_doc_separator`
    — counted in the budget, so packing coordinates are in exactly the
    units the loader consumes, and no context window ever spans a
    document boundary without the separator marking the seam). The
    convention is recorded in the manifest (``eos_token`` /
    ``eos_id``) next to the packing config.

    Plan shape = the text writer's exactly: one Arrow encode pass
    (id arrays never shuffle on their own — they ride the single shard
    repartition), one shuffle total, within-partition sort only.
    Returns the manifest dict."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_token_count,
        bpe_vocab,
    )

    if vocab is None:
        vocab = (bpe_vocab(merges) if eos_token is None
                 else bpe_vocab(merges, specials=("<unk>", eos_token)))
    if eos_token is not None and eos_token not in vocab:
        raise ValueError(
            f"write_token_id_shards: eos_token {eos_token!r} is not "
            f"in the vocab — reserve it as a special so the separator "
            f"has a real id")
    spark = df.sparkSession
    enc = bpe_token_count(df.select(id_col, text_col), merges,
                          text_col=text_col, id_col=id_col,
                          lowercase=lowercase, emit_ids=True,
                          vocab=vocab).drop(text_col)
    if eos_token is not None:
        enc = append_doc_separator(enc, vocab[eos_token])
    write_training_shards(enc, out_dir, n_shards, budget_tokens,
                          text_col=text_col, id_col=id_col, salt=salt,
                          shuffle_epoch=shuffle_epoch,
                          count_col="n_bpe_tokens")
    write_vocab_sidecar(spark, out_dir, vocab)
    extra = (None if eos_token is None
             else {"eos_token": eos_token, "eos_id": vocab[eos_token]})
    return write_shard_manifest(spark, out_dir, budget_tokens,
                                shuffle_epoch, extra=extra)


def write_vocab_sidecar(spark, out_dir: str,
                        vocab: dict[str, int]) -> None:
    """Persist the token→id table next to an id-array artifact
    (``_vocab.json`` — Hadoop FS API, the artifact may live on
    hdfs/s3a); :func:`read_token_id_vocab` is the read side."""
    import json

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{out_dir}/_vocab.json")
    out = fs.create(jpath, True)
    try:
        out.write(json.dumps(vocab).encode())
    finally:
        out.close()


def read_token_id_shard(spark, out_dir: str, shard: int,
                        id_col: str = "doc_id") -> DataFrame:
    """Loader-side read of one :func:`write_token_id_shards` shard in
    exact concatenation order — rows ordered by (chunk,
    [shuffle_key,] id), the same order the writer sorted, so
    concatenating ``bpe_ids`` row by row reproduces the shard's token
    stream and ``floor(start_offset / budget)`` boundaries cut it into
    context windows. The ``shard = k`` filter partition-prunes the
    scan to the one ``shard=k`` directory."""
    df = (spark.read.option("basePath", out_dir).parquet(out_dir)
          .filter(F.col("shard") == shard))
    order = (["chunk", "shuffle_key", id_col]
             if "shuffle_key" in df.columns else ["chunk", id_col])
    return df.orderBy(*order)


def read_token_id_vocab(spark, out_dir: str) -> dict[str, int]:
    """Read back the ``_vocab.json`` sidecar written by
    :func:`write_token_id_shards` (Hadoop FS API — the artifact may
    live on hdfs/s3a)."""
    import json

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{out_dir}/_vocab.json")
    if not fs.exists(jpath):
        raise ValueError(f"no _vocab.json under {out_dir} — not a "
                         f"token-id shard artifact")
    stream = fs.open(jpath)
    try:
        buf = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
        data = []
        line = buf.readLine()
        while line is not None:
            data.append(line)
            line = buf.readLine()
    finally:
        stream.close()
    return json.loads("\n".join(data))


def _stratum_frame(df: DataFrame, strata_col: str, text_col: str,
                   id_col: str) -> tuple[DataFrame, str]:
    """Resolve the stratum column for a sampling stage: the
    source-provided column when present, else the PREDICTED language
    (``annotate_documents``'s ``lang_pred`` — the same signal the
    language filter uses), so sampling stages only ever require
    (id, text) columns. Returns (frame carrying the column, its name);
    callers project back to the original columns afterwards."""
    if strata_col in df.columns:
        return df, strata_col
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        annotate_documents,
    )

    return (annotate_documents(df, text_col=text_col, id_col=id_col),
            "lang_pred")


def capped_sample_stage(df: DataFrame, cap: int,
                        strata_col: str = "lang",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """:func:`capped_stratified_sample` with the predicted-language
    fallback — the corpus-finalization stage shared VERBATIM by the
    batch funnel (:func:`build_training_corpus` ``cap_per_lang``) and
    the quiesce-time streaming finalization
    (streaming/corpus_stream.finalize_corpus): sharing the code is what
    makes the two paths' sampling decisions bit-identical (same counts,
    same rates, same hash-fraction membership). Returns ``df``'s
    original columns."""
    orig = df.columns
    sdf, col = _stratum_frame(df, strata_col, text_col, id_col)
    return capped_stratified_sample(
        sdf, cap, strata_col=col, id_col=id_col).select(*orig)


def temperature_sample_stage(df: DataFrame, alpha: float,
                             budget_tokens: int,
                             strata_col: str = "lang",
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             exact: bool = False) -> DataFrame:
    """:func:`temperature_sample` with the same predicted-language
    fallback as :func:`capped_sample_stage` — the temperature-mixture
    realization over a finalized corpus. ``exact=True`` swaps in the
    token-prefix cut (:func:`temperature_sample_exact` — one ordered
    window per stratum; use when the post-cap strata are small enough
    that the O(1-document) budget precision is worth the per-stratum
    sort). Returns ``df``'s original columns."""
    orig = df.columns
    sdf, col = _stratum_frame(df, strata_col, text_col, id_col)
    sampler = temperature_sample_exact if exact else temperature_sample
    return sampler(
        sdf, strata_col=col, text_col=text_col, id_col=id_col,
        alpha=alpha, budget_tokens=budget_tokens).select(*orig)


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            bench_id_col: str = "doc_id",
                            shingle_n: int = 3,
                            min_overlap: int = 2) -> DataFrame:
    """Decontamination: find corpus documents sharing ≥ ``min_overlap``
    distinct word n-grams with any benchmark/eval document — the overlap
    check run before training so eval sets don't leak into the corpus.

    Returns ``(doc_id, bench_id, n_overlap)`` pairs. Scale shape: the
    benchmark side is eval-set-sized (thousands of docs, not billions),
    so its exploded shingle table is BROADCAST — the corpus stream is
    shingled in place and hash-probed map-side; nothing corpus-sized
    shuffles except the (tiny) matching pairs entering the count
    aggregate. Both shingle arrays are per-doc distinct (operators/dedup
    `shingles`), so ``count(*)`` after the join is exactly |A∩B|."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        shingles,
    )

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"))
    b = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"))
    return (
        d.join(F.broadcast(b), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def benchmark_contamination_minhash(docs: DataFrame, benchmark: DataFrame,
                                    text_col: str = "text",
                                    id_col: str = "doc_id",
                                    bench_id_col: str = "doc_id",
                                    num_hashes: int = 32, bands: int = 16,
                                    shingle_n: int = 3,
                                    threshold: float = 0.5) -> DataFrame:
    """Near-duplicate decontamination: corpus documents whose ESTIMATED
    Jaccard similarity to any benchmark/eval document reaches
    ``threshold`` — the robust sibling of :func:`benchmark_contamination`
    for lightly-paraphrased eval leakage, which exact shingle overlap
    misses once every n-gram differs by a word.

    MinHash-LSH, not all-pairs: both sides get a banded signature table
    (operators/dedup.py :func:`minhash_band_index` — the same signature
    family as the dedup surface, so an existing corpus index is
    reusable), candidates come from an equi-join on (band, band_hash),
    and the estimate is computed from the carried flat signatures.
    Scale shape mirrors the shingle decontam: the benchmark side is
    eval-set-sized so its banded table is BROADCAST — the corpus is
    shingled exactly once and probed map-side; only matching candidate
    rows reach the distinct.

    Returns ``(doc_id, bench_id, est_jaccard)``. Banding math: a pair at
    true Jaccard j collides on ≥1 of b bands of r rows with probability
    1-(1-j^r)^b. The default here is WIDER than the dedup surface's
    (16 bands of 2 rows, vs 8×4): decontamination must catch moderate
    similarity — at j=0.4 the 16×2 banding collides with p≈0.94 where
    8×4 manages only p≈0.19 — and the benchmark side is tiny, so the
    extra candidate volume is bounded by the broadcast side's size."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        minhash_band_index,
    )

    d = minhash_band_index(docs, text_col, id_col, num_hashes, bands,
                           shingle_n)
    b = minhash_band_index(benchmark, text_col, bench_id_col, num_hashes,
                           bands, shingle_n)
    agree = F.lit(0)
    for i in range(num_hashes):
        agree = agree + (F.col(f"a.m{i}") == F.col(f"b.m{i}")).cast("int")
    return (
        d.alias("a").join(
            F.broadcast(b).alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash")))
        .select(F.col("a.id").alias("doc_id"),
                F.col("b.id").alias("bench_id"),
                (agree / F.lit(num_hashes)).alias("est_jaccard"))
        .distinct()
        .filter(F.col("est_jaccard") >= threshold)
    )


def benchmark_contamination_semantic(corpus_vecs: DataFrame,
                                     bench_vecs: DataFrame,
                                     centroids: list[list[float]],
                                     threshold: float,
                                     n_probe: int = 2,
                                     vec_col: str = "embedding",
                                     id_col: str = "doc_id",
                                     bench_id_col: str = "bench_id"
                                     ) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space sibling of the
    shingle (:func:`benchmark_contamination`) and MinHash
    (:func:`benchmark_contamination_minhash`) checks: a paraphrased
    eval question shares few shingles with its source but sits right
    next to it in embedding space, so modern pipelines run all three.
    Flags corpus vectors whose exact cosine to ANY benchmark vector
    reaches ``threshold``. Feed either real model embeddings or the
    in-repo bridges (text.hashed_text_embedding / models.doc_embedding).

    Scale shape — IVF-blocked, asymmetric in the right direction: the
    corpus side takes ONE `ivf_assign` projection (never exploded,
    never shuffled — its cell is unique per row, so no distinct is
    needed afterwards); the BENCHMARK side — thousands of rows vs the
    corpus's billions — explodes to its ``n_probe`` nearest cells and
    BROADCASTS into the cell equi-join. Recall follows IVF probing
    (boundary pairs need n_probe > 1), candidates are Σ|cell∩probe|,
    never corpus×bench.

    Returns ``(id_col, bench_id_col, cos_sim)`` — exact rounded cosine
    ≥ threshold, one row per flagged (corpus, bench) pair."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _probe_cells,
        dot,
        ivf_assign,
        norm,
    )

    c = (corpus_vecs.select(F.col(id_col).alias("_cid"),
                            F.col(vec_col).alias("_cv"))
         .withColumn("_cnorm", norm(F.col("_cv"))))
    c = ivf_assign(c, centroids, vec_col="_cv")
    b = (bench_vecs.select(F.col(bench_id_col).alias("_bid"),
                           F.col(vec_col).alias("_bv"))
         .withColumn("_bnorm", norm(F.col("_bv")))
         .withColumn("ivf_cell",
                     F.explode(_probe_cells("_bv", centroids, n_probe))))
    return (
        c.join(F.broadcast(b), "ivf_cell")
        .select(F.col("_cid").alias(id_col),
                F.col("_bid").alias(bench_id_col),
                F.round(dot(F.col("_cv"), F.col("_bv"))
                        / (F.col("_cnorm") * F.col("_bnorm")), 6)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def filter_documents(docs: DataFrame, min_quality: float = 0.4,
                     langs: list[str] | None = None,
                     max_dup_line_ratio: float | None = None,
                     max_top_bigram_ratio: float | None = None,
                     max_pii_signals: int | None = None,
                     min_avg_logprob: float | None = None,
                     lm_counts: DataFrame | None = None,
                     lm_alpha: float = 0.5,
                     min_avg_bigram_logprob: float | None = None,
                     bigram_model_counts: DataFrame | None = None,
                     bigram_alpha: float = 0.5,
                     strip_hot: DataFrame | None = None,
                     strip_window: int = 8,
                     redact: bool = False,
                     gopher: bool | dict = False,
                     lid_model: dict | None = None,
                     quality_model: dict | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Stage 1 of the corpus funnel: heuristic quality ≥ ``min_quality``,
    language allowlist (operators/text.py ``annotate_documents``),
    optional repetition caps (``max_dup_line_ratio`` /
    ``max_top_bigram_ratio``), PII-signal cap (``max_pii_signals``:
    emails+urls+phones), and an optional LM quality floor
    (``min_avg_logprob``: mean token log-probability ≥ floor under a
    FROZEN reference unigram model ``lm_counts`` —
    operators/text.py :func:`~..text.unigram_counts`; required with the
    floor, because a self-trained model would make the filter a
    corpus-level statistic). ``min_avg_bigram_logprob`` adds the
    second-order fluency floor (mean conditional log-probability under
    a frozen :func:`~..text.bigram_model` table
    ``bigram_model_counts`` — catches in-vocabulary-but-scrambled text
    the unigram floor scores as fluent); documents with fewer than two
    tokens carry no bigram evidence and PASS this gate (anti-join on
    failures, not semi-join on passes). The bigram gate smooths with
    its OWN ``bigram_alpha`` (default 0.5) — the unigram ``lm_alpha``
    is often tuned small for large vocabularies, which would silently
    move every frozen bigram floor if shared. Every signal is a per-document function of
    the text (and the frozen model) alone — no cross-document state —
    which is exactly why the batch funnel (:func:`build_training_corpus`)
    and its streaming twin (streaming/corpus_stream.py) can share this
    stage verbatim: applying it per micro-batch or over the whole corpus
    yields the same survivor set. Returns the surviving rows with
    ``docs``' original columns.

    ``strip_hot`` (a FROZEN hot-passage table from
    operators/text.py :func:`~..text.hot_passages` — frozen for the same
    batch/stream-parity reason as ``lm_counts``) additionally REWRITES
    ``text_col`` first, deleting tokens covered by a known boilerplate
    window (:func:`~..text.strip_repeated_substrings`) — run before the
    quality score so boilerplate neither inflates nor sinks it, and
    before dedup so fingerprints/signatures see the real content.

    ``redact=True`` rewrites ``text_col`` through
    :func:`~..text.redact_pii` FIRST (before every signal — scrubbed
    corpora should score, dedup, and ship the scrubbed text; note the
    PII-signal cap then sees placeholders, so combine the two only
    deliberately). ``gopher`` applies the published structural rules
    (:func:`~..text.gopher_filter`) AFTER the ``strip_hot`` rewrite —
    structural quality is judged on the text that ships, not on
    boilerplate the funnel deletes anyway: ``True`` for the standard
    thresholds, or a dict of that function's keyword overrides. Both
    are pure per-document rewrites/filters, so batch/stream funnel
    parity is preserved by construction.

    TRAINED-MODEL gates (functions/models.py — load exported weights
    with ``parse_vec_model`` + ``hash_vec_weights``/``_binary``; the
    models must be FROZEN for the usual batch/stream-parity reason):

    * ``lid_model = {"weights": DF(bucket, label, weight),
      "labels": [...], "biases": [...]?, "n_buckets": 1024?,
      "salt": "clf"?, "char_ngrams": (min_n, max_n)?}`` — the language
      allowlist (``langs``) is then decided by ``lang_id_model``'s
      multi-class argmax instead of the marker-list heuristic (the
      production LID pass; ``char_ngrams`` turns on fastText's subword
      features for models exported with n-gram rows);
    * ``quality_model = {"weights": DF(bucket, weight),
      "min_score": float, "bias": 0.0?, "n_buckets": 1024?,
      "salt": "clf"?}`` — an ADDITIONAL gate after the heuristic
      quality filter: ``hashed_linear_score`` ≥ ``min_score`` (the
      CCNet/GPT-3-style classifier pass; the heuristic floor stays
      useful as the cheap first cut).

    Both dicts accept the same ``salt`` the loader
    (``hash_vec_weights``) was given — loader and scorer MUST agree on
    (salt, n_buckets) or every bucket lookup misses silently, which is
    why the key is threaded here rather than silently pinned."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        annotate_documents,
    )

    if redact:
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            redact_pii,
        )

        docs = redact_pii(docs, text_col).select(*docs.columns)

    if strip_hot is not None:
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            strip_repeated_substrings,
        )

        docs = strip_repeated_substrings(
            docs, text_col, id_col, strip_window,
            hot=strip_hot).select(*docs.columns)

    # Gopher AFTER the boilerplate strip: the structural rules
    # (word count, line shapes, stopword hits) must score the content
    # that will actually ship — a mostly-boilerplate page must not pass
    # min_words on text that the strip stage then deletes.
    if gopher:
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            gopher_filter,
        )

        gopher_kwargs = gopher if isinstance(gopher, dict) else {}
        docs = gopher_filter(docs, text_col, **gopher_kwargs)

    annotated = annotate_documents(docs, text_col=text_col, id_col=id_col)
    kept = annotated.filter(F.col("quality") >= min_quality)
    if langs is not None and lid_model is None:
        kept = kept.filter(F.col("lang_pred").isin(list(langs)))
    survivors = kept.select(*docs.columns)

    if lid_model is not None:
        if langs is None:
            raise ValueError(
                "lid_model without langs has nothing to filter — pass "
                "the language allowlist the model's argmax should gate")
        missing = {"weights", "labels"} - set(lid_model)
        if missing:
            raise ValueError(f"lid_model missing keys {sorted(missing)}")
        from harvesting_extract_to_ttl_service_spark.functions.models import (
            lang_id_model,
        )

        char_ngrams = lid_model.get("char_ngrams")
        keep = (lang_id_model(
            survivors, lid_model["weights"], lid_model["labels"],
            biases=lid_model.get("biases"),
            n_buckets=lid_model.get("n_buckets", 1024),
            salt=lid_model.get("salt", "clf"),
            char_ngrams=(tuple(char_ngrams) if char_ngrams is not None
                         else None),
            text_col=text_col, id_col=id_col)
            .filter(F.col("lang_pred").isin(list(langs)))
            .select(id_col))
        survivors = survivors.join(keep, id_col, "left_semi")

    if quality_model is not None:
        missing = {"weights", "min_score"} - set(quality_model)
        if missing:
            raise ValueError(
                f"quality_model missing keys {sorted(missing)}")
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            hashed_linear_score,
        )

        keep = (hashed_linear_score(
            survivors, quality_model["weights"],
            n_buckets=quality_model.get("n_buckets", 1024),
            bias=quality_model.get("bias", 0.0),
            salt=quality_model.get("salt", "clf"),
            text_col=text_col, id_col=id_col)
            .filter(F.col("clf_score") >= quality_model["min_score"])
            .select(id_col))
        survivors = survivors.join(keep, id_col, "left_semi")

    if max_dup_line_ratio is not None or max_top_bigram_ratio is not None:
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            repetition_signals,
        )

        rep = repetition_signals(survivors, text_col, id_col)
        if max_dup_line_ratio is not None:
            rep = rep.filter(F.col("dup_line_ratio") <= max_dup_line_ratio)
        if max_top_bigram_ratio is not None:
            rep = rep.filter(
                F.col("top_bigram_ratio") <= max_top_bigram_ratio)
        survivors = rep.select(*docs.columns)

    if max_pii_signals is not None:
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            pii_signals,
        )

        survivors = pii_signals(survivors, text_col).filter(
            F.col("n_emails") + F.col("n_urls") + F.col("n_phones")
            <= max_pii_signals).select(*docs.columns)

    if min_avg_logprob is not None:
        if lm_counts is None:
            raise ValueError(
                "min_avg_logprob requires lm_counts (a frozen reference "
                "model from unigram_counts): a self-trained score is a "
                "corpus-level statistic and would differ between the "
                "batch and streaming funnels")
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            unigram_logprob,
        )

        keep = (unigram_logprob(survivors, text_col, id_col, lm_alpha,
                                model_counts=lm_counts)
                .filter(F.col("avg_logprob") >= min_avg_logprob)
                .select(id_col))
        survivors = survivors.join(keep, id_col, "left_semi")

    if min_avg_bigram_logprob is not None:
        if bigram_model_counts is None:
            raise ValueError(
                "min_avg_bigram_logprob requires bigram_model_counts "
                "(a frozen reference model from bigram_model): a "
                "self-trained score is a corpus-level statistic and "
                "would differ between the batch and streaming funnels")
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            bigram_logprob,
        )

        # anti-join on FAILURES: documents with < 2 tokens produce no
        # score row and must pass (no bigram evidence ≠ disfluent)
        drop = (bigram_logprob(survivors, text_col, id_col, bigram_alpha,
                               model=bigram_model_counts)
                .filter(F.col("avg_logprob") < min_avg_bigram_logprob)
                .select(id_col))
        survivors = survivors.join(drop, id_col, "left_anti")

    return survivors


def decontam_stage(survivors: DataFrame, benchmark: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   mode: str = "shingle", min_overlap: int = 2,
                   threshold: float = 0.5,
                   semantic_dim: int = 32, semantic_k: int = 8,
                   semantic_n_probe: int = 2,
                   semantic_centroids: list[list[float]] | None = None
                   ) -> DataFrame:
    """The decontamination stage both funnels share verbatim (the
    batch :func:`build_training_corpus` and the streaming
    ``corpus_batch`` — stream==batch parity by construction): drop
    survivors flagged against the benchmark by the chosen check.

    * ``'shingle'`` — ≥ ``min_overlap`` exact shared shingles
      (:func:`benchmark_contamination`);
    * ``'minhash'`` — banded-MinHash estimated Jaccard ≥ ``threshold``
      (:func:`benchmark_contamination_minhash`) — paraphrases where
      every individual shingle differs;
    * ``'semantic'`` — embedding cosine ≥ ``threshold``
      (:func:`benchmark_contamination_semantic` over the model-free
      :func:`~..operators.text.hashed_text_embedding` bridge at
      ``semantic_dim``) — reworded leakage with low LEXICAL overlap
      that even MinHash misses. Blocking centroids default to k-means
      over the BENCHMARK embeddings (``semantic_k`` cells, capped at
      the benchmark size — cells concentrate exactly where
      contamination can live; deterministic, so per-micro-batch
      retraining in the stream reproduces the same cells and parity
      holds); pass ``semantic_centroids`` to skip that small
      per-call training job. Zero-embedding docs (token-less, or
      fully sign-cancelled buckets) can't score a cosine and pass
      through, like unparseable URLs in the URL stage.

    Returns ``survivors`` minus the flagged rows."""
    if mode == "shingle":
        hits = benchmark_contamination(
            survivors, benchmark, text_col, id_col,
            min_overlap=min_overlap)
    elif mode == "minhash":
        hits = benchmark_contamination_minhash(
            survivors, benchmark, text_col, id_col,
            threshold=threshold)
    elif mode == "semantic":
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (  # noqa: E501
            train_ivf_centroids,
        )
        from harvesting_extract_to_ttl_service_spark.operators.text import (
            hashed_text_embedding,
        )

        from harvesting_extract_to_ttl_service_spark.operators.materialize import (  # noqa: E501
            materialize,
        )

        # materialization cuts on BOTH embedding sides: the hashed
        # embedding is an in-plan expression (dim per-token folds), and
        # without the cut every downstream centroid cosine / norm /
        # assign would INLINE its own copy — k·dim duplicated fold
        # subtrees whose planning alone took minutes at 480 docs (the
        # duplicate-subtree hazard, SCALE.md round-5). After the cut the
        # embedding is a data column computed once per row.
        nonzero = F.aggregate("embedding", F.lit(0.0),
                              lambda a, x: a + x * x) > 0
        bemb = (hashed_text_embedding(benchmark, dim=semantic_dim,
                                      text_col=text_col, id_col=id_col)
                .filter(nonzero)
                .select(F.col(id_col).alias("bench_id"), "embedding"))
        bemb = materialize(bemb, "local_checkpoint")
        if semantic_centroids is None:
            k = min(semantic_k, bemb.count())
            if k == 0:
                return survivors  # empty/token-less benchmark
            semantic_centroids = train_ivf_centroids(
                bemb, k, semantic_dim, vec_col="embedding",
                id_col="bench_id")
        semb = (hashed_text_embedding(survivors, dim=semantic_dim,
                                      text_col=text_col, id_col=id_col)
                .filter(nonzero).select(id_col, "embedding"))
        semb = materialize(semb, "local_checkpoint")
        hits = benchmark_contamination_semantic(
            semb, bemb, semantic_centroids, threshold=threshold,
            n_probe=semantic_n_probe, id_col=id_col,
            bench_id_col="bench_id")
    else:
        raise ValueError(f"decontam_mode={mode!r}: "
                         f"one of 'shingle', 'minhash', 'semantic'")
    # Select the flagged corpus id BY NAME per mode (shingle/minhash
    # return it as 'doc_id', semantic echoes id_col) — never
    # positionally, so a column reorder in a hit producer can't
    # silently anti-join on the benchmark's ids.
    flag_col = id_col if mode == "semantic" else "doc_id"
    dirty = hits.select(F.col(flag_col).alias(id_col)).distinct()
    return survivors.join(dirty, id_col, "left_anti")


def build_training_corpus(docs: DataFrame,
                          benchmark: DataFrame | None = None,
                          min_quality: float = 0.4,
                          langs: list[str] | None = None,
                          max_dup_line_ratio: float | None = None,
                          max_top_bigram_ratio: float | None = None,
                          max_pii_signals: int | None = None,
                          min_avg_logprob: float | None = None,
                          lm_counts: DataFrame | None = None,
                          lm_alpha: float = 0.5,
                          min_avg_bigram_logprob: float | None = None,
                          bigram_model_counts: DataFrame | None = None,
                          bigram_alpha: float = 0.5,
                          strip_hot: DataFrame | None = None,
                          strip_window: int = 8,
                          redact: bool = False,
                          gopher: bool | dict = False,
                          lid_model: dict | None = None,
                          quality_model: dict | None = None,
                          near_dup_threshold: float | None = 0.7,
                          decontam_min_overlap: int = 2,
                          decontam_mode: str = "shingle",
                          decontam_threshold: float = 0.5,
                          decontam_dim: int = 32,
                          decontam_k: int = 8,
                          decontam_n_probe: int = 2,
                          decontam_centroids: list[list[float]] | None
                          = None,
                          cap_per_lang: int | None = None,
                          cap_strata_col: str = "lang",
                          url_col: str | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """The composed corpus-construction funnel — every stage an operator
    this package already verifies individually, chained the way a
    production training-data pipeline runs them:

      1. annotate + filter: heuristic quality ≥ ``min_quality``, language
         allowlist (operators/text.py `annotate_documents`); optional
         repetition caps (``max_dup_line_ratio`` /
         ``max_top_bigram_ratio``), PII-signal cap
         (``max_pii_signals``: emails+urls+phones), and LM quality floor
         (``min_avg_logprob`` against a frozen ``lm_counts`` model) from
         the same module (:func:`filter_documents`);
      1.5 URL dedup (``url_col`` given): keep the min-id row per
         canonical URL (operators/web.py `normalize_url` — crawl-level
         dedup before content-level; unparseable URLs pass through);
      2. exact dedup: keep the min-id row per normalized text;
      3. near-dup dedup (``near_dup_threshold`` not None): MinHash-LSH
         pairs → connected components → keep each cluster's min-id
         representative (keep-one semantics, operators/dedup.py);
      4. decontamination (``benchmark`` given): :func:`decontam_stage`
         — ``decontam_mode`` ``'shingle'`` drops docs sharing
         ≥ ``decontam_min_overlap`` exact shingles with any benchmark
         doc; ``'minhash'`` drops docs whose banded-MinHash estimated
         Jaccard reaches ``decontam_threshold``
         (lightly-paraphrased leakage); ``'semantic'`` drops docs whose
         embedding cosine reaches ``decontam_threshold``
         (reworded leakage with low lexical overlap — hashed-embedding
         bridge at ``decontam_dim``, IVF-blocked on ``decontam_k``
         benchmark-trained cells probed ``decontam_n_probe`` deep, or
         caller-supplied ``decontam_centroids``);
      5. capped stratified sampling per language (``cap_per_lang``),
         stratified on ``cap_strata_col`` (default the source-provided
         ``lang`` column). When that column is absent the stratum falls
         back to the PREDICTED language (``annotate_documents``'s
         ``lang_pred`` — the same signal the ``langs`` filter uses), so
         the funnel still only requires (id, text) columns.

    Returns the surviving rows of ``docs`` (original columns). Feed the
    result to :func:`write_training_shards` for the final artifact. Each
    stage is one scan/join over the shrinking survivor set; nothing
    collects to the driver."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
        drop_exact_duplicates,
        minhash_similarity,
    )

    survivors = filter_documents(
        docs, min_quality, langs, max_dup_line_ratio, max_top_bigram_ratio,
        max_pii_signals, min_avg_logprob, lm_counts, lm_alpha,
        min_avg_bigram_logprob, bigram_model_counts, bigram_alpha,
        strip_hot, strip_window, redact=redact, gopher=gopher,
        lid_model=lid_model, quality_model=quality_model,
        text_col=text_col, id_col=id_col)

    if url_col is not None:
        # crawl-level dedup BEFORE content dedup (one fetch per page
        # before one copy per text) — keep-min-id per canonical URL,
        # unparseable URLs pass through (operators/web.py). The helper's
        # diagnostic key column stays internal to the stage.
        from harvesting_extract_to_ttl_service_spark.operators.web import (
            drop_url_duplicates,
        )

        survivors = drop_url_duplicates(survivors, url_col, id_col) \
            .drop("_norm_url")

    survivors = drop_exact_duplicates(survivors, text_col, id_col)

    if near_dup_threshold is not None:
        pairs = minhash_similarity(survivors, text_col, id_col,
                                   threshold=near_dup_threshold)
        comp = connected_components(
            pairs.select("id_a", "id_b"),
            survivors.select(F.col(id_col).alias("id")))
        reps = (comp.filter(F.col("id") == F.col("component"))
                .select(F.col("id").alias(id_col)))
        survivors = survivors.join(reps, id_col, "left_semi")

    if benchmark is not None:
        survivors = decontam_stage(
            survivors, benchmark, text_col, id_col,
            mode=decontam_mode, min_overlap=decontam_min_overlap,
            threshold=decontam_threshold,
            semantic_dim=decontam_dim, semantic_k=decontam_k,
            semantic_n_probe=decontam_n_probe,
            semantic_centroids=decontam_centroids)

    if cap_per_lang is not None:
        # re-annotating the (already shrunken) survivor set on fallback
        # is a pure column projection — cheaper than threading lang_pred
        # through every stage's select(*docs.columns). The stage is
        # shared verbatim with streaming finalize_corpus.
        survivors = capped_sample_stage(
            survivors, cap_per_lang, strata_col=cap_strata_col,
            text_col=text_col, id_col=id_col)

    return survivors


def pack_chunk_stats(df: DataFrame, budget_tokens: int,
                     shard_col: str = "shard", text_col: str = "text",
                     id_col: str = "doc_id",
                     order_col: str | None = None) -> DataFrame:
    """Per-(shard, chunk) packing summary: documents and tokens starting
    in each context window. The downstream loader contract: every chunk
    except a shard's last should start ~budget_tokens apart."""
    packed = pack_chunks(df, budget_tokens, shard_col, text_col, id_col,
                         order_col)
    return (packed.groupBy(shard_col, "chunk")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens")))


def corpus_report(df: DataFrame, strata_col: str = "lang",
                  text_col: str = "text", id_col: str = "doc_id",
                  quantiles: tuple[float, ...] = (0.5, 0.9),
                  exact_quantiles: bool = True) -> DataFrame:
    """The data-card statistics job — the per-stratum summary every
    dataset release ships (and every mixing/cap decision reads): doc and
    token counts, distinct-text count (exact-dup pressure via the
    normalized content fingerprint), the stratum's share of the corpus
    token mass, and token-length quantiles.

    Scale shape: ONE aggregation pass over the corpus (grouped by
    stratum), then a window over the aggregated rows — the window's
    single partition holds #strata rows (languages/sources, not
    documents), so it is a driver-scale no-op, never a corpus shuffle.
    The distinct-text count is a two-level hash aggregate on a 16-hex
    fingerprint (Spark plans count(DISTINCT) as a partial-dedup expand —
    no raw text crosses the shuffle, only 8-byte-ish fingerprints).

    ``exact_quantiles=True`` (the oracle-matched default) uses Spark's
    exact ``percentile``, which buffers each stratum's token counts in
    executor memory — fine up to ~10^8 docs per stratum, and what the
    DuckDB ``quantile_cont`` twin restates bit-for-bit. At 100 TB flip
    it to False: ``approx_percentile`` (t-digest, mergeable, bounded
    memory) with the same output columns, no oracle guarantee.

    Returns one row per stratum: ``(stratum, n_docs, n_tokens,
    n_distinct_texts, token_share, p<q>_tokens...)``, doubles rounded to
    6 decimals so float-sum order cannot flip a value hash."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        fingerprint,
    )

    toks = token_count(F.col(text_col))
    qcol = (
        (lambda c, p: F.percentile(c, F.lit(p))) if exact_quantiles
        else (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10000))))
    per = (df.groupBy(F.col(strata_col).alias("stratum"))
           .agg(F.count("*").alias("n_docs"),
                F.sum(toks).alias("n_tokens"),
                F.countDistinct(fingerprint(F.col(text_col)))
                .alias("n_distinct_texts"),
                *[F.round(qcol(toks, p).cast("double"), 6)
                  .alias(f"p{int(p * 100)}_tokens") for p in quantiles]))
    share_w = Window.partitionBy()  # #strata rows — see docstring
    return per.select(
        "stratum", "n_docs", "n_tokens", "n_distinct_texts",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(share_w), 6)
        .alias("token_share"),
        *[f"p{int(p * 100)}_tokens" for p in quantiles])


def split_long_documents(df: DataFrame, max_tokens: int,
                         overlap: int = 0,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Split each document into ``max_tokens``-sized pieces with
    ``overlap`` tokens of context carried between consecutive pieces —
    the long-document chunking a pretraining loader applies BEFORE
    packing (a 200k-token document must become ~context-window pieces;
    truncation throws the tail away, and packing whole docs would put
    the 199k-th token in the same attention window as the 1st). Overlap
    preserves continuation context at piece boundaries (the classic
    stride trick).

    Pure column expressions + one ``posexplode`` — tokens are sliced
    in-row from the document's own token array, so nothing shuffles and
    the output is exactly as partitioned as the input; piece count per
    document is ceil((n - max_tokens) / (max_tokens - overlap)) + 1.
    Token-less documents — empty, whitespace-only, AND NULL text —
    survive as one empty piece with ``n_tokens = 0`` (dropping is the
    caller's filter policy, the strip operators' convention). Text
    reassembles whitespace-normalized (single spaces — the same
    convention as the strip/span rewrites; positions index the
    whitespace token stream).

    Returns ``df``'s columns with ``text_col`` rewritten per piece,
    plus ``piece`` (0-based), ``piece_start`` (1-based token offset in
    the original), and ``n_tokens`` (piece length). ``(id_col, piece)``
    is the natural child key downstream."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"split_long_documents: overlap={overlap} must satisfy "
            f"0 <= overlap < max_tokens={max_tokens} — a step of "
            f"max_tokens - overlap <= 0 would never advance")
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        tokens,
    )

    step = max_tokens - overlap
    # NULL text must ride the explicit-NULL lane, not sizeOfNull's:
    # tokens(NULL) is a NULL array, whose F.size is -1 (legacy) or NULL
    # (ANSI) — either corrupts n_pieces / downstream token-budget sums.
    # Coalescing to an empty array makes a NULL-text doc one empty
    # piece, the same contract as an empty-string doc.
    t = F.coalesce(tokens(F.col(text_col)),
                   F.array().cast("array<string>"))
    n = F.size(t)
    n_pieces = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - max_tokens) / F.lit(float(step))) + 1).cast("int")
    exploded = df.select(
        *df.columns, n.alias("_n"),
        F.posexplode(F.sequence(F.lit(0), n_pieces - 1))
        .alias("piece", "_unused")).drop("_unused")
    start = F.col("piece") * step + 1
    sliced = F.slice(
        F.coalesce(tokens(F.col(text_col)),
                   F.array().cast("array<string>")),
        start, max_tokens)
    return exploded.select(
        *[F.concat_ws(" ", sliced).alias(c) if c == text_col
          else F.col(c) for c in df.columns],
        F.col("piece"),
        start.cast("long").alias("piece_start"),
        F.size(sliced).cast("long").alias("n_tokens"))


def mix_sources(frames: dict[str, DataFrame],
                weights: dict[str, float],
                budget_tokens: int,
                text_col: str = "text", id_col: str = "doc_id",
                salt: str = "mixsrc",
                count_col: str | None = None) -> DataFrame:
    """EXPLICIT-WEIGHT data mixing across SOURCES — the cross-corpus
    sibling of :func:`temperature_sample` (which derives shares from
    stratum sizes; here the pipeline owner states them: "40% web, 30%
    code, 20% books, 10% wiki", the way production pretraining mixes
    are actually specified): each named corpus is downsampled so its
    expected token mass is ``share_s · budget_tokens``, where shares
    are the normalized ``weights``.

    Mechanics — one union, one tiny per-source aggregate, one scan:
    rate_s = min(1, share_s·budget / tokens_s), membership the
    deterministic hash fraction of ``(source, id)`` — the SOURCE is
    part of the key because independent corpora may reuse ids, and an
    id-only key would correlate their keep decisions. A source whose
    corpus is SMALLER than its allocation keeps everything (rate
    clamps at 1) — the mix then under-delivers that share, which is
    reported rather than silently re-normalized: the returned frame
    carries a ``source`` column, so ``corpus_report(strata_col=
    'source')`` audits the realized mix. All frames must share the
    schema (a mixing job's contract; validated up front).

    ``count_col``: budget in a precomputed token unit (see
    :func:`temperature_mixture` — pass BPE counts to mix in trained
    tokenizer units). Returns the sampled union with ``source``
    prepended."""
    if set(frames) != set(weights):
        raise ValueError(
            f"mix_sources: frames {sorted(frames)} and weights "
            f"{sorted(weights)} name different sources")
    if not frames:
        raise ValueError("mix_sources: no sources")
    bad = {s: w for s, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"mix_sources: non-positive weights {bad}")
    cols = None
    for name, df in frames.items():
        if cols is None:
            cols = df.columns
        elif df.columns != cols:
            raise ValueError(
                f"mix_sources: source {name!r} columns {df.columns} "
                f"differ from {cols} — mixing needs one schema")
    total_w = sum(float(w) for w in weights.values())
    union = None
    for name in sorted(frames):
        part = frames[name].select(F.lit(name).alias("source"),
                                   *frames[name].columns)
        union = part if union is None else union.unionByName(part)
    toks = (F.col(count_col) if count_col is not None
            else token_count(F.col(text_col)))
    counts = union.groupBy("source").agg(F.sum(toks).alias("_toks"))
    share = {s: float(w) / total_w for s, w in weights.items()}
    share_expr = F.lit(None).cast("double")
    for s, v in sorted(share.items()):
        share_expr = F.when(F.col("source") == s,
                            F.lit(v)).otherwise(share_expr)
    rates = counts.select(
        "source",
        F.when(F.col("_toks") <= 0, F.lit(0.0))
        .otherwise(F.least(
            F.lit(1.0),
            share_expr * F.lit(float(budget_tokens)) / F.col("_toks")))
        .alias("_rate"))
    key = F.concat(F.col("source"), F.lit("|"),
                   F.col(id_col).cast("string"))
    return (union.join(F.broadcast(rates), "source")
            .filter(hash_fraction(key, salt) < F.col("_rate"))
            .drop("_rate"))
