"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY.md §2C extension surface).

Design for 100 TB:
  * exact dedup is a single hash-shuffle on a content fingerprint (never on
    the raw text — shuffle the 16-byte hash, not the document);
  * near-dup avoids the O(n²) pair space via LSH banding — candidate pairs
    come from an equi-join on (band, band_signature), which Spark executes
    as a shuffled hash join keyed on small ints;
  * all hash primitives are md5/xxhash64-based column expressions —
    deterministic across runs AND across engines (md5 is bit-identical in
    DuckDB, which is what lets the oracle verify MinHash signatures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.materialize import materialize
from harvesting_extract_to_ttl_service_spark.operators.text import fingerprint, tokens

# Mersenne prime 2^31-1: modulus for the portable universal-hash family
# h_i(x) = (a_i * x + b_i) mod P used by the MinHash signatures. With
# x < 2^32 and a < 2^31 the product stays under 2^63 — no int64 overflow in
# any engine — while the mod genuinely wraps (a modulus that never wraps
# would make every permutation monotonic and collapse the signature to a
# function of the single global min-hash).
_P = (1 << 31) - 1


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed pseudo-random (a_i, b_i) universal-hash coefficients
    (seed 42 — deterministic across runs and mirrored by the DuckDB
    oracle generator)."""
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, _P), rng.randrange(0, _P))
            for _ in range(num_hashes)]


_SPREAD_CACHE: dict[tuple[str, int, int], bool] = {}
# Keys are (applicationId, plan hash, cores): entries from finished
# sessions are purged on the next miss, and a runaway count of distinct
# plans within one session clears the cache outright (re-probing is cheap;
# unbounded growth in a long-lived process is not).
_SPREAD_CACHE_MAX = 4096


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Fix the small-file scan-parallelism cliff for CPU-dense stages: a
    table whose parquet footprint is under ``maxPartitionBytes`` scans as
    ONE partition, so an md5-per-shingle pipeline runs on one core of
    local[32]. When the upstream yields fewer partitions than cores,
    round-robin repartition to core count before the expensive projection
    — the shuffled bytes are the raw (tiny) input, the regained
    parallelism is Nx; measured 6.9s → 3.8s on the sf0.1 LSH bench query.
    On a real corpus the scan already has ≥ cores partitions and this is
    a no-op, so it costs nothing at 100 TB. Deliberately NOT applied to
    cheap scans (plain aggregates/joins): there the scan itself dominates
    and an extra shuffle only adds overhead.

    The partition-count probe (``df.rdd.getNumPartitions()``) forces a
    driver-side planning pass, so the verdict is memoized per
    (application, analyzed-plan semanticHash, core count): repeat
    invocations of the same catalog query skip the probe entirely."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    key = (sc.applicationId, df.semanticHash(), target)
    need = _SPREAD_CACHE.get(key)
    if need is None:
        for k in [k for k in _SPREAD_CACHE if k[0] != sc.applicationId]:
            del _SPREAD_CACHE[k]
        if len(_SPREAD_CACHE) >= _SPREAD_CACHE_MAX:
            _SPREAD_CACHE.clear()
        need = df.rdd.getNumPartitions() < target
        _SPREAD_CACHE[key] = need
    return df.repartition(target) if need else df


def _pin_join_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition on the join keys with an EXPLICIT partition count
    (``spark.sql.shuffle.partitions``) so AQE's size-based coalescing
    cannot serialize a compute-dense self-join: a banded/blocked
    candidate join's shuffle INPUT is tiny (fixed-width keys, one row
    per doc×band) while its join OUTPUT explodes quadratically per
    bucket — measured at the 10× probe, the SimHash block join's ~6 MB
    shuffle expands to 26M rows and, coalesced to one task under
    ``parallelismFirst=false``, runs 4× slower. A user-specified
    repartition is exempt from coalescing, and since both join sides get
    the same (keys, count) partitioning the join itself adds no extra
    exchange. The count follows ``spark.sql.shuffle.partitions``, the
    knob production already sizes to the cluster; platforms that set it
    to a non-numeric sentinel (e.g. ``'auto'`` under vendor AQE
    defaults) fall back to ``sparkContext.defaultParallelism`` instead
    of failing at plan time.

    Pin ONE side of a MATERIALIZED self-join (the probe/left side), not
    both (round 15, measured 2.87 s → 2.14 s on the sf0.1 MinHash tail):
    one REPARTITION_BY_NUM in the join's stage group already stops AQE
    from coalescing ANY side (CoalesceShufflePartitions only fires when
    every shuffle in the group is coalescible), a sort-merge join adds
    its own ENSURE_REQUIREMENTS exchange on the bare side (same shuffle
    count either way, same key+count partitioning), and when the table
    is small enough that the planner broadcasts it, the bare side feeds
    BroadcastExchange directly — a pin there is a pure-overhead shuffle
    under the broadcast. Keep the bare frame as the RIGHT side: at equal
    stats the planner builds right, so the broadcast lands on the
    un-pinned side. Only do this on a MATERIALIZED frame — for an
    unmaterialized self-join the identical pinned exchanges are exactly
    what lets AQE reuse the shared subtree's shuffle stage
    (text.common_span_pairs relies on that), and dropping one pin there
    would recompute the whole subtree on the bare side."""
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", None)
    try:
        n = int(raw)
    except (TypeError, ValueError):
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols])


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the lowercased text (array column)."""
    t = tokens(F.lower(text))
    cnt = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(cnt - n + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    )


def _portable_hash64(s: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative int64 — identical in any
    engine with md5/substr/hex-parse, unlike xxhash64/murmur."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _portable_hash32(s: Column) -> Column:
    """First 8 hex chars of md5 as an int64 in [0, 2^32) — small enough
    that the universal-hash multiply below cannot overflow int64 (Spark
    wraps silently on overflow, DuckDB raises; staying under 2^63 keeps
    the arithmetic identical everywhere)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def minhash_signature(text: Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """MinHash signature (array<long> of length ``num_hashes``) over word
    shingles. Permutation i is the universal hash (a_i*h + b_i) mod P with
    fixed odd constants — deterministic, seedless, engine-portable.

    Computed as ONE ``aggregate`` pass over the shingle-hash array. The
    obvious alternative — ``array(array_min(transform(base, perm_i)) for
    i…)`` — inlines the md5-per-shingle ``base`` subtree into all
    ``num_hashes`` branches, and Catalyst does not eliminate the common
    subexpression across them: measured 32× redundant md5 work and ~5×
    wall-clock on the LSH bench query."""
    base = F.transform(shingles(text, shingle_n), _portable_hash32)
    coeffs = _minhash_coeffs(num_hashes)
    init = F.array_repeat(F.lit(_P).cast("long"), num_hashes)

    def step(acc: Column, h: Column) -> Column:
        return F.array(*[
            F.least(acc.getItem(i), (F.lit(a) * h + F.lit(b)) % _P)
            for i, (a, b) in enumerate(coeffs)
        ])

    return F.aggregate(base, init, step)


def connected_components(pairs: DataFrame, ids: DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b",
                         id_col: str = "id",
                         max_iter: int = 20, check_every: int = 3,
                         reliable_checkpoint: bool = False,
                         on_nonconvergence: str = "raise") -> DataFrame:
    """Connected components over a candidate-pair graph → ``(id,
    component)`` with component = the minimum member id — the step that
    turns near-dup PAIRS into duplicate GROUPS with a canonical
    representative (keep-one dedup).

    Hash-to-min label propagation: every node repeatedly adopts the
    minimum label among itself and its neighbours; converges in
    O(component diameter) rounds, and near-dup clusters at corpus scale
    are shallow (boilerplate stars, not long chains). Each round is one
    equi-join + map-side-combinable MIN — no collect of the graph.

    Production shaping:
      * the driver-side convergence count runs only every ``check_every``
        rounds (each check is a join + count job on the driver's clock;
        at K=3 deep graphs pay ~⅓ of the scheduling overhead, while
        shallow star graphs converge inside the first block anyway);
      * ``reliable_checkpoint=True`` cuts per-round lineage with
        ``checkpoint()`` (reliable storage — survives executor loss on a
        real cluster; requires ``sc.setCheckpointDir``) instead of the
        default ``localCheckpoint()`` (executor-local, fastest, but an
        executor loss mid-propagation forfeits the cut lineage);
      * ``max_iter`` exhaustion with labels still changing means the
        returned clusters are NOT the true transitive closure (a chain
        longer than max_iter): ``on_nonconvergence`` = ``'raise'``
        (default — bad clusters must not ship silently), ``'warn'``, or
        ``'ignore'``. A one-round probe disambiguates convergence that
        happened mid-block from true exhaustion before raising."""
    if on_nonconvergence not in ("raise", "warn", "ignore"):
        raise ValueError(f"on_nonconvergence={on_nonconvergence!r}: "
                         f"one of 'raise', 'warn', 'ignore'")
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")

    def cut(df: DataFrame) -> DataFrame:
        return (df.checkpoint(eager=True) if reliable_checkpoint
                else df.localCheckpoint(eager=True))

    # Materialize the symmetrized edge set ONCE before iterating: the
    # union carries two copies of the ``pairs`` subtree (often a full
    # LSH/banding pipeline), and without this cut every propagation round
    # would recompute that pipeline twice — O(rounds × 2) re-executions
    # of the most expensive stage in the job.
    edges = cut(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    )
    labels = ids.select(F.col(id_col).alias("id"),
                        F.col(id_col).alias("component"))

    def propagate(lab: DataFrame) -> DataFrame:
        neigh = (
            edges.join(lab, edges.dst == lab.id)
            .groupBy("src").agg(F.min("component").alias("neigh_min"))
        )
        return cut(
            lab.join(neigh, lab.id == neigh.src, "left")
            .select(
                "id",
                F.least(F.col("component"),
                        F.coalesce("neigh_min", F.col("component")))
                .alias("component"))
        )

    def n_changed(new: DataFrame, old: DataFrame) -> int:
        return (
            new.alias("n").join(old.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )

    rounds = 0
    converged = False
    while rounds < max_iter and not converged:
        block_start = labels
        for _ in range(min(check_every, max_iter - rounds)):
            labels = propagate(labels)
            rounds += 1
        converged = n_changed(labels, block_start) == 0
    if not converged:
        # changed>0 over the last block doesn't distinguish "still
        # moving" from "converged mid-block": one probe round decides.
        converged = n_changed(propagate(labels), labels) == 0
    if not converged:
        msg = (f"connected_components: labels still changing after "
               f"max_iter={max_iter} rounds — the returned components are "
               f"not the full transitive closure (a component's diameter "
               f"exceeds max_iter); raise max_iter")
        if on_nonconvergence == "raise":
            raise RuntimeError(msg)
        if on_nonconvergence == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content fingerprint: one row per duplicate group
    with the canonical (min-id) representative and group size. The groupBy
    shuffles only (fingerprint, id) pairs."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"),
             F.count("*").alias("group_size"))
    )


def corpus_overlap(a: DataFrame, b: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Cross-corpus exact-overlap report — the first question about a
    new crawl ``b`` against an existing corpus ``a``: how much of it is
    new? One row: document and distinct-text counts per side, the
    number of distinct texts present in BOTH, and the fraction of b's
    DOCUMENTS whose text already exists in a (``frac_b_seen`` — the
    recrawl rate; 6-dp rounded for cross-engine hashing).

    Plan: per-side fingerprint aggregates plus one fp-keyed semi-join —
    the corpora are scanned once each and only (fp, count) rows
    shuffle; nothing pairs up documents, so this is strictly cheaper
    than any dedup pass and the right pre-flight before one."""
    fa = (a.select(fingerprint(F.col(text_col)).alias("fp"))
          .groupBy("fp").agg(F.count("*").alias("na")))
    fb = (b.select(fingerprint(F.col(text_col)).alias("fp"))
          .groupBy("fp").agg(F.count("*").alias("nb")))
    j = fa.join(fb, "fp", "full")
    return j.agg(
        F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n_docs_a"),
        F.count("na").cast("long").alias("n_texts_a"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_docs_b"),
        F.count("nb").cast("long").alias("n_texts_b"),
        F.count(F.when(F.col("na").isNotNull()
                       & F.col("nb").isNotNull(), 1))
        .cast("long").alias("n_texts_shared"),
        F.round(F.sum(F.when(F.col("na").isNotNull(),
                             F.coalesce(F.col("nb"), F.lit(0)))
                      .otherwise(F.lit(0))) / F.sum("nb"), 6)
        .alias("frac_b_seen"))


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per identical (normalized) text."""
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature_table(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_hashes: int = 32,
                            shingle_n: int = 3) -> DataFrame:
    """(id, m0..m{n-1}) flat signature columns via explode + groupBy MIN
    aggregates. Same values as :func:`minhash_signature`, but flat columns
    keep the whole pipeline in whole-stage codegen (HOF lambdas evaluate
    interpreted) and the partial MIN completes map-side — one row per
    document reaches the shuffle."""
    ex = spread_for_cpu(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"))
    ex = ex.select("id", _portable_hash32(F.col("g")).alias("h"))
    return ex.groupBy("id").agg(*[
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
    ])


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 32,
                           bands: int = 8, shingle_n: int = 3,
                           materialize_mode: str = "local_checkpoint",
                           ) -> DataFrame:
    """LSH banding: split the MinHash signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs agreeing on any full band become a
    candidate pair. Returns distinct (id_a < id_b) candidate pairs.

    Scale path: the self-join is keyed on (band_index, band_hash) — small
    fixed-width keys; hot buckets (boilerplate docs) are the skew risk, so
    AQE skew-join stays on in the session config. ``materialize_mode``
    picks the shared-subtree cut strategy (operators/materialize.py):
    the 'local_checkpoint' default is fastest but forfeits executor-loss
    recovery — pass 'checkpoint' or 'persist' on a real cluster with
    preemptible executors.
    """
    if materialize_mode == "none":
        return _banded_pairs(df, text_col, id_col, num_hashes, bands,
                             shingle_n, materialize_mode
                             ).select("id_a", "id_b").distinct()
    cand, _ = _sig_and_candidates(df, text_col, id_col, num_hashes, bands,
                                  shingle_n, materialize_mode)
    return cand


def minhash_band_index(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 32,
                       bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """The persistable LSH index table: ``(id, m0..m{n-1}, band,
    band_hash)`` — one row per (document, band), flat signature columns
    carried so pair estimates never re-join the signature source.

    This is the at-rest artifact of the incremental-dedup loop: build it
    once over the corpus, write it as parquet, and dedup each new batch
    against it with :func:`incremental_minhash_pairs` — the corpus text is
    never re-tokenized. Storage is bands × (num_hashes+3) small columns
    per doc (≈ bands × num_hashes × 8 bytes), ~0.1-1% of a text corpus."""
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, shingle_n)
    return sig.select(
        "id", *[f"m{i}" for i in range(num_hashes)],
        F.posexplode(F.array(*_band_hash_cols(num_hashes, bands)))
        .alias("band", "band_hash"),
    )


def _band_hash_cols(num_hashes: int, bands: int) -> list[Column]:
    """The per-band md5 key expressions over flat signature columns —
    shared by :func:`minhash_band_index` and the slim candidate join so
    the band hashes are bit-identical wherever they are derived."""
    rows_per_band = num_hashes // bands
    return [
        F.md5(F.concat_ws(",", *[
            F.col(f"m{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)]))
        for b in range(bands)
    ]


def _sig_and_candidates(df: DataFrame, text_col: str, id_col: str,
                        num_hashes: int, bands: int, shingle_n: int,
                        materialize_mode: str,
                        ) -> tuple[DataFrame, DataFrame]:
    """Materialize the NARROW signature table (one row per doc,
    ``num_hashes``+1 columns) and self-join a slim ``(id, band,
    band_hash)`` projection of it for candidate pairs. Returns
    ``(distinct (id_a, id_b) pairs, materialized signature table)`` so
    the caller can re-attach signatures to the (much smaller) pair set.

    Round 16, guide §2.3/§5: the previous shape materialized the full
    BANDED table — ``bands`` rows per doc, each carrying all signature
    columns (8× duplicated signatures at the defaults) — and dragged
    2·num_hashes signature columns through the join and the distinct.
    Cutting the plan at the signature table instead stores 1 row per doc,
    joins 3-column rows, and dedups bare pairs before anything wide is
    attached (measured min-of-6 interleaved at sf0.1: 2.20 s → 2.06 s;
    at scale the distinct's exchange shrinks by the full signature
    width). Requires a real materialization — the 'none' fallback keeps
    the carry-the-signatures shape (see the callers)."""
    sig = materialize(
        minhash_signature_table(df, text_col, id_col, num_hashes, shingle_n),
        materialize_mode)
    slim = sig.select(
        "id", F.posexplode(F.array(*_band_hash_cols(num_hashes, bands)))
        .alias("band", "band_hash"))
    # one-sided pin (see _pin_join_parallelism): probe side pinned, bare
    # side free to feed a BroadcastExchange without a wasted shuffle
    a = _pin_join_parallelism(slim, "band", "band_hash").alias("a")
    b = slim.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return cand, sig


def _banded_pairs(df: DataFrame, text_col: str, id_col: str,
                  num_hashes: int, bands: int, shingle_n: int,
                  materialize_mode: str = "local_checkpoint") -> DataFrame:
    """Band-collision pairs with both flat signatures carried through the
    join (columns ``id_a, id_b, a.m*, b.m*``; one row per colliding band).
    Since round 16 this is only the ``materialize_mode='none'`` path: with
    no cut, BOTH self-join sides repartition on the same (keys, count) —
    identical pinned exchanges are what lets AQE reuse the banded
    subtree's shuffle stage across the sides, so the expensive signature
    aggregation runs once, and carrying the signatures through the join
    avoids two more full recomputations at the re-attach joins.
    Materialized modes use :func:`_sig_and_candidates` instead."""
    banded = minhash_band_index(df, text_col, id_col, num_hashes, bands,
                                shingle_n)
    a = _pin_join_parallelism(banded, "band", "band_hash").alias("a")
    b = _pin_join_parallelism(banded, "band", "band_hash").alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                *[F.col(f"a.m{i}").alias(f"am{i}") for i in range(num_hashes)],
                *[F.col(f"b.m{i}").alias(f"bm{i}") for i in range(num_hashes)])
    )


def minhash_similarity(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 32,
                       bands: int = 8, shingle_n: int = 3,
                       threshold: float = 0.5,
                       materialize_mode: str = "local_checkpoint",
                       ) -> DataFrame:
    """Candidate pairs + estimated Jaccard (fraction of agreeing MinHash
    rows), filtered to ``threshold``.

    Materialized modes (round 16): the distinct candidate pairs come from
    the slim band join (:func:`_sig_and_candidates`) and the signatures
    re-attach to the PAIR set — two joins against the materialized
    signature table, which at any realistic duplicate mass is orders of
    magnitude smaller than dragging 2·num_hashes signature columns
    through the band join and its distinct. With ``'none'`` (no cut) the
    signatures stay carried through the join — re-attaching would
    recompute the full signature aggregation twice more."""
    if materialize_mode == "none":
        agree = F.lit(0)
        for i in range(num_hashes):
            agree = agree + (F.col(f"am{i}") == F.col(f"bm{i}")).cast("int")
        return (
            _banded_pairs(df, text_col, id_col, num_hashes, bands, shingle_n,
                          materialize_mode)
            .select("id_a", "id_b",
                    (agree / F.lit(num_hashes)).alias("est_jaccard"))
            # threshold before the distinct: commutes (est is a pure
            # function of the row), shrinks the dedup exchange (§2.3)
            .filter(F.col("est_jaccard") >= threshold)
            .distinct()
        )
    cand, sig = _sig_and_candidates(df, text_col, id_col, num_hashes, bands,
                                    shingle_n, materialize_mode)
    agree = F.lit(0)
    for i in range(num_hashes):
        agree = agree + (F.col(f"sa.m{i}") == F.col(f"sb.m{i}")).cast("int")
    return (
        cand.join(sig.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sig.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b",
                (agree / F.lit(num_hashes)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def incremental_minhash_pairs(new_docs: DataFrame, index: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", num_hashes: int = 32,
                              bands: int = 8, shingle_n: int = 3,
                              threshold: float = 0.5,
                              broadcast_new: bool = True,
                              materialize_mode: str = "local_checkpoint",
                              new_index: DataFrame | None = None,
                              ) -> DataFrame:
    """Incremental dedup: near-dup pairs for a NEW batch of documents
    against an existing corpus LSH ``index`` (built once by
    :func:`minhash_band_index`, typically read back from parquet) plus
    within-batch pairs — without recomputing any corpus signature.

    This is the 100 TB operating mode: a daily crawl batch is ~0.1% of
    the corpus, so re-running the full-corpus LSH join per batch is 1000×
    wasted work. Here only the batch is shingled; the batch's banded
    table (tiny) is broadcast against the index scan, so the corpus side
    never shuffles — the join is a map-side hash probe per index row.
    Pass ``broadcast_new=False`` when the batch is too large to broadcast
    (falls back to a shuffled equi-join on the band key).

    ``new_docs`` ids should be disjoint from the ids in ``index`` (the
    caller's batch boundary guarantees this); an id appearing on both
    sides never self-pairs — the vs-index join carries an explicit
    ``a.id != b.id`` guard so a batch replayed after index compaction
    (its signatures folded into ``batch=-1``) stays harmless — its
    within-batch pairs then surface from both the vs-index and vs-self
    branches and collapse in the shared distinct.
    Returns ``(id_a, id_b, est_jaccard)`` with
    id_a < id_b, est ≥ ``threshold``; pairs are new×corpus and new×new —
    never corpus×corpus (those were emitted when the index was built).

    After the batch is processed, append the batch's banded table to the
    index (it has exactly the index schema) — the index grows by one
    cheap parquet append per batch. Callers that also persist the batch's
    banded table (the streaming loop does) pass it as ``new_index`` so it
    is computed exactly once."""
    want_cols = {"id", "band", "band_hash",
                 *(f"m{i}" for i in range(num_hashes))}
    if set(index.columns) != want_cols:
        # a num_hashes mismatch fails the join loudly (missing m columns),
        # but a BANDS mismatch would silently miss pairs — band hashes
        # cover different signature rows. The schema check catches the
        # former up front; callers own keeping (num_hashes, bands,
        # shingle_n) constant for an index's lifetime (record them next
        # to the index).
        raise ValueError(
            f"index columns {sorted(index.columns)} do not match the "
            f"minhash_band_index schema for num_hashes={num_hashes} "
            f"(expected {sorted(want_cols)}); was the index built with "
            f"different parameters?")
    newb = new_index if new_index is not None else materialize(
        minhash_band_index(new_docs, text_col, id_col, num_hashes, bands,
                           shingle_n),
        materialize_mode)

    agree = F.lit(0)
    for i in range(num_hashes):
        agree = agree + (F.col(f"am{i}") == F.col(f"bm{i}")).cast("int")

    def pairs_of(joined: DataFrame) -> DataFrame:
        return (
            joined.select("id_a", "id_b",
                          (agree / F.lit(num_hashes)).alias("est_jaccard"))
            # threshold before the distinct: commutes (est is a pure
            # function of the row), shrinks the dedup exchange (§2.3)
            .filter(F.col("est_jaccard") >= threshold)
            .distinct()
        )

    def carry(a: DataFrame, b: DataFrame, cond) -> DataFrame:
        return a.join(b, cond).select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            *[F.col(f"a.m{i}").alias(f"am{i}") for i in range(num_hashes)],
            *[F.col(f"b.m{i}").alias(f"bm{i}") for i in range(num_hashes)])

    new_side = F.broadcast(newb) if broadcast_new else newb
    # id inequality on the vs-index side: batch ids are NORMALLY disjoint
    # from index ids (the batch boundary), but a batch replayed after
    # `compact_dedup_index` finds its own signatures inside the compacted
    # ``batch=-1`` partition, which the current-batch exclusion filter
    # cannot remove — without this free guard the replay would emit
    # spurious (id, id, 1.0) self-pairs.
    vs_index = carry(
        new_side.alias("a"), index.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") != F.col("b.id")))
    pinned = _pin_join_parallelism(newb, "band", "band_hash")
    # one-sided pin only when the frame is actually materialized (mode
    # != 'none', or the caller handed us its own materialized new_index);
    # an unmaterialized self-join needs BOTH sides pinned identically so
    # AQE reuses the shared subtree's shuffle stage instead of
    # recomputing the signature aggregation on the bare side
    self_b = (newb if new_index is not None or materialize_mode != "none"
              else _pin_join_parallelism(newb, "band", "band_hash"))
    vs_self = carry(
        pinned.alias("a"), self_b.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")))
    # one distinct over the union (not one per branch): a pair surfacing
    # from both branches (replay-after-compaction) collapses here, and
    # the est_jaccard is a deterministic function of the two signatures,
    # so the duplicate rows are value-identical.
    return pairs_of(vs_index.unionByName(vs_self))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None,
                        materialize_mode: str = "local_checkpoint",
                        ) -> DataFrame:
    """Exact n-gram Jaccard near-dup: explode distinct shingles, self-join
    on shingle to get intersection sizes (only pairs sharing ≥1 shingle —
    never the full O(n²) space), then |A∩B| / (|A|+|B|−|A∩B|).

    ``max_shingle_df`` is the scale guard: the self-join is quadratic in a
    shingle's document frequency, so one boilerplate shingle appearing in
    K docs materializes K² pair rows. The cap pre-aggregates shingle df
    and drops shingles with df > cap from BOTH the intersection and the
    per-doc sizes (stopword-shingle semantics — the remaining Jaccard is
    exact over the kept shingle sets). The dropped set is tiny (only
    ultra-common shingles) → broadcast anti-join, no extra shuffle of the
    exploded stream."""
    sh = spread_for_cpu(df).select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"))
    exploded = sh.select("id", F.explode("sh").alias("g"))
    if max_shingle_df is not None:
        hot = (exploded.groupBy("g").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_shingle_df).select("g"))
        exploded = exploded.join(F.broadcast(hot), "g", "left_anti")
    # Materialize the exploded shingle stream once: it feeds BOTH
    # self-join sides (and, under the cap, the per-doc sizes), and the
    # planner duplicates the subtree rather than reuse it (see
    # operators/materialize.py). Storage here is the full shingle stream —
    # heavier than the signature cuts, but recomputing the explode 2-3×
    # measured slower at sf0.1 (4.38 s → 4.05 s with the cut).
    exploded = materialize(exploded, materialize_mode)
    if max_shingle_df is not None:
        sizes = exploded.groupBy("id").agg(F.count("*").alias("n_sh"))
    else:
        sizes = sh.select("id", F.size("sh").alias("n_sh"))
    # pin rule (see _pin_join_parallelism): one side on a materialized
    # frame (the bare side may feed a broadcast shuffle-free), both
    # sides under 'none' so AQE reuses the shared subtree's exchange
    a = _pin_join_parallelism(exploded, "g").alias("a")
    b = (_pin_join_parallelism(exploded, "g")
         if materialize_mode == "none" else exploded).alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, inter.id_a == F.col("sa.id"))
        .join(sb, inter.id_b == F.col("sb.id"))
        .select(
            "id_a", "id_b",
            (F.col("inter")
             / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter")))
            .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _check_simhash_bits(bits: int) -> None:
    """The hash source is :func:`_portable_hash64` — 15 hex chars < 2^60 —
    so bits 60-63 are never set; worse, ``F.lit(1 << 63)`` exceeds int64
    and becomes a decimal literal whose long cast is NULL (a silently-dead
    bit-63 branch). Cap the advertised width at what the hash can fill."""
    if bits > 60:
        raise ValueError(
            f"simhash bits={bits}: the md5-derived 60-bit hash cannot fill "
            f"bits above 59 (and 1<<63 overflows a Spark long literal); "
            f"use bits <= 60")


def simhash(text: Column, bits: int = 60, shingle_n: int = 2) -> Column:
    """SimHash: per-bit majority vote over shingle hashes. Bit k of the
    fingerprint is 1 iff more shingle hashes have bit k set than not
    (strictly — ties leave the bit 0). Entirely `aggregate`/`transform`
    expressions (no UDF).

    Per-hash work is kept to shift+and+add per bit: accumulating raw
    ones-counts and comparing ``2·ones > n`` at the end is ~2× cheaper in
    generated code than the ±1-vote array formulation (no `when`, no cast,
    no second array build per element)."""
    _check_simhash_bits(bits)
    hashes = F.transform(shingles(text, shingle_n), _portable_hash64)
    # Single aggregate with a finish lambda. The accumulator is a lambda
    # VARIABLE there, so referencing it per bit is an array access — any
    # formulation that references the hash-array subtree again outside the
    # aggregate (e.g. `size(hashes)` inside a later zip_with lambda) gets
    # that whole md5-per-shingle subtree re-inlined per element: measured
    # >15× slowdown, not a micro-optimization.
    # acc[k] (k < bits) = number of shingle hashes with bit k set;
    # acc[bits] = total hash count.
    init = F.array_repeat(F.lit(0).cast("long"), bits + 1)

    def merge(acc: Column, h: Column) -> Column:
        return F.array(*(
            [acc.getItem(k) + F.shiftright(h, k).bitwiseAND(1)
             for k in range(bits)]
            + [acc.getItem(bits) + 1]
        ))

    def finish(acc: Column) -> Column:
        n = acc.getItem(bits)
        out = F.lit(0).cast("long")
        for k in range(bits):
            out = out + F.when(acc.getItem(k) * 2 > n,
                               F.lit(1 << k).cast("long")).otherwise(0)
        return out

    return F.aggregate(hashes, init, merge, finish)


def simhash_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 60,
                  shingle_n: int = 2) -> DataFrame:
    """(id, simhash) via explode + groupBy with flat per-bit SUM aggregates.

    Same math as :func:`simhash`, ~1.5× faster: higher-order-function
    lambdas evaluate interpreted per element, while flat aggregate
    expressions stay inside whole-stage codegen with map-side partial
    aggregation. Each document's shingles live in its own input row, so
    the partial aggregate finishes per doc map-side and the shuffle moves
    ONE row per document — no blow-up at scale.

    Measured non-win (round 6): packing 4×16-bit counter lanes per long
    (16 SUM buffers instead of 61) is within noise at sf0.1 (interleaved
    min 1.89 s vs 1.78 s) — the md5-per-shingle explode dominates, not
    aggregation buffer count. Not worth the lane-overflow caveat."""
    _check_simhash_bits(bits)
    ex = spread_for_cpu(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"))
    ex = ex.select("id", _portable_hash64(F.col("g")).alias("h"))
    aggs = [F.sum(F.shiftright("h", k).bitwiseAND(1)).alias(f"_c{k}")
            for k in range(bits)] + [F.count("*").alias("_n")]
    counts = ex.groupBy("id").agg(*aggs)
    value = F.lit(0).cast("long")
    for k in range(bits):
        value = value + F.when(
            F.col(f"_c{k}") * 2 > F.col("_n"),
            F.lit(1 << k).cast("long")).otherwise(0)
    return counts.select("id", value.alias("sh"))


def simhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 60,
                       max_hamming: int = 3, blocks: int = 4,
                       materialize_mode: str = "local_checkpoint",
                       method: str = "pigeonhole",
                       n_tables: int = 16,
                       bits_per_table: int = 16) -> DataFrame:
    """SimHash near-dup candidates: split the fingerprint into ``blocks``
    bit-blocks (pigeonhole: pairs within ``max_hamming`` ≤ blocks-1 bit
    diffs must agree on ≥1 block), equi-join per block, then exact Hamming
    filter via bit_count(xor).

    Blocks are variable-width (bits need not divide evenly), so callers
    should use the MINIMUM block count for their radius —
    ``max_hamming + 1`` — because candidate volume scales as
    rows² · blocks / 2^(bits/blocks): fewer, wider blocks mean
    exponentially more buckets and quadratically fewer join collisions
    (10×6-bit → 7×8.5-bit blocks cut sf0.1 candidate pairs ~5×).

    Measured growth (SCALE.md): the join volume is QUADRATIC in corpus
    size at fixed radius — at 50k docs, radius 6 (7×8.5-bit blocks)
    yields 26.3M collisions where radius 3 (4×15-bit) yields 180k and
    radius 2 (3×20-bit) 6.8k. Prefer the tightest radius the dedup
    policy allows; treat radius 6 at 60 bits as a ≤100k-docs-per-shard
    tool and use MinHash-LSH (duplicate-mass-bound, measured linear) for
    corpus-wide sweeps.

    ``method='banded'`` swaps the complete pigeonhole join for the
    banded multi-index join (:func:`hamming_banded_pairs`,
    ``n_tables``×``bits_per_table``-bit sampled keys): ~2 orders of
    magnitude fewer candidates at the round-10 probe, probabilistic
    recall (:func:`banded_hamming_recall`) — the corpus-wide simhash
    sweep when MinHash-LSH's shingle cost is the bottleneck and a
    bounded miss rate is acceptable."""
    sh = simhash_table(df, text_col, id_col, bits)
    if method == "banded":
        return hamming_banded_pairs(sh, bits, max_hamming, n_tables,
                                    bits_per_table,
                                    materialize_mode=materialize_mode)
    if method != "pigeonhole":
        raise ValueError(f"unknown method {method!r}; "
                         f"one of ['pigeonhole', 'banded']")
    return hamming_neardup_pairs(sh, bits, max_hamming, blocks,
                                 materialize_mode)


def hamming_neardup_pairs(sh: DataFrame, bits: int = 60,
                          max_hamming: int = 3, blocks: int = 4,
                          materialize_mode: str = "local_checkpoint",
                          ) -> DataFrame:
    """The fingerprint-agnostic tail of :func:`simhash_candidates`: given
    any ``(id, sh)`` table of ``bits``-bit fingerprints (SimHash over
    text, perceptual image hashes, …), produce all pairs within
    ``max_hamming`` via the pigeonhole bit-block equi-join + exact
    bit_count(xor) filter. Same quadratic-at-fixed-radius scale label as
    SimHash (SCALE.md) — the candidate volume depends only on the
    fingerprint distribution, not on what was hashed."""
    if blocks <= max_hamming:
        raise ValueError(
            f"pigeonhole completeness needs blocks > max_hamming "
            f"({blocks} <= {max_hamming}): a pair with {max_hamming} "
            f"differing bits could touch every block")
    base, rem = divmod(bits, blocks)
    sizes = [base + 1 if i < rem else base for i in range(blocks)]
    offsets = [sum(sizes[:i]) for i in range(blocks)]

    def blocked_of(frame: DataFrame) -> DataFrame:
        return frame.select(
            "id", "sh",
            F.posexplode(F.array(*[
                F.shiftright("sh", offsets[i]).bitwiseAND((1 << sizes[i]) - 1)
                for i in range(blocks)
            ])).alias("blk", "blk_val"),
        )

    # Round 16 (guide §2.3/§5): cut the plan at the NARROW (id, sh) table
    # — 2 columns, one row per doc — instead of the blocked table (blocks
    # rows per doc); the per-block posexplode is a trivial projection each
    # join side re-derives from the materialized blocks. Under 'none' (no
    # cut) a single blocked subtree feeds both sides through identical
    # pinned exchanges so AQE reuses the shuffle stage — the expensive
    # per-bit aggregation still runs once.
    if materialize_mode == "none":
        blocked = blocked_of(sh)
        a = _pin_join_parallelism(blocked, "blk", "blk_val").alias("a")
        b = _pin_join_parallelism(blocked, "blk", "blk_val").alias("b")
    else:
        cut = materialize(sh.select("id", "sh"), materialize_mode)
        # one-sided pin (see _pin_join_parallelism)
        a = _pin_join_parallelism(blocked_of(cut), "blk", "blk_val").alias("a")
        b = blocked_of(cut).alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.blk_val") == F.col("b.blk_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                .alias("hamming"))
        # filter BEFORE the distinct: candidate collisions are quadratic
        # in bucket load (328k rows at sf0.1 radius 6) while true pairs
        # are rare (992) — the exact-verify predicate commutes with
        # distinct and shrinks its exchange ~330× (guide §2.3).
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def banded_bit_positions(bits: int, n_tables: int, bits_per_table: int,
                         seed: int = 0xDA7A) -> list[list[int]]:
    """The deterministic bit-sampling plan behind
    :func:`hamming_banded_pairs`: for each of ``n_tables`` index
    tables, a sorted sample of ``bits_per_table`` distinct bit
    positions, drawn at PLAN time (driver-side constant —
    reproducible across runs/engines, and small enough to inline into
    an oracle restatement).

    The draws come from an explicit Fisher–Yates partial shuffle whose
    randomness is md5 of ``"{seed}:{table}:{step}"`` — the same
    portable hash family the repo's data-path hashing uses — NOT
    ``random.Random.sample()``: Python documents cross-version output
    stability only for ``Random.random()``, so a stdlib-``sample``
    plan could silently change under a Python upgrade and stop
    matching every persisted :func:`hamming_banded_index`. md5 is
    format-frozen forever, so the same (bits, n_tables,
    bits_per_table, seed) always yields the same plan on any Python /
    any engine; the streaming sidecar additionally persists the
    concrete position lists and verifies them on every reopen
    (streaming/dedup_stream.hamming_dedup_batch).

    MIGRATION (round 11): the derivation changed from
    ``random.Random.sample`` to this md5 scheme, so the same
    parameters now produce a DIFFERENT plan than indexes persisted
    before the change. Persisted :func:`hamming_banded_index` tables
    from the old derivation must be REBUILT (re-key the fingerprints,
    rewrite the partitions) — their keys were cut from different bit
    samples and would silently miss pairs against new-plan keys. The
    streaming path fails loudly (sidecar position-list + ``bit_plan``
    verification names this change); non-streaming consumers of an
    old persisted index must rebuild it themselves."""
    import hashlib

    if bits_per_table > bits:
        raise ValueError(
            f"bits_per_table={bits_per_table} > bits={bits}")
    out = []
    for t in range(n_tables):
        arr = list(range(bits))
        for i in range(bits_per_table):
            draw = int.from_bytes(
                hashlib.md5(f"{seed}:{t}:{i}".encode()).digest()[:8],
                "big")
            j = i + draw % (bits - i)
            arr[i], arr[j] = arr[j], arr[i]
        out.append(sorted(arr[:bits_per_table]))
    return out


def banded_hamming_recall(bits: int, hamming: int, n_tables: int,
                          bits_per_table: int) -> float:
    """Expected recall of :func:`hamming_banded_pairs` for a pair at
    exactly ``hamming`` differing bits (uniform over positions): one
    table catches the pair iff its sample avoids every differing bit —
    p = C(bits−h, r)/C(bits, r) — and the tables are independent
    samples, so recall = 1 − (1 − p)^L. The planning function for the
    (n_tables, bits_per_table) tradeoff: wider tables → fewer random
    candidate collisions (linear growth) but lower per-table p; more
    tables buy the recall back at linear cost."""
    from math import comb

    if hamming > bits - bits_per_table:
        return 0.0
    p = comb(bits - hamming, bits_per_table) / comb(bits, bits_per_table)
    return 1.0 - (1.0 - p) ** n_tables


def hamming_banded_pairs(sh: DataFrame, bits: int = 60,
                         max_hamming: int = 6, n_tables: int = 16,
                         bits_per_table: int = 16, seed: int = 0xDA7A,
                         materialize_mode: str = "local_checkpoint",
                         ) -> DataFrame:
    """Banded multi-index near-dup pairs over ``bits``-bit fingerprints
    — the LINEAR-GROWTH sibling of :func:`hamming_neardup_pairs`, and
    the Hamming-space analogue of MinHash banding: each of
    ``n_tables`` index tables keys every fingerprint by a fixed
    ``bits_per_table``-bit sample of its bits
    (:func:`banded_bit_positions`), candidates come from the
    (table, key) equi-join, and an exact ``bit_count(xor)`` filter
    verifies ``≤ max_hamming``.

    The scale tradeoff the pigeonhole join cannot make: completeness is
    traded for candidate volume. Pigeonhole blocks must be NARROW
    (bits/(max_hamming+1) ≈ 8 bits at radius 6) to guarantee every
    true pair collides, and 2^8 buckets over a large corpus collide
    quadratically (measured: 26.3M candidates at 50k docs, SCALE.md).
    Here each key is WIDE (2^16 buckets at the default) so the random
    collision term — Θ(n²·L/2^r), intrinsic to blocking random
    fingerprints at a fixed radius — carries a ~180× smaller constant
    (2^16 vs 2^8.5 buckets; measured 71× fewer candidates at 50k docs,
    SCALE.md, with TRUE-pair volume exactly linear), is tunable via
    ``bits_per_table`` and shrinks quadratically with longer
    fingerprints (256-bit pHash → 2^32-wide keys); recall is
    probabilistic instead of guaranteed:
    1 − (1 − C(bits−h, r)/C(bits, r))^L per true pair
    (:func:`banded_hamming_recall`; defaults give ≈0.91 at h=6,
    ≥0.999 at h≤3, 1.0 at h=0 — tune L/r per policy). The output is
    still DETERMINISTIC (the bit samples are plan-time constants) and
    every emitted pair is exact-verified — banding only decides which
    pairs are LOOKED AT, never admits a false positive.

    Use this for corpus-wide image/SimHash sweeps where
    :func:`hamming_neardup_pairs` is documented as a
    ≤100k-docs-per-shard tool; keep the pigeonhole join where missing
    even one true pair is unacceptable and the shard bound holds.

    Same scale discipline as every pair generator here: one
    materialization cut feeding both self-join sides, pinned reduce
    parallelism on the (table, key) join (the measured AQE
    serialization hazard), distinct after the verify."""
    # Same round-16 shape as hamming_neardup_pairs: cut at the narrow
    # (id, sh) table (the n_tables-way key explode re-derives cheaply per
    # side); under 'none' both sides pin the same keyed exchange so AQE
    # reuses the single shuffle stage.
    if materialize_mode == "none":
        tabled = hamming_banded_index(sh, bits, n_tables, bits_per_table,
                                      seed)
        a = _pin_join_parallelism(tabled, "tbl", "key").alias("a")
        b = _pin_join_parallelism(tabled, "tbl", "key").alias("b")
    else:
        cut = materialize(sh.select("id", "sh"), materialize_mode)
        tabled = hamming_banded_index(cut, bits, n_tables, bits_per_table,
                                      seed)
        # one-sided pin (see _pin_join_parallelism)
        a = _pin_join_parallelism(tabled, "tbl", "key").alias("a")
        b = hamming_banded_index(cut, bits, n_tables, bits_per_table,
                                 seed).alias("b")
    return (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                .alias("hamming"))
        # exact-verify filter before the distinct — collisions are
        # quadratic in bucket load, survivors are the true-pair mass
        # (guide §2.3); identical result set either way.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hamming_banded_index(sh: DataFrame, bits: int = 60,
                         n_tables: int = 16, bits_per_table: int = 16,
                         seed: int = 0xDA7A) -> DataFrame:
    """The persistable banded-key table behind
    :func:`hamming_banded_pairs`: ``(id, sh, tbl, key)`` — one row per
    fingerprint per index table, keys from the plan-time bit samples
    (:func:`banded_bit_positions`). Write it to parquet once and
    :func:`incremental_hamming_pairs` probes it per batch without
    re-keying the corpus — the exact analogue of
    :func:`minhash_band_index` for Hamming-space fingerprints
    (perceptual image hashes, SimHash). The fingerprint rides along so
    the verify step never needs a second corpus join. Keep
    (bits, n_tables, bits_per_table, seed) constant for an index's
    lifetime — record them next to the index (the streaming loops'
    sidecar convention)."""
    positions = banded_bit_positions(bits, n_tables, bits_per_table, seed)
    keys = []
    for pos in positions:
        key = F.lit(0).cast("long")
        for i, p in enumerate(pos):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright("sh", p).bitwiseAND(1), i))
        keys.append(key)
    return sh.select(
        "id", "sh", F.posexplode(F.array(*keys)).alias("tbl", "key"))


def incremental_hamming_pairs(new_sh: DataFrame, index: DataFrame,
                              bits: int = 60, max_hamming: int = 6,
                              n_tables: int = 16, bits_per_table: int = 16,
                              seed: int = 0xDA7A,
                              broadcast_new: bool = True,
                              materialize_mode: str = "local_checkpoint",
                              new_index: DataFrame | None = None,
                              ) -> DataFrame:
    """Incremental Hamming near-dup: pairs for a NEW batch of
    fingerprints against a stored banded ``index``
    (:func:`hamming_banded_index`, typically read back from parquet)
    plus within-batch pairs — without re-keying any corpus fingerprint.
    The image/SimHash twin of :func:`incremental_minhash_pairs`, and
    the 100 TB operating mode for perceptual-hash dedup: only the batch
    is keyed, the batch's banded table (tiny) is BROADCAST against the
    index scan, and the corpus side never shuffles. Pass
    ``broadcast_new=False`` for an over-broadcast-size batch (falls
    back to a shuffled equi-join on (tbl, key)).

    Same replay-safety contract as the MinHash twin: the vs-index join
    carries an explicit ``a.id != b.id`` guard, so a batch replayed
    after its keys were folded into the index stays harmless (its
    within-batch pairs surface from both branches and collapse in the
    shared distinct). Returns ``(id_a, id_b, hamming)`` with
    id_a < id_b, hamming ≤ ``max_hamming``; pairs are new×corpus and
    new×new — never corpus×corpus (emitted when the index was built).
    Recall semantics are the banded join's
    (:func:`banded_hamming_recall`). After the batch, append
    ``new_index`` (exactly the index schema) — one cheap parquet append
    per batch."""
    want_cols = {"id", "sh", "tbl", "key"}
    if set(index.columns) != want_cols:
        raise ValueError(
            f"index columns {sorted(index.columns)} do not match the "
            f"hamming_banded_index schema {sorted(want_cols)}; was the "
            f"index built with hamming_banded_index and the same "
            f"parameters?")
    new_tab = (new_index if new_index is not None
               else hamming_banded_index(new_sh, bits, n_tables,
                                         bits_per_table, seed))
    new_tab = materialize(new_tab, materialize_mode)
    probe = F.broadcast(new_tab) if broadcast_new else \
        _pin_join_parallelism(new_tab, "tbl", "key")
    store = index if broadcast_new else \
        _pin_join_parallelism(index, "tbl", "key")
    vs_index = (
        probe.alias("a").join(
            store.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") != F.col("b.id")))
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
            .alias("hamming")))
    # one-sided pin when the frame is materialized; both sides under an
    # unmaterialized 'none' (AQE exchange-stage reuse — see the MinHash
    # twin above)
    a = _pin_join_parallelism(new_tab, "tbl", "key").alias("a")
    b = (new_tab if new_index is not None or materialize_mode != "none"
         else _pin_join_parallelism(new_tab, "tbl", "key")).alias("b")
    vs_self = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                .alias("hamming")))
    # exact-verify filter before the distinct (§2.3): collisions are
    # quadratic in bucket load, survivors are the true-pair mass.
    return (vs_index.unionByName(vs_self)
            .filter(F.col("hamming") <= max_hamming)
            .distinct())
