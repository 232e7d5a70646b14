"""Trained-model import for the classifier surface — the bridge from an
OFFLINE-trained text classifier (fastText-style supervised model, a
sklearn linear head, any token→weight export) to this package's
hashing-trick inference operators (operators/text.py
:func:`~..operators.text.hashed_linear_score`), plus the multi-class
head that upgrades :func:`~..operators.text.lang_id` from marker-list
heuristics to real model weights.

Why this exists: language ID and quality scoring are the first two
MODEL passes of every production corpus funnel (CCNet/GPT-3 tradition —
a tiny linear model trained offline, applied to every crawl document).
The inference operators score any ``(bucket, weight)`` table, but a
real deployment starts from an exported model FILE; this module is the
loader that turns such a file into the broadcastable weight tables the
operators consume, entirely inside the DataFrame API (the model file is
read DISTRIBUTED — a 10 GB ``.vec`` export is just another text scan).

File format — the fastText ``.vec`` text convention (public format:
first line ``<n_rows> <dim>``, then one row per token:
``token v1 v2 ... v<dim>``, whitespace-separated). A binary
(single-output) model is ``dim=1``; a supervised multi-class export is
``dim=k`` with a caller-supplied ``labels`` list mapping vector
positions to class names (fastText's ``__label__x`` order).

Hash-collision policy: tokens that land in the same bucket have their
weights SUMMED (the standard hashing-trick estimator — collisions are
noise the training already tolerates, and summation keeps the loaded
table exactly equivalent to scoring with per-token weights when there
are no collisions). The per-bucket sum folds a TOKEN-SORTED array so
both engines add the floats in the same order (the same cross-engine
float-sum pinning as temperature_mixture's denominator).

Reference analogue: none — the reference service runs no model passes
(`/root/reference/app.js` is a harvest/extract pipeline); this is
extension surface for the LLM-corpus funnel (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_vec_model(spark: SparkSession, path: str,
                    dim: int | None = None) -> DataFrame:
    """Distributed parse of a fastText-style ``.vec`` text export into
    ``(token string, vec array<double>)``.

    * header lines (the two-field ``<n> <dim>`` convention) are dropped
      wherever they appear — a concatenated/partitioned export may
      carry one per part-file. A row is a header only when it is
      all-integer AND has exactly 2 fields (plus, with ``dim`` given
      and ≠ 1, any all-integer row of the wrong arity): a legitimate
      data row whose token is numeric and whose weights are
      integer-formatted (a quantized export's ``2020 1 0 0 0 0``) is
      DATA, not a header, and is loaded;
    * ``dim``, when given, is ENFORCED in-plan (a ``when``/
      ``raise_error`` guard inside the vec column): a row with the
      wrong arity or an unparsable float fails the scan loudly instead
      of feeding NULL weights downstream.

    One text scan, pure column expressions — no driver-side parsing, so
    the model file can be arbitrarily large and lands already
    partitioned for the hash step."""
    parts = F.split(F.trim(F.col("value")), r"\s+")
    all_int = F.trim(F.col("value")).rlike(r"^[0-9]+(\s+[0-9]+)*$")
    # Two-field all-integer = header, ALWAYS (the .vec convention —
    # every export leads with '<n> <dim>', so at dim=1 a header is
    # shape-identical to a data row and the convention wins); with dim
    # known, an all-integer row of any OTHER wrong arity is also
    # skipped as header debris rather than fed to the arity guard.
    header = all_int & (F.size(parts) == 2)
    if dim is not None and dim != 1:
        header = header | (all_int & (F.size(parts) != dim + 1))
    skip = (F.trim(F.col("value")) == "") | header
    vec = F.transform(F.slice(parts, 2, F.size(parts) - 1),
                      lambda v: v.cast("double"))
    if dim is not None:
        # two subtleties: the guard lives INSIDE the vec column
        # (when/raise_error — a dropped assert_true column would be
        # pruned away with the projection), and it re-tests the
        # header/blank condition itself (Catalyst is free to evaluate
        # projection expressions before or interleaved with the
        # header-dropping filter, so the guard must not fire on rows
        # the filter is about to discard).
        ok = (F.size(vec) == dim) & ~F.exists(vec, lambda v: v.isNull())
        vec = F.when(skip, F.lit(None).cast("array<double>")) \
            .when(ok, vec) \
            .otherwise(F.raise_error(F.concat(
                F.lit(f"parse_vec_model: expected {dim} parsable floats "
                      f"per row, got a malformed row for token "),
                parts.getItem(0))))
    return (spark.read.text(path)
            .filter(~skip)
            .select(parts.getItem(0).alias("token"), vec.alias("vec")))


def hash_vec_weights(vecs: DataFrame, labels: list[str],
                     n_buckets: int = 1024,
                     salt: str = "clf") -> DataFrame:
    """Fold a parsed ``(token, vec)`` model into the long-form
    multi-class weight table ``(bucket, label, weight)`` consumed by
    :func:`hashed_multiclass_score`.

    ``bucket`` is the SAME hashing-trick bucket the scorer assigns to
    document tokens (``floor(hash_fraction(token, salt) · n_buckets)``)
    — loader and scorer must share ``salt``/``n_buckets`` or every
    lookup misses. Colliding tokens' weights are summed over a
    token-sorted fold (see module docstring), rounded to 6 dp so the
    broadcast table is bit-identical across engines.

    Output is at most ``n_buckets × len(labels)`` rows — broadcast
    material by construction, never a shuffle partner."""
    if len(set(labels)) != len(labels):
        raise ValueError(f"hash_vec_weights: duplicate labels {labels}")
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    label_arr = F.array(*[F.lit(str(lb)) for lb in labels])
    bucket = F.floor(hash_fraction(F.col("token"), salt)
                     * F.lit(n_buckets)).cast("long")
    exploded = vecs.select(
        bucket.alias("bucket"), F.col("token"),
        F.posexplode(F.col("vec")).alias("i", "w")).select(
        "bucket", F.element_at(label_arr, F.col("i") + 1).alias("label"),
        "token", "w")
    return (exploded.groupBy("bucket", "label")
            .agg(F.sort_array(F.collect_list(F.struct("token", "w")))
                 .alias("_ws"))
            .select("bucket", "label",
                    F.round(F.aggregate(
                        "_ws", F.lit(0.0),
                        lambda acc, s: acc + s.getField("w")), 6)
                    .alias("weight")))


def hash_vec_weights_binary(vecs: DataFrame, n_buckets: int = 1024,
                            salt: str = "clf") -> DataFrame:
    """The ``dim=1`` convenience: fold a single-output model export into
    the ``(bucket, weight)`` table
    :func:`~..operators.text.hashed_linear_score` consumes directly —
    same bucket function, same token-sorted collision sum."""
    # guard folded into the weight column itself (a dropped assert_true
    # column would be pruned away — see parse_vec_model)
    one = vecs.select(
        "token",
        F.when(F.size(F.col("vec")) == 1,
               F.element_at(F.col("vec"), 1))
        .otherwise(F.raise_error(F.lit(
            "hash_vec_weights_binary: model is not a single-output "
            "export — use hash_vec_weights with a labels list")))
        .alias("w"))
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    bucket = F.floor(hash_fraction(F.col("token"), salt)
                     * F.lit(n_buckets)).cast("long")
    return (one.select(bucket.alias("bucket"), "token", "w")
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list(F.struct("token", "w")))
                 .alias("_ws"))
            .select("bucket",
                    F.round(F.aggregate(
                        "_ws", F.lit(0.0),
                        lambda acc, s: acc + s.getField("w")), 6)
                    .alias("weight")))


def _ordered_dot(i: int):
    """Bucket-ordered dot-product fold for class ``i`` over the packed
    ``_rows`` array (a two-arg lambda built per class — PySpark infers
    higher-order-function arity from the Python signature, so a default
    ``i=i`` third parameter would mis-declare a 3-arg merge)."""
    return F.aggregate(
        "_rows", F.lit(0.0),
        lambda a, r: a + r.getField("c").cast("double")
        * r.getField(f"w{i}"))


def _gram_slicer(wrapped, n: int):
    """Per-n transform lambda. A factory, not a default-arg lambda —
    PySpark reads higher-order arity from the Python signature, and
    ``lambda i, n=n`` would mis-declare the 2-arg (element, index)
    variant."""
    return lambda i: wrapped.substr(i, F.lit(n))


def subword_features(t, min_n: int, max_n: int):
    """fastText's actual feature set for one token: the word itself
    PLUS boundary-marked character n-grams — ``<word>`` sliced into
    every n-gram for n in [min_n, max_n] (Bojanowski et al. 2017). The
    markers make prefix/suffix grams distinct features (``<sc`` ≠
    ``sch``), which is most of what carries language identity for
    unseen words. Pure column expression over one token column; grams
    longer than the wrapped token contribute nothing (Spark's
    ``sequence`` would COUNT DOWN for stop < start, so the empty case
    is guarded explicitly)."""
    wrapped = F.concat(F.lit("<"), t, F.lit(">"))
    parts = [F.array(t)]
    for n in range(min_n, max_n + 1):
        count = F.length(wrapped) - (n - 1)
        parts.append(
            F.when(count >= 1,
                   F.transform(F.sequence(F.lit(1), count),
                               _gram_slicer(wrapped, n)))
            .otherwise(F.array().cast("array<string>")))
    return F.concat(*parts)


def hashed_multiclass_score(df: DataFrame, weights: DataFrame,
                            labels: list[str],
                            biases: list[float] | None = None,
                            n_buckets: int = 1024,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            salt: str = "clf",
                            pred_col: str = "pred",
                            score_col: str = "pred_logit",
                            unknown: str = "und",
                            char_ngrams: tuple[int, int] | None = None,
                            broadcast_model: bool = True) -> DataFrame:
    """Multi-class linear inference over hashed bag-of-words features —
    the k-headed sibling of
    :func:`~..operators.text.hashed_linear_score`:

        logit_l = bias_l + Σ_b weight[b, l] · tf(b)
        pred    = argmax_l logit_l

    ``weights`` is the long-form ``(bucket, label, weight)`` table from
    :func:`hash_vec_weights` — BROADCAST (≤ n_buckets·k rows), never
    shuffled. ``tf(b)`` is the bucket's token-count share, so document
    length cancels exactly as in the binary scorer. Buckets absent from
    the model contribute 0 to every head but still count toward the
    normalizer (sparse-model semantics, via the tf denominator being
    the TOTAL token count).

    Scale shape — EXACTLY the binary scorer's two-level aggregation,
    k heads wide: the long weight table pivots to one row per bucket
    with k weight columns (a tiny plan-time reshape), that wide table
    broadcasts onto the (doc, bucket) partials, and ONE groupBy(doc)
    computes the token total plus all k dots together — no per-label
    join, no classes×docs intermediate, no cross join (the first cut
    paid two sort-merge joins for those; this shape plans
    broadcast-only). The per-doc dots fold a BUCKET-SORTED packed array
    rather than an unordered SUM (cross-engine float-order determinism
    — see the inline note), which trades the final map-side sum
    compression for correctness: the shuffle still moves one row per
    (doc, bucket) — the same row count the (doc, bucket) partials
    already move — just k+2 numbers wide instead of 2. The argmax is
    then a pure projection:
    ``array_min(array(struct(-logit_i, label_i)))`` — deterministic
    tie-break: highest logit, then label ascending; logits are
    pre-rounded to 6 dp so the comparison is cross-engine stable.
    Token instances never reach a join or shuffle.

    Documents with no tokens predict ``unknown`` with NULL score (the
    :func:`~..operators.text.lang_id` 'und' convention — a bias-only
    argmax would just report which class the model assumes a priori).

    ``char_ngrams=(min_n, max_n)`` switches the feature set from whole
    words to :func:`subword_features` — each token contributes itself
    plus its boundary-marked character n-grams, all hashed into the
    SAME bucket space (fastText's subword trick: a model export whose
    rows include n-gram strings like ``<sc`` simply folds them into
    buckets via the unchanged :func:`hash_vec_weights`, and unseen
    words still hit their n-grams' weights). With subwords on,
    ``n_tokens`` counts FEATURE instances (the tf normalizer's unit —
    document length cancels per feature, fastText's mean-of-features
    hidden layer); the word path and its output meaning are unchanged
    by default.

    ``broadcast_model=False`` swaps the wide-weights broadcast for a
    shuffle join on the bucket (results identical — use it when
    n_buckets·k outgrows broadcast budgets).

    Returns ``df`` + ``n_tokens`` + ``pred_col`` + ``score_col`` (the
    winning logit, 6 dp)."""
    if biases is not None and len(biases) != len(labels):
        raise ValueError(
            f"hashed_multiclass_score: {len(biases)} biases for "
            f"{len(labels)} labels")
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        tokens,
    )

    b = biases or [0.0] * len(labels)
    # long → wide: one row per bucket, one weight column per class.
    # Plan-time reshape of a ≤n_buckets×k table; column names are
    # positional (_w0.._wk-1) so arbitrary label strings can't collide
    # with SQL identifier rules.
    wide = (weights.groupBy("bucket")
            .pivot("label", [str(lb) for lb in labels])
            .agg(F.first("weight"))
            .toDF("bucket", *[f"_w{i}" for i in range(len(labels))]))

    df = spread_for_cpu(df)
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
    if char_ngrams is not None:
        min_n, max_n = char_ngrams
        if not 1 <= min_n <= max_n:
            raise ValueError(
                f"hashed_multiclass_score: char_ngrams={char_ngrams} "
                f"must satisfy 1 <= min_n <= max_n")
        ex = ex.select(
            "_id",
            F.explode(subword_features(F.col("t"), min_n, max_n))
            .alias("t"))
    bucket = F.floor(hash_fraction(F.col("t"), salt)
                     * F.lit(n_buckets)).cast("long")
    pd_ = (ex.select("_id", bucket.alias("bucket"))
           .groupBy("_id", "bucket").agg(F.count("*").alias("_c")))
    # the per-doc dot products fold a BUCKET-SORTED array, not an
    # unordered SUM: partition order varies run to run, and a float sum
    # whose rounded 6th decimal sits on a half boundary would flip
    # nondeterministically against the oracle (observed once at sf0.01
    # before this pin — the same cross-engine float-order discipline as
    # temperature_mixture's denominator)
    wide = F.broadcast(wide) if broadcast_model else wide
    agg = (pd_.join(wide, "bucket", "left")
           .groupBy("_id").agg(
               F.sort_array(F.collect_list(F.struct(
                   F.col("bucket").alias("b"), F.col("_c").alias("c"),
                   *[F.coalesce(F.col(f"_w{i}"), F.lit(0.0))
                     .alias(f"w{i}") for i in range(len(labels))])))
               .alias("_rows"))
           .select(
               "_id",
               F.aggregate("_rows", F.lit(0).cast("long"),
                           lambda a, r: a + r.getField("c")).alias("_n"),
               *[_ordered_dot(i).alias(f"_d{i}")
                 for i in range(len(labels))]))
    scored = F.array(*[
        F.struct(
            (-(F.round(F.lit(float(bi))
                       + F.col(f"_d{i}") / F.col("_n"), 6))).alias("nl"),
            F.lit(str(lb)).alias("l"))
        for i, (lb, bi) in enumerate(zip(labels, b))])
    win = agg.select("_id", "_n", F.array_min(scored).alias("_w"))
    joined = df.join(win, df[id_col] == win["_id"], "left")
    return joined.select(
        *df.columns,
        F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce(F.col("_w").getField("l"), F.lit(unknown))
        .alias(pred_col),
        F.round(-F.col("_w").getField("nl"), 6).alias(score_col))


def lang_id_model(df: DataFrame, weights: DataFrame, labels: list[str],
                  biases: list[float] | None = None,
                  n_buckets: int = 1024, text_col: str = "text",
                  id_col: str = "doc_id", salt: str = "clf",
                  char_ngrams: tuple[int, int] | None = None
                  ) -> DataFrame:
    """Model-backed language ID — :func:`hashed_multiclass_score` with
    the :func:`~..operators.text.lang_id` output convention
    (``lang_pred``, 'und' for token-less docs, plus ``lang_logit``):
    load a trained fastText-style LID export with
    :func:`parse_vec_model` → :func:`hash_vec_weights` and every
    document gets its argmax language in one broadcast-joined pass —
    the marker-list heuristic's production replacement."""
    return hashed_multiclass_score(
        df, weights, labels, biases, n_buckets, text_col, id_col, salt,
        pred_col="lang_pred", score_col="lang_logit",
        char_ngrams=char_ngrams)


def _gram_mean_component(j: int):
    """Per-component fold over the gram-sorted (gram, vec) rows of one
    synthesized token. A factory, not a default-arg lambda (the PySpark
    higher-order arity pitfall — see :func:`_dot_component`)."""
    return F.aggregate(
        "_gr", F.lit(0.0),
        lambda a, r: a + r.getField("_gv").getItem(j))


def _dot_component(j: int):
    """Per-component fold over the token-sorted packed rows. A factory,
    NOT a default-arg lambda: PySpark infers higher-order-function
    arity from the Python signature, so ``lambda a, r, j=j`` would
    mis-declare a 3-arg merge."""
    return F.aggregate(
        "_rows", F.lit(0.0),
        lambda a, r: a + r.getField("cw") * r.getField("v").getItem(j))


def doc_embedding(df: DataFrame, vecs: DataFrame, dim: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  lowercase: bool = True,
                  token_weights: DataFrame | None = None,
                  normalize: bool = True,
                  char_ngrams: tuple[int, int] | None = None,
                  broadcast_model: bool = True) -> DataFrame:
    """MODEL-BACKED document embeddings: the weighted mean of a trained
    token-vector table (:func:`parse_vec_model`'s ``(token, vec)``)
    over each document's tokens, L2-normalized — the trained-semantics
    replacement for the model-free hashed baseline
    (operators/text.hashed_text_embedding), emitting the SAME
    ``(id, embedding array<double>)`` column contract so the whole ANN
    stack (sign-LSH / IVF / SemDeDup / kNN-join / int8) consumes it
    unchanged.

        emb_j = Σ_t w(t)·tf(doc,t)·vec_t[j] / Σ_t w(t)·tf(doc,t)

    ``token_weights`` is an optional ``(token, weight)`` multiplier —
    pass :func:`sif_token_weights` for SIF (Arora et al.'s
    a/(a+p(t)) reweighting), or idf weights, or nothing for the plain
    tf mean. Tokens absent from the model contribute to neither
    numerator nor denominator (covered-token mean — the fastText
    sentence-vector convention for OOV without subwords); documents
    with NO covered tokens take the explicit NULL lane (NULL embedding,
    ``n_model_tokens = 0``) rather than an arbitrary zero vector.

    ``char_ngrams=(min_n, max_n)`` turns on fastText's actual OOV
    convention (Bojanowski et al. 2017): an uncovered token's vector is
    SYNTHESIZED as the per-component mean of its boundary-marked
    character-n-gram vectors (:func:`subword_features`) that the model
    DOES ship — a ``.vec`` export whose rows include n-gram strings
    like ``<sc`` serves both paths from one table. Synthesized tokens
    join the weighted mean exactly like covered ones (their
    ``token_weights`` multiplier applies); tokens whose n-grams are ALL
    absent stay uncovered. Output gains ``n_subword_tokens`` (instances
    embedded via synthesis; ``n_model_tokens`` stays direct-covered
    only). Plan cost: one distinct-uncovered-token table (Zipf-bounded
    — distinct words, not instances) explodes to its n-grams, meets the
    model broadcast, and folds GRAM-SORTED per-component means (the
    pinned float-order discipline), then rejoins the partials ON THE
    TOKEN — a co-partitioned shuffle join, deliberately NOT broadcast:
    the uncovered vocabulary is corpus-derived and unbounded.

    ``broadcast_model=False`` swaps the model-side broadcast for a
    shuffle join keyed on token: a real 2M-token × 300-dim ``.vec``
    table is ~5 GB — far past sane broadcast sizes (default driver/
    executor budgets cap autoBroadcast at tens of MB; keep the default
    True only for models ≲ a few hundred thousand rows). Results are
    identical; only the join strategy changes (the plan test pins no
    BroadcastExchange on the model side when False).

    Scale shape — the :func:`hashed_multiclass_score` discipline
    applied to vectors: tokens collapse to (doc, token, count) partials
    BEFORE any join (Zipf: the shuffle moves distinct-token rows, not
    token instances), the model table joins BROADCAST (≤vocab rows —
    never a shuffle partner), and ONE groupBy(doc) folds a
    TOKEN-SORTED packed array per dot component (the pinned float-order
    discipline: partition order varies run to run, so an unordered
    float SUM feeding a 6-dp-rounded value would flake on half-boundary
    values; the weighted denominator is float too, so it folds the same
    sorted array). The normalize pass then runs in component order on
    the assembled array. No per-component join, no token-instance
    shuffle, no collect.

    Per-row memory note: the pinned fold packs each document's
    DISTINCT covered tokens × dim doubles into one collected array
    before folding — O(distinct_tokens · dim) per row, so a very long
    document against a 300-dim model makes a wide row. Bounded in
    practice by upstream chunking (operators/corpus
    ``split_long_documents`` — the funnel's convention); chunk first
    if documents are unbounded.

    Returns ``(id_col, n_tokens, n_model_tokens, embedding)`` —
    ``n_tokens`` = all token instances, ``n_model_tokens`` = covered
    instances, components rounded to 6 dp (plus ``n_subword_tokens``
    when ``char_ngrams`` is set)."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        tokens,
    )

    df = spread_for_cpu(df)
    # NULL text rides the token-less lane (0 tokens, NULL embedding),
    # not sizeOfNull's -1/NULL
    t = F.coalesce(tokens(F.lower(F.col(text_col)) if lowercase
                          else F.col(text_col)),
                   F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("_id"), t.alias("_t"))
    ex = base.select("_id", F.explode("_t").alias("t"))
    cnt = ex.groupBy("_id", "t").agg(F.count("*").alias("_c"))

    def bc(d: DataFrame) -> DataFrame:
        return F.broadcast(d) if broadcast_model else d

    tw = (token_weights.select(F.col("token").alias("t"),
                               F.col("weight").alias("_tw"))
          if token_weights is not None else None)

    def with_weight(d: DataFrame) -> DataFrame:
        if tw is None:
            return d.withColumn("_tw", F.lit(1.0))
        return d.join(bc(tw), "t", "left").withColumn(
            "_tw", F.coalesce(F.col("_tw"), F.lit(1.0)))

    model = with_weight(vecs.select(F.col("token").alias("t"),
                                    F.col("vec")))
    parts = (cnt.join(bc(model), "t")
             .select("_id", "t", "_c", "_tw", "vec",
                     F.lit(0).alias("_sw")))
    if char_ngrams is not None:
        min_n, max_n = char_ngrams
        if not 1 <= min_n <= max_n:
            raise ValueError(
                f"doc_embedding: char_ngrams={char_ngrams} must "
                f"satisfy 1 <= min_n <= max_n")
        # distinct UNCOVERED tokens (Zipf: words, not instances) →
        # n-gram explode → model broadcast → gram-sorted component
        # means; the rejoin onto the partials keys on the token — a
        # co-partitioned shuffle join, deliberately not broadcast (the
        # uncovered vocabulary is corpus-derived and unbounded)
        uncov_toks = (cnt.select("t").distinct()
                      .join(bc(vecs.select(F.col("token").alias("t"))),
                            "t", "left_anti"))
        grams = uncov_toks.select(
            "t", F.explode(subword_features(F.col("t"), min_n, max_n))
            .alias("g"))
        gmodel = vecs.select(F.col("token").alias("g"),
                             F.col("vec").alias("_gv"))
        folded_grams = (grams.join(bc(gmodel), "g")
                        .groupBy("t")
                        .agg(F.sort_array(F.collect_list(
                            F.struct(F.col("g"), F.col("_gv"))))
                            .alias("_gr")))
        synth_vec = F.array(*[
            F.round(_gram_mean_component(j)
                    / F.size("_gr").cast("double"), 6)
            for j in range(dim)])
        synth = with_weight(
            folded_grams.select("t", synth_vec.alias("vec")))
        parts = parts.unionByName(
            cnt.join(synth, "t")
            .select("_id", "t", "_c", "_tw", "vec",
                    F.lit(1).alias("_sw")))
    agg = (parts.groupBy("_id").agg(
        F.sum(F.when(F.col("_sw") == 0, F.col("_c"))
              .otherwise(F.lit(0))).alias("_nm"),
        F.sum(F.when(F.col("_sw") == 1, F.col("_c"))
              .otherwise(F.lit(0))).alias("_nsw"),
        F.sort_array(F.collect_list(F.struct(
            F.col("t").alias("t"),
            (F.col("_c").cast("double") * F.col("_tw")).alias("cw"),
            F.col("vec").alias("v")))).alias("_rows")))
    den = F.aggregate("_rows", F.lit(0.0),
                      lambda a, r: a + r.getField("cw"))
    mean = F.array(*[(_dot_component(j) / den).alias(f"_m{j}")
                     for j in range(dim)])
    folded = agg.select("_id", "_nm", "_nsw", mean.alias("_mean"))
    vec = F.col("_mean")
    if normalize:
        nrm = F.sqrt(F.aggregate("_mean", F.lit(0.0),
                                 lambda a, x: a + x * x))
        vec = F.when(nrm > 0,
                     F.transform("_mean", lambda x: F.round(x / nrm, 6))) \
            .otherwise(F.transform("_mean", lambda x: F.round(x, 6)))
    else:
        vec = F.transform("_mean", lambda x: F.round(x, 6))
    emb = folded.select("_id", "_nm", "_nsw", vec.alias("embedding"))
    counts = base.select("_id", F.size("_t").alias("n_tokens"))
    joined = counts.join(emb, "_id", "left")
    out_cols = [
        F.col("_id").alias(id_col), F.col("n_tokens"),
        F.coalesce(F.col("_nm"), F.lit(0).cast("long"))
        .alias("n_model_tokens"),
    ]
    if char_ngrams is not None:
        out_cols.append(
            F.coalesce(F.col("_nsw"), F.lit(0).cast("long"))
            .alias("n_subword_tokens"))
    return joined.select(*out_cols, "embedding")


def sif_token_weights(df: DataFrame, a: float = 1e-3,
                      text_col: str = "text",
                      lowercase: bool = True) -> DataFrame:
    """Smooth-inverse-frequency token weights (Arora et al. 2017):
    ``weight(t) = a / (a + p(t))`` with ``p`` the token's share of all
    token instances in ``df`` — frequent tokens (stopwords) shrink
    toward a/(a+p)≈a/p, rare tokens toward 1. Feed the result to
    :func:`doc_embedding` ``token_weights`` for SIF-weighted means.

    One exploded count aggregate; the total-instances scalar rides a
    one-row broadcast cross join (the repo's bounded-scalar pattern).
    Weights round to 6 dp so the broadcast table is bit-identical
    across engines."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        tokens,
    )

    t = tokens(F.lower(F.col(text_col)) if lowercase
               else F.col(text_col))
    ex = df.select(F.explode(t).alias("token"))
    cnt = ex.groupBy("token").agg(F.count("*").alias("_c"))
    total = cnt.agg(F.sum("_c").alias("_total"))
    return (cnt.crossJoin(F.broadcast(total))
            .select("token",
                    F.round(F.lit(float(a))
                            / (F.lit(float(a))
                               + F.col("_c") / F.col("_total")), 6)
                    .alias("weight")))
