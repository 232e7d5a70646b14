"""Training-corpus operators (operators/corpus.py): deterministic
sampling/sharding semantics, mixture-weight normalization, and packing
invariants. The cross-engine value checks live in the `corpus_suite`
catalog entry (plans/catalog_corpus.py); these tests pin the operator
CONTRACTS — pure-function membership, budget conservation, offset
arithmetic — on a small explicit frame."""

import pytest

# batch-vs-stream funnel soaks — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import math

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.corpus import (
    assign_shards,
    benchmark_contamination,
    capped_stratified_sample,
    hash_fraction,
    pack_chunk_stats,
    pack_chunks,
    stratified_sample,
    temperature_mixture,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i,
         " ".join(f"w{j}" for j in range(3 + i % 5)),
         "en" if i % 3 else "fr")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_fraction_uniform_and_deterministic(spark):
    df = spark.range(500).select(
        hash_fraction(F.col("id")).alias("f"),
        hash_fraction(F.col("id")).alias("f2"),
        hash_fraction(F.col("id"), salt="other").alias("g"))
    rows = df.collect()
    assert all(0.0 <= r.f < 1.0 for r in rows)
    # same key+salt → identical; different salt → decoupled
    assert all(r.f == r.f2 for r in rows)
    assert any(r.f != r.g for r in rows)
    mean = sum(r.f for r in rows) / len(rows)
    assert 0.4 < mean < 0.6


def test_stratified_sample_rates_are_pure_membership(docs):
    kept = stratified_sample(docs, {"en": 1.0, "fr": 0.0}).collect()
    assert all(r.lang == "en" for r in kept)
    assert len(kept) == sum(1 for i in range(60) if i % 3)
    # a stratum absent from the rate map keeps nothing
    assert stratified_sample(docs, {"fr": 1.0}).filter(
        F.col("lang") == "en").count() == 0
    # membership at rate r is exactly {hash_fraction < r} — rerun == rerun
    a = {r.doc_id for r in stratified_sample(docs, {"en": 0.5}).collect()}
    b = {r.doc_id for r in stratified_sample(docs, {"en": 0.5}).collect()}
    assert a == b
    # and nested: a lower rate keeps a subset of a higher rate
    c = {r.doc_id for r in stratified_sample(docs, {"en": 0.2}).collect()}
    assert c <= a


def test_capped_sample_downsamples_only_over_cap_strata(docs):
    # fr has 20 docs: cap 25 keeps all of fr; en (40 docs) is halved in
    # expectation — bound loosely, membership is hash-deterministic
    kept = capped_stratified_sample(docs, cap=25)
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("fr") == 20
    assert 10 <= by_lang.get("en", 0) <= 35


def test_temperature_mixture_shares_and_budget(docs):
    mix = temperature_mixture(docs, alpha=0.5, budget_tokens=10_000)
    rows = {r.lang: r for r in mix.collect()}
    assert set(rows) == {"en", "fr"}
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-4
    # alpha=0.5 compresses the ratio: en/fr doc ratio is 2:1 → share
    # ratio sqrt(2):1
    want = math.sqrt(rows["en"].n_docs / rows["fr"].n_docs)
    assert rows["en"].share / rows["fr"].share == pytest.approx(want, rel=1e-3)
    assert sum(r.alloc_tokens for r in rows.values()) == pytest.approx(
        10_000, abs=1.0)
    # alpha=1 is exactly proportional
    prop = {r.lang: r.share for r in temperature_mixture(
        docs, alpha=1.0, budget_tokens=10_000).collect()}
    assert prop["en"] / prop["fr"] == pytest.approx(2.0, rel=1e-3)


def test_assign_shards_range_and_stability(docs):
    sharded = assign_shards(docs, n_shards=4)
    rows = sharded.select("doc_id", "shard").collect()
    assert all(0 <= r.shard < 4 for r in rows)
    again = {r.doc_id: r.shard for r in
             assign_shards(docs, n_shards=4).select("doc_id", "shard").collect()}
    assert {r.doc_id: r.shard for r in rows} == again


def test_pack_chunks_offsets_are_shardwise_cumsums(docs):
    packed = pack_chunks(assign_shards(docs, n_shards=2), budget_tokens=20)
    rows = sorted(packed.collect(), key=lambda r: (r.shard, r.doc_id))
    offset = {}
    for r in rows:
        want = offset.get(r.shard, 0)
        assert r.start_offset == want, (r.shard, r.doc_id)
        assert r.chunk == want // 20
        offset[r.shard] = want + r.n_tokens
    # stats member aggregates the same packing
    stats = {(r.shard, r.chunk): (r.n_docs, r.n_tokens)
             for r in pack_chunk_stats(
                 assign_shards(docs, n_shards=2), budget_tokens=20).collect()}
    docs_total = sum(n for n, _ in stats.values())
    toks_total = sum(t for _, t in stats.values())
    assert docs_total == 60
    assert toks_total == sum(r.n_tokens for r in rows)


def test_benchmark_contamination_counts_distinct_shingle_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six"),
         (3, "alpha beta gamma completely different tail here")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta other words"),
         (101, "nothing shared at all whatsoever today")],
        "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): r.n_overlap
           for r in benchmark_contamination(corpus, bench,
                                            min_overlap=2).collect()}
    # doc 1 shares shingles {alpha beta gamma, beta gamma delta} with 100
    assert got == {(1, 100): 2}
    # min_overlap=1 also surfaces doc 3 (one shared shingle)
    got1 = {(r.doc_id, r.bench_id)
            for r in benchmark_contamination(corpus, bench,
                                             min_overlap=1).collect()}
    assert got1 == {(1, 100), (3, 100)}
    # the benchmark side must be the broadcast side (corpus never shuffles
    # its shingle stream to the join)
    plan = (benchmark_contamination(corpus, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_write_training_shards_layout_and_order(docs, tmp_path):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, budget_tokens=30)
    spark = docs.sparkSession
    back = spark.read.parquet(out)
    assert back.count() == 60
    assert {r.shard for r in back.select("shard").distinct().collect()} \
        <= {0, 1, 2, 3}
    # packing coordinates agree with the batch operator
    want = {(r.shard, r.doc_id): (r.start_offset, r.chunk)
            for r in pack_chunks(assign_shards(docs, 4),
                                 budget_tokens=30).collect()}
    got = {(r.shard, r.doc_id): (r.start_offset, r.chunk)
           for r in back.collect()}
    assert got == want
    # loader contract: each shard file streams in (chunk, doc_id) order
    import glob
    for shard_dir in glob.glob(f"{out}/shard=*"):
        files = glob.glob(f"{shard_dir}/*.parquet")
        assert len(files) == 1  # no small-files spray
        rows = spark.read.parquet(files[0]).collect()
        keys = [(r.chunk, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_write_training_shards_single_shuffle(docs):
    """One exchange total: the repartition on the shard column feeds the
    same-keyed packing window with no second exchange."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        _pack_columns,
    )
    from pyspark.sql import functions as F

    sharded = (assign_shards(docs, 4)
               .repartition(4, F.col("shard")))
    plan = (_pack_columns(sharded, 30, "shard", "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1


def test_build_training_corpus_funnel(spark):
    """Plant one failure per stage and check exactly the right docs
    survive the composed funnel."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    good = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets over the hill and the birds are singing in the trees")
    rows = [
        (1, good, "en"),                       # survives
        (2, "zzz qqq xxx", "en"),              # killed: quality 0.4 < 0.5
        (3, good, "en"),                       # killed: exact dup of 1
        (4, good + " extra tail words here and there again", "en"),
        # 4 is a near-dup of 1 → clustered, min-id 1 kept, 4 dropped
        (5, "the secret benchmark answer is forty two exactly as the "
            "evaluation set says it should be written down", "en"),
        # killed: contaminated vs the benchmark below
        (6, "une phrase française assez longue pour passer le filtre "
            "de qualité avec des mots fréquents comme le la les et dans "
            "pour un texte utile", "fr"),      # survives (no lang filter)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string")

    out = build_training_corpus(docs, benchmark=bench, min_quality=0.5,
                                near_dup_threshold=0.5)
    assert {r.doc_id for r in out.collect()} == {1, 6}
    # same columns out as in
    assert out.columns == docs.columns
    # stages are optional: no near-dup pass keeps 4, no benchmark keeps 5
    out2 = build_training_corpus(docs, min_quality=0.5,
                                 near_dup_threshold=None)
    assert {r.doc_id for r in out2.collect()} == {1, 4, 5, 6}


def test_pack_single_window_no_global_sort(docs):
    """The packing plan must shuffle on the shard only (one hash
    partitioning for the window) — no global range/sort exchange."""
    packed = pack_chunks(assign_shards(docs, n_shards=2), budget_tokens=20)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_hash_fraction_matches_python_mirror(spark):
    """The membership hash is a pure md5 function any engine can
    restate: mirror it in hashlib and require bit-identical doubles —
    the property the DuckDB oracle (and any future re-implementation)
    leans on."""
    import hashlib

    def mirror(key: int, salt: str = "sample") -> float:
        h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
        return int(h, 16) / float(1 << 32)

    rows = spark.range(200).select(
        "id", hash_fraction(F.col("id")).alias("f"),
        hash_fraction(F.col("id"), salt="s2").alias("g")).collect()
    for r in rows:
        assert r.f == mirror(r.id)
        assert r.g == mirror(r.id, "s2")


def test_repetition_signals_semantics(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        repetition_signals,
    )

    docs = spark.createDataFrame([
        (1, "a b\na b\nc d"),       # 3 lines, one duplicate pair
        (2, "spam spam spam spam"), # top bigram 'spam spam' = 3/3
        (3, "one"),                 # <2 tokens: no bigrams
        (4, "x y z w"),             # all bigrams distinct: 1/3
    ], "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.dup_line_ratio, r.top_bigram_ratio)
           for r in repetition_signals(docs).collect()}
    # one token stream across lines: bigrams = [a b, b a, a b, b c,
    # c d], top "a b" = 2/5
    assert got[1] == (3, round(1 - 2 / 3, 4), round(2 / 5, 4))
    assert got[2] == (1, 0.0, 1.0)
    assert got[3] == (1, 0.0, 0.0)
    assert got[4] == (1, 0.0, round(1 / 3, 4))


def test_pii_signals_counts(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        pii_signals,
    )

    docs = spark.createDataFrame([
        (1, "write to a@b.org or c.d+x@e-f.co today"),
        (2, "docs at https://ex.org/a and http://ex.org/b?q=1"),
        (3, "call +32 2 555 1234 or (02) 555-9876 soon"),
        (4, "nothing to see here at all"),
    ], "doc_id long, text string")
    got = {r.doc_id: (r.n_emails, r.n_urls, r.n_phones)
           for r in pii_signals(docs).collect()}
    assert got[1] == (2, 0, 0)
    assert got[2] == (0, 2, 0)
    assert got[3][2] == 2 and got[3][0] == 0
    assert got[4] == (0, 0, 0)


def test_redact_pii_rewrites_and_counts(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        redact_pii,
    )

    docs = spark.createDataFrame([
        (1, "write to a@b.org or c.d+x@e-f.co today"),
        (2, "server 192.168.1.250 then call +3225551234 now"),
        (3, "plain text with no contact info at all"),
        (4, ""),
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].text == "write to <EMAIL> or <EMAIL> today"
    assert (got[1].n_redacted_email, got[1].n_redacted_ip,
            got[1].n_redacted_phone) == (2, 0, 0)
    # the IP rule must fire BEFORE the phone rule (an IPv4 is
    # phone-shaped), and counts must not double-count across rules
    assert got[2].text == "server <IP> then call <PHONE> now"
    assert (got[2].n_redacted_email, got[2].n_redacted_ip,
            got[2].n_redacted_phone) == (0, 1, 1)
    assert got[3].text == docs.collect()[2].text
    assert (got[4].n_redacted_email, got[4].n_redacted_ip,
            got[4].n_redacted_phone) == (0, 0, 0)


def test_redact_pii_preserves_schema_order(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        redact_pii,
    )

    docs = spark.createDataFrame(
        [(1, "x", "a@b.org", "en")],
        "doc_id long, pre string, text string, lang string")
    out = redact_pii(docs)
    assert out.columns == ["doc_id", "pre", "text", "lang",
                           "n_redacted_email", "n_redacted_ip",
                           "n_redacted_phone"]
    assert out.first().text == "<EMAIL>"


def test_common_span_pairs_matches_python_mirror_property(spark):
    """Hypothesis sweep: on random token sequences from a tiny alphabet
    (maximizing accidental overlap), the shingle-join + diagonal-island
    detector must equal a brute-force mirror that enumerates MAXIMAL
    matching token runs of length ≥ min_span directly from the
    definition (every run ≥ window yields a full island of matching
    shingles; islands shorter than min_span are filtered on both
    sides)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    W, MIN = 3, 4
    docs_strategy = st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=W,
                 max_size=14),
        min_size=2, max_size=4)

    def mirror(docs):
        out = set()
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                a, b = docs[ai], docs[bi]
                for i in range(len(a)):
                    for j in range(len(b)):
                        if a[i] != b[j]:
                            continue
                        if i > 0 and j > 0 and a[i - 1] == b[j - 1]:
                            continue  # not run start → not maximal
                        ln = 0
                        while (i + ln < len(a) and j + ln < len(b)
                               and a[i + ln] == b[j + ln]):
                            ln += 1
                        if ln >= MIN:
                            out.add((ai + 1, bi + 1, i + 1, j + 1, ln))
        return out

    @given(docs=docs_strategy)
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(docs):
        df = spark.createDataFrame(
            [(i + 1, " ".join(t)) for i, t in enumerate(docs)],
            "doc_id long, text string")
        got = {(r.id_a, r.id_b, r.start_a, r.start_b, r.span_tokens)
               for r in common_span_pairs(df, window=W,
                                          min_span=MIN).collect()}
        assert got == mirror(docs), docs

    check()


def test_funnel_gopher_and_redact_stages(spark):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    good = ("the quick brown fox jumps over that lazy dog and runs off "
            "to be with all of those other happy animals in the field "
            "while birds have sung and the sun sets slowly over hills "
            "with a warm glow that makes everything look golden today "
            "and everyone agrees it is a very fine evening indeed yes")
    docs = spark.createDataFrame([
        (1, good),
        (2, "way too short to pass the gopher word-count rule"),
        (3, "please contact me at someone@example.com about " + good),
    ], "doc_id long, text string")
    out = build_training_corpus(docs, min_quality=0.0,
                                near_dup_threshold=None,
                                gopher=True, redact=True)
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[3].startswith("please contact me at <EMAIL> about")
    # redaction happens inside the funnel's shared filter stage, so the
    # SHIPPED text is the scrubbed text
    assert "someone@example.com" not in got[3]


def test_stream_gopher_redact_matches_batch_funnel(spark, tmp_path):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        corpus_batch,
        read_corpus,
    )

    good = ("the quick brown fox jumps over that lazy dog and runs off "
            "to be with all of those other happy animals in the field "
            "while birds have sung and the sun sets slowly over hills "
            "with a warm glow that makes everything look golden today "
            "and everyone agrees it is a very fine evening indeed yes")
    batches = [
        [(1, good), (2, "too short for gopher")],
        [(10, "mail x@y.org then " + good + " thanks")],
    ]
    kw = dict(min_quality=0.0, near_dup_threshold=None,
              gopher=True, redact=True)
    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(batches):
        corpus_batch(spark.createDataFrame(rows, "doc_id long, text string"),
                     i, cdir, **kw)
    got = {(r.doc_id, r.text) for r in read_corpus(spark, cdir).collect()}
    all_docs = spark.createDataFrame([r for b in batches for r in b],
                                     "doc_id long, text string")
    want = {(r.doc_id, r.text)
            for r in build_training_corpus(all_docs, **kw).collect()}
    assert got == want and {d for d, _ in got} == {1, 10}
    assert all("@" not in t or "<EMAIL>" in t for _, t in got)


def test_gopher_signals_and_filter(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        gopher_filter,
        gopher_signals,
    )

    good = ("the quick brown fox jumps over that lazy dog and runs off "
            "to be with all of those other happy animals in the field "
            "while birds have sung and the sun sets slowly over hills "
            "with a warm glow that makes everything look golden today "
            "and everyone agrees it is a very fine evening indeed yes")
    docs = spark.createDataFrame([
        (1, good),                                       # passes all
        (2, "- item one\n- item two\n- item three\nplain line"),
        (3, "line one...\nline two…\nline three\nline four"),
        (4, "# ## ### #### " + good),                    # symbol soup
        (5, "12 34 56 78 90 11 22 33 44 55"),            # no alpha words
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_signals(docs).collect()}
    assert got[1].n_words >= 50 and got[1].n_stop_hits >= 2
    assert got[1].frac_alpha_words == 1.0
    assert got[2].frac_bullet_lines == 0.75
    assert got[3].frac_ellipsis_lines == 0.5
    assert got[4].symbol_word_ratio > 0.05
    assert got[5].frac_alpha_words == 0.0
    kept = {r.doc_id for r in gopher_filter(docs).collect()}
    assert kept == {1}
    # filter returns ONLY the original columns
    assert gopher_filter(docs).columns == ["doc_id", "text"]


def test_corpus_overlap_counts(spark):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        corpus_overlap,
    )

    a = spark.createDataFrame([
        (1, "shared text one"), (2, "shared text one"),  # internal dup
        (3, "only in a"),
    ], "doc_id long, text string")
    b = spark.createDataFrame([
        (10, "shared text one"),      # seen in a
        (11, "Shared  TEXT one"),     # normalizes to the same fp
        (12, "brand new text"),
        (13, "brand new text"),       # b-internal dup, unseen
    ], "doc_id long, text string")
    r = corpus_overlap(a, b).first()
    assert (r.n_docs_a, r.n_texts_a) == (3, 2)
    assert (r.n_docs_b, r.n_texts_b) == (4, 2)
    assert r.n_texts_shared == 1
    assert r.frac_b_seen == 0.5       # docs 10,11 of 4

    empty = spark.createDataFrame([], "doc_id long, text string")
    r2 = corpus_overlap(empty, b).first()
    assert (r2.n_docs_a, r2.n_texts_shared) == (0, 0)
    assert r2.frac_b_seen == 0.0


def test_score_weighted_sample_rates(spark):
    """Keep probability floor + (1-floor)·clamp01(score)^gamma: a
    score-1 doc always survives, negative/None-ish scores survive at
    the floor, and the realized rate over many ids tracks the formula."""
    import hashlib

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        score_weighted_sample,
    )

    def hf(key, salt):
        h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
        return int(h, 16) / 2 ** 32

    n = 2000
    rows = [(i, [1.0, 0.5, 0.0, -3.0][i % 4]) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, score double")
    kept = {r.doc_id for r in score_weighted_sample(
        docs, "score", gamma=2.0, floor=0.1).collect()}
    expect = {i for i, s in rows
              if hf(i, "wsample")
              < 0.1 + 0.9 * (min(1.0, max(0.0, s)) ** 2.0)}
    assert kept == expect
    assert all(i in kept for i in range(0, n, 4))     # score 1 → always
    floor_kept = [i for i in kept if i % 4 == 3]      # clamped to floor
    assert 0 < len(floor_kept) < n / 4 * 0.25


def test_common_span_pairs_planted_span_and_positions(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"          # 10 tokens
    docs = spark.createDataFrame([
        (1, "a1 a2 a3 " + shared + " a4"),              # span starts at 4
        (2, "b1 " + shared + " b2 b3 b4 b5"),           # span starts at 2
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),  # no overlap
    ], "doc_id long, text string")
    out = common_span_pairs(docs, window=4, min_span=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert (r.start_a, r.start_b, r.span_tokens) == (4, 2, 10)


def test_common_span_pairs_min_span_and_split_runs(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    # two separate shared runs in one pair: 6 tokens and 9 tokens —
    # with min_span=8 only the long one survives; the short one is a
    # different diagonal/island, never merged
    docs = spark.createDataFrame([
        (1, "x1 x2 q1 q2 q3 q4 q5 q6 x3 x4 r1 r2 r3 r4 r5 r6 r7 r8 r9"),
        (2, "q1 q2 q3 q4 q5 q6 y1 y2 y3 y4 y5 r1 r2 r3 r4 r5 r6 r7 r8 r9"),
    ], "doc_id long, text string")
    out = common_span_pairs(docs, window=4, min_span=8).collect()
    assert [(r.start_a, r.start_b, r.span_tokens) for r in out] \
        == [(11, 12, 9)]
    both = common_span_pairs(docs, window=4, min_span=5).collect()
    assert sorted((r.start_a, r.start_b, r.span_tokens) for r in both) \
        == [(3, 1, 6), (11, 12, 9)]


def test_common_span_pairs_max_df_drops_boilerplate(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    footer = " f1 f2 f3 f4 f5 f6 f7 f8"
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c" + footer) for i in range(1, 6)],
        "doc_id long, text string")
    dense = common_span_pairs(docs, window=4, min_span=8)
    assert dense.count() == 10            # all 5-choose-2 pairs
    capped = common_span_pairs(docs, window=4, min_span=8, max_df=3)
    assert capped.count() == 0            # footer shingles are corpus-hot


def test_strip_shared_spans_keeps_first_and_converges(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
        strip_shared_spans,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = spark.createDataFrame([
        (1, "a1 a2 a3 " + shared + " a4"),
        (2, "b1 " + shared + " b2 b3 b4 b5"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    ], "doc_id long, text string")
    out = strip_shared_spans(docs, window=4, min_span=8)
    got = {r.doc_id: r for r in out.collect()}
    # lower-id copy intact; higher-id copy loses exactly the span
    assert got[1].text == docs.collect()[0].text
    assert got[1].n_tokens_removed == 0
    assert got[2].text == "b1 b2 b3 b4 b5"
    assert got[2].n_tokens_removed == 10
    assert got[3].n_tokens_removed == 0
    # fixpoint: re-running the detector on the stripped corpus is empty
    assert common_span_pairs(out.select("doc_id", "text"),
                             window=4, min_span=8).count() == 0


def test_strip_shared_spans_fully_covered_doc_empties(spark):
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        strip_shared_spans,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame([
        (1, "intro " + shared),
        (2, shared),                      # nothing but the span
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in
           strip_shared_spans(docs, window=4, min_span=8).collect()}
    assert got[2].text == "" and got[2].n_tokens_removed == 8
    assert got[1].n_tokens_removed == 0


def test_hashed_linear_score_matches_python_mirror(spark):
    import hashlib
    import math
    from collections import Counter

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hash_bucket_weights,
        hashed_linear_score,
    )

    def hf(key, salt):
        h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
        return int(h, 16) / 2 ** 32

    B, bias = 16, 0.25
    texts = {1: "Alpha beta BETA gamma", 2: "solo", 3: ""}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    w = hash_bucket_weights(spark, B)
    out = {r.doc_id: (r.n_tokens, r.clf_score)
           for r in hashed_linear_score(docs, w, n_buckets=B,
                                        bias=bias).collect()}
    for d, t in texts.items():
        toks = t.lower().split()
        if toks:
            c = Counter(int(hf(tok, "clf") * B) for tok in toks)
            dot = sum(n * round(2 * hf(b, "clfw") - 1, 6)
                      for b, n in c.items()) / sum(c.values())
        else:
            dot = 0.0
        expect = round(1 / (1 + math.exp(-(bias + dot))), 6)
        assert out[d] == (len(toks), expect), d


def test_hashed_linear_score_sparse_weights_keep_normalizer(spark):
    """Buckets missing from the weight table contribute 0 to the dot
    product but still count toward the tf normalizer — a sparse model
    must not silently renormalize over its own support."""
    import math

    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hashed_linear_score,
    )

    B = 8
    docs = spark.createDataFrame([(1, "aa bb aa")],
                                 "doc_id long, text string")
    b_aa, b_bb = [
        r.b for r in spark.createDataFrame([("aa",), ("bb",)], "t string")
        .select(F.floor(hash_fraction(F.col("t"), "clf") * B)
                .cast("long").alias("b")).collect()
    ]
    assert b_aa != b_bb  # fixture precondition
    only_aa = spark.createDataFrame([(b_aa, 0.9)],
                                    "bucket long, weight double")
    got = hashed_linear_score(docs, only_aa, n_buckets=B).first()
    # dot = (2*0.9 + 1*0.0) / 3, NOT (2*0.9) / 2
    assert got.clf_score == round(1 / (1 + math.exp(-(2 * 0.9 / 3))), 6)


def test_funnel_repetition_and_pii_stages(spark):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    base = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets over the hill and the birds are singing in the trees")
    docs = spark.createDataFrame([
        (1, base, "en"),
        (2, "spam spam spam spam spam spam spam spam spam spam the and "
            "of to in is that it for", "en"),   # killed: top-bigram cap
        (3, base + " mail me at someone@example.com for the details "
            "or someone.else@example.com instead", "en"),  # killed: PII cap
    ], "doc_id long, text string, lang string")
    out = build_training_corpus(docs, min_quality=0.4,
                                max_top_bigram_ratio=0.3,
                                max_pii_signals=1,
                                near_dup_threshold=None)
    assert {r.doc_id for r in out.collect()} == {1}


def test_pack_chunks_matches_python_mirror_property(spark):
    """Hypothesis-style sweep without fixture bias: random token counts →
    the packing must equal a pure-Python concatenate-and-chunk mirror."""
    import random

    rng = random.Random(7)
    rows = [(i, " ".join("w" * 1 for _ in range(rng.randint(0, 40))))
            for i in range(120)]
    docs = spark.createDataFrame(
        [(i, t if t else "") for i, t in rows], "doc_id long, text string")
    budget = 17
    got = {(r.shard, r.doc_id): (r.n_tokens, r.start_offset, r.chunk)
           for r in pack_chunks(assign_shards(docs, 3), budget).collect()}
    shard_of = {r.doc_id: r.shard
                for r in assign_shards(docs, 3).select("doc_id", "shard").collect()}
    offset = {}
    for i, t in rows:  # doc_id ascending == window order
        s = shard_of[i]
        n = len(t.split()) if t.strip() else 0
        start = offset.get(s, 0)
        assert got[(s, i)] == (n, start, start // budget), (s, i)
        offset[s] = start + n


def test_funnel_cap_without_lang_column(spark):
    """cap_per_lang on an input WITHOUT a source 'lang' column must not
    raise: the stratum falls back to the predicted language
    (annotate_documents lang_pred), keeping the funnel's only hard
    column requirement at (id, text)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    base = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets over the hill and the birds are singing in the trees")
    docs = spark.createDataFrame(
        [(i, base + f" variation number {i} of the text") for i in range(6)],
        "doc_id long, text string")
    # cap far above the corpus size → rate 1.0 per stratum, all survive
    out = build_training_corpus(docs, min_quality=0.0,
                                near_dup_threshold=None, cap_per_lang=100)
    assert {r.doc_id for r in out.collect()} == set(range(6))
    assert out.columns == docs.columns
    # a source-provided strata column is still honored when present
    docs_l = docs.withColumn("domain", F.lit("web"))
    out2 = build_training_corpus(docs_l, min_quality=0.0,
                                 near_dup_threshold=None, cap_per_lang=100,
                                 cap_strata_col="domain")
    assert {r.doc_id for r in out2.collect()} == set(range(6))


def test_stratified_sample_rates_df_matches_dict_form(docs):
    """The broadcast-join rate lookup must be row-for-row identical to
    the literal CASE form (same hash-fraction membership), including
    'missing stratum keeps nothing' semantics."""
    spark = docs.sparkSession
    rates = {"en": 0.5}
    rates_df = spark.createDataFrame([("en", 0.5)], "lang string, rate double")
    a = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in stratified_sample(docs, rates_df).collect()}
    assert a == b and a
    out = stratified_sample(docs, rates_df)
    assert out.columns == docs.columns


def test_stratified_sample_rates_df_no_per_stratum_expression(docs):
    """10k strata through the DataFrame form: the plan must be a
    broadcast hash join with a rate column probe — not an O(strata)
    CaseWhen chain (which explodes planning time and codegen size)."""
    spark = docs.sparkSession
    big = spark.createDataFrame(
        [(f"s{i}", 0.5) for i in range(10_000)], "lang string, rate double")
    plan = (stratified_sample(docs, big)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # a CONSTANT number of CaseWhens is fine (the in-plan duplicate-key
    # guard is one); an O(strata) chain is not
    assert plan.count("CASE WHEN") <= 3
    # sanity: the dict form at this scale WOULD be an O(strata) chain —
    # the DataFrame form's plan stays small
    assert len(plan) < 20_000


def test_stratified_sample_rates_df_schema_guard(docs):
    spark = docs.sparkSession
    bad = spark.createDataFrame([("en", 0.5)], "lang string, keep double")
    with pytest.raises(ValueError, match="rates DataFrame"):
        stratified_sample(docs, bad)


def _decontam_fixture(spark):
    bench_words = ("the model should answer forty two when asked about the "
                   "meaning of life the universe and everything according to "
                   "the famous book by douglas adams").split()
    para = list(bench_words)
    for i, w in {5: "reply", 11: "regarding", 17: "cosmos",
                 23: "renowned"}.items():
        para[i] = w
    filler = " ".join(f"w{i} filler{i} token{i}" for i in range(40))
    boiler = (filler + " meaning of life the "
              + " ".join(f"z{i}" for i in range(30)))
    corpus = spark.createDataFrame(
        [(1, " ".join(para)),    # light paraphrase of the bench doc
         (2, boiler),            # long doc, 2 boilerplate shingles shared
         (3, "entirely unrelated text about pasta cooking with basil and "
             "olive oil in a warm kitchen tonight")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, " ".join(bench_words))], "doc_id long, text string")
    return corpus, bench


def test_minhash_decontam_catches_paraphrase(spark):
    """A lightly-paraphrased eval doc (every ~6th word substituted, true
    shingle Jaccard ≈ 0.38) must be flagged by the banded-MinHash mode;
    and a LONG unrelated doc sharing two boilerplate shingles — which
    the absolute-count shingle mode flags — must pass (similarity is
    normalized, not counted)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        benchmark_contamination_minhash,
    )

    corpus, bench = _decontam_fixture(spark)
    sh = {r.doc_id for r in benchmark_contamination(
        corpus, bench, min_overlap=2).collect()}
    assert sh == {1, 2}  # shingle mode: paraphrase AND the boilerplate FP
    mh = {r.doc_id: r.est_jaccard
          for r in benchmark_contamination_minhash(
              corpus, bench, threshold=0.25).collect()}
    assert set(mh) == {1}  # minhash mode: the paraphrase only
    assert mh[1] >= 0.25
    # benchmark side is the broadcast side (corpus never shuffles)
    plan = (benchmark_contamination_minhash(corpus, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_semantic_decontam_blocks_and_probes(spark):
    """Embedding-space decontamination: a paraphrase-shaped planted
    neighbour (high cosine, low lexical overlap) is flagged, unrelated
    vectors are not, n_probe > 1 recovers a cell-boundary pair the
    single-probe join misses, and the bench side is the broadcast
    side."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        benchmark_contamination_semantic,
    )

    # two well-separated cells on axes 0 / 1; corpus doc 10 sits right
    # next to bench 100 (same cell), corpus doc 11 sits BETWEEN cells
    # (boundary: nearest cell 0, its contaminating bench 101 lives in
    # cell 1's direction)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    corpus = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0, 0.0]),      # cell 0, near bench 100
         (11, [0.72, 0.69, 0.0, 0.0]),    # boundary, near bench 101
         (12, [0.0, 0.0, 1.0, 0.0])],     # unrelated
        "doc_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(100, [0.88, 0.12, 0.0, 0.0]),   # cell 0
         (101, [0.60, 0.80, 0.0, 0.0])],  # cell 1
        "bench_id long, embedding array<double>")

    one = {(r.doc_id, r.bench_id) for r in benchmark_contamination_semantic(
        corpus, bench, cents, threshold=0.9, n_probe=1).collect()}
    two = {(r.doc_id, r.bench_id): r.cos_sim
           for r in benchmark_contamination_semantic(
               corpus, bench, cents, threshold=0.9, n_probe=2).collect()}
    assert (10, 100) in one
    assert (11, 101) not in one          # boundary pair missed at 1 probe
    assert set(two) == {(10, 100), (11, 101)}
    assert all(v >= 0.9 for v in two.values())

    plan = (benchmark_contamination_semantic(corpus, bench, cents, 0.9)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_funnel_semantic_decontam_mode(spark):
    """decontam_mode='semantic' catches REORDERED leakage that both
    shingle and MinHash modes pass: a benchmark doc's words shuffled
    share no 3-gram shingles (Jaccard ≈ 0) but have cosine 1.0 in the
    bag-of-words embedding. Unrelated docs survive."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    bench_words = [f"tok{i}" for i in range(12)]
    shuffled = [bench_words[j] for j in
                (7, 0, 5, 2, 9, 11, 1, 4, 10, 3, 8, 6)]
    docs = spark.createDataFrame(
        [(1, " ".join(shuffled)),                      # reordered leak
         (2, " ".join(f"other{i}" for i in range(12)))],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, " ".join(bench_words))],
                                  "doc_id long, text string")
    kw = dict(min_quality=0.0, near_dup_threshold=None)

    sem = {r.doc_id for r in build_training_corpus(
        docs, bench, decontam_mode="semantic", decontam_threshold=0.9,
        decontam_k=1, **kw).collect()}
    assert sem == {2}
    # the lexical modes PASS the reordered leak — the semantic gap
    mh = {r.doc_id for r in build_training_corpus(
        docs, bench, decontam_mode="minhash", decontam_threshold=0.3,
        **kw).collect()}
    sh = {r.doc_id for r in build_training_corpus(
        docs, bench, decontam_mode="shingle", **kw).collect()}
    assert mh == sh == {1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="decontam_mode"):
        build_training_corpus(docs, bench, decontam_mode="nope", **kw)


def test_funnel_minhash_decontam_mode(spark):
    """decontam_mode='minhash' inside the composed funnel drops the
    planted paraphrase and keeps the boilerplate-overlap doc."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    corpus, bench = _decontam_fixture(spark)
    out = build_training_corpus(corpus, benchmark=bench, min_quality=0.0,
                                near_dup_threshold=None,
                                decontam_mode="minhash",
                                decontam_threshold=0.25)
    assert {r.doc_id for r in out.collect()} == {2, 3}
    # unknown mode is refused
    with pytest.raises(ValueError, match="decontam_mode"):
        build_training_corpus(corpus, benchmark=bench,
                              decontam_mode="fuzzy").collect()


def test_unigram_logprob_hand_computed(spark):
    """score = Σ c·ln((C+α)/(N+αV)) / Σ c on a corpus small enough to
    verify by hand: tokens a a b | b c → C(a)=2 C(b)=2 C(c)=1, N=5, V=3."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a A b"), (2, "b c")], "doc_id long, text string")
    got = {r.doc_id: r for r in unigram_logprob(docs, alpha=0.5).collect()}
    p_ab = math.log(2.5 / 6.5)
    p_c = math.log(1.5 / 6.5)
    assert got[1].n_tokens == 3 and got[2].n_tokens == 2
    assert abs(got[1].avg_logprob - p_ab) < 1e-12
    assert abs(got[2].avg_logprob - (p_ab + p_c) / 2) < 1e-12


def test_strip_repeated_substrings_planted_boilerplate(spark):
    """A shared 8-word footer across otherwise-distinct docs is removed
    from every doc; unique body text survives with casing intact; a doc
    without the footer is untouched."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hot_passages,
        strip_repeated_substrings,
    )

    footer = "subscribe to Our newsletter for weekly updates and offers"
    docs = spark.createDataFrame([
        (1, f"Unique alpha content about glaciers {footer}"),
        (2, f"Totally different beta story on volcanoes {footer}"),
        (3, "No boilerplate here just original gamma text body words"),
    ], "doc_id long, text string")

    hot = hot_passages(docs, window=8)
    assert hot.count() >= 1  # the footer's windows repeat in docs 1+2

    out = {r.doc_id: r for r in
           strip_repeated_substrings(docs, window=8).collect()}
    assert out[1].text == "Unique alpha content about glaciers"
    assert out[2].text == "Totally different beta story on volcanoes"
    assert out[3].text.startswith("No boilerplate")
    assert out[3].n_tokens_removed == 0
    assert out[1].n_tokens_before == 14 and out[1].n_tokens_removed == 9
    # casing preserved in the rebuilt text ("Our" was only lowercased
    # for hashing, not in the output)... removed here, but doc 3 keeps its caps
    assert out[3].text == "No boilerplate here just original gamma text body words"


def test_unigram_logprob_frozen_model_oov(spark):
    """Scoring against FROZEN reference counts: in-vocab tokens use the
    model's probabilities, OOV tokens get the smoothed floor α/(N+αV),
    and the model corpus itself never enters the score."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_counts,
        unigram_logprob,
    )

    ref = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    model = unigram_counts(ref)  # C: a=2 b=2 c=1, N=5, V=3
    docs = spark.createDataFrame(
        [(10, "a zzz")], "doc_id long, text string")
    got = unigram_logprob(docs, alpha=0.5, model_counts=model).collect()[0]
    want = (math.log(2.5 / 6.5) + math.log(0.5 / 6.5)) / 2
    assert got.n_tokens == 2
    assert abs(got.avg_logprob - want) < 1e-12


def test_bigram_logprob_hand_computed(spark):
    """score = Σ c·ln((C+α)/(C1+αV)) / Σ c on a hand-checkable corpus:
    bigrams (a,a) (a,b) | (b,c) → C1(a)=2 C1(b)=1, V=|{a,b,c}|=3."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        bigram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a A b"), (2, "b c"), (3, "solo"), (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_logprob(docs, alpha=0.5).collect()}
    # docs with < 2 tokens have no bigrams and drop out
    assert set(got) == {1, 2}
    p_aa = math.log(1.5 / 3.5)   # (1+.5)/(2+.5*3)
    p_bc = math.log(1.5 / 2.5)   # (1+.5)/(1+.5*3)
    assert got[1].n_bigrams == 2 and got[2].n_bigrams == 1
    assert abs(got[1].avg_logprob - p_aa) < 1e-12  # both pairs score p_aa
    assert abs(got[2].avg_logprob - p_bc) < 1e-12


def test_bigram_logprob_shuffled_text_collapses(spark):
    """The reason a second-order score exists: a document whose tokens
    are in-vocabulary but reordered keeps its unigram score (bag of
    words) yet collapses under the bigram model."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        bigram_logprob,
        unigram_logprob,
    )

    ordered = "the cat sat on the mat"
    rows = [(i, ordered) for i in range(8)]
    rows.append((99, "mat the on sat cat the"))  # same bag, shuffled
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r.doc_id: r.avg_logprob
           for r in unigram_logprob(docs).collect()}
    assert abs(uni[99] - uni[0]) < 1e-12  # unigram can't tell
    bi = {r.doc_id: r.avg_logprob
          for r in bigram_logprob(docs).collect()}
    assert bi[99] < bi[0] - 1.0  # bigram collapses the shuffle


def test_bigram_logprob_frozen_model_floor(spark):
    """Against a frozen bigram_model, pairs absent from the model floor
    at α/(0+αV) = 1/V — the documented conservative OOV treatment of
    the pair-denormalized layout."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        bigram_logprob,
        bigram_model,
    )

    ref = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    model = bigram_model(ref)  # pairs (a,a) (a,b) (b,c); V=3
    rows = {(r.t1, r.t2): (r.ct, r.ct1) for r in model.collect()}
    assert rows == {("a", "a"): (1, 2), ("a", "b"): (1, 2),
                    ("b", "c"): (1, 1)}
    docs = spark.createDataFrame(
        [(10, "c a"), (11, "a b")], "doc_id long, text string")
    got = {r.doc_id: r for r in
           bigram_logprob(docs, alpha=0.5, model=model).collect()}
    assert abs(got[10].avg_logprob - math.log(0.5 / 1.5)) < 1e-12  # 1/V
    assert abs(got[11].avg_logprob - math.log(1.5 / 3.5)) < 1e-12  # exact


def test_bigram_floor_shared_by_batch_and_stream(spark, tmp_path):
    """min_avg_bigram_logprob with a frozen bigram_model drops the same
    scrambled document from both funnels; a one-token document (no
    bigram evidence) passes the gate; the floor without a frozen model
    refuses."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
        filter_documents,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        bigram_model,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (  # noqa: E501
        corpus_batch,
        read_corpus,
    )

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog "
               "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    model = bigram_model(ref)
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "dog the over quick jumps lazy fox brown the"),  # scrambled
        (3, "fox"),  # one token: no bigram evidence → passes
    ]
    params = dict(min_quality=0.0, near_dup_threshold=None,
                  min_avg_bigram_logprob=-1.5, bigram_model_counts=model)

    batch = {r.doc_id for r in build_training_corpus(
        spark.createDataFrame(docs, "doc_id long, text string"),
        **params).collect()}
    assert batch == {1, 3}

    cdir = str(tmp_path / "corpus")
    corpus_batch(spark.createDataFrame(docs[:2], "doc_id long, text string"),
                 0, cdir, **params)
    corpus_batch(spark.createDataFrame(docs[2:], "doc_id long, text string"),
                 1, cdir, **params)
    assert {r.doc_id for r in read_corpus(spark, cdir).collect()} == batch

    with pytest.raises(ValueError, match="corpus-level"):
        filter_documents(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_quality=0.0, min_avg_bigram_logprob=-1.5)


def test_lm_floor_shared_by_batch_and_stream(spark, tmp_path):
    """min_avg_logprob with a frozen model is a per-document filter, so
    the batch funnel and the streaming funnel drop the same gibberish
    document — the corpus-level-statistic caveat of the self-trained
    score does not apply."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
        filter_documents,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_counts,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        corpus_batch,
        read_corpus,
    )

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the "
               "river bank while the sun sets slowly")],
        "doc_id long, text string")
    model = unigram_counts(ref)
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "xqzt vprw klmn bdfg hjkl qwrt zxcv bnms"),  # all OOV
        (3, "the sun sets slowly near the river bank"),
    ]
    params = dict(min_quality=0.0, near_dup_threshold=None,
                  min_avg_logprob=-3.2, lm_counts=model)

    batch = {r.doc_id for r in build_training_corpus(
        spark.createDataFrame(docs, "doc_id long, text string"),
        **params).collect()}
    assert batch == {1, 3}

    cdir = str(tmp_path / "corpus")
    corpus_batch(spark.createDataFrame(docs[:2], "doc_id long, text string"),
                 0, cdir, **params)
    corpus_batch(spark.createDataFrame(docs[2:], "doc_id long, text string"),
                 1, cdir, **params)
    assert {r.doc_id for r in read_corpus(spark, cdir).collect()} == batch

    # and the guard: a floor without a frozen model is refused
    import pytest

    with pytest.raises(ValueError, match="corpus-level"):
        filter_documents(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_quality=0.0, min_avg_logprob=-3.2)


def test_stratified_sample_rates_df_duplicate_key_guard(docs):
    """A duplicate stratum key in the rates table would silently
    DUPLICATE every row of that stratum through the join — refused at
    action time by the in-plan guard (NOT an eager call-time collect,
    which would execute a corpus-scale rates lineage twice)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    spark = docs.sparkSession
    dup = spark.createDataFrame([("en", 0.5), ("en", 0.9), ("fr", 1.0)],
                                "lang string, rate double")
    plan = stratified_sample(docs, dup)  # lazy: building the plan is fine
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="duplicate"):
        plan.collect()


def test_temperature_sample_zero_token_stratum(spark):
    """A stratum whose documents ALL tokenize to zero tokens cannot
    contribute to the token budget: its keep rate is an explicit 0.0
    (not a silent NULL-division drop), other strata are unaffected."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        temperature_sample,
    )

    rows = ([(i, "real words here for the token budget", "en")
             for i in range(20)]
            + [(100 + i, "", "zz") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = temperature_sample(df, budget_tokens=1_000_000).collect()
    assert {r.lang for r in out} == {"en"}
    assert len(out) == 20  # budget >> corpus: every en doc kept


def test_unigram_logprob_hot_token_split(spark):
    """The hot/cold split of the vocab join: a super-hot token (in every
    doc) rides the broadcast branch, the tail takes the shuffle join,
    and the scores are identical to the unsplit plan — on both the
    self-trained and frozen-model paths. The plan carries the broadcast
    joins the split promises."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_counts,
        unigram_logprob,
    )

    # 60 docs, every one contains 'the' (the hot key); tails unique
    docs = spark.createDataFrame(
        [(i, f"the tail{i} word{i % 7}") for i in range(60)],
        "doc_id long, text string")

    split = unigram_logprob(docs, hot_k=3)
    base = {r.doc_id: r for r in unigram_logprob(docs, hot_k=0).collect()}
    got = {r.doc_id: r for r in split.collect()}
    assert set(got) == set(base)
    for d, r in got.items():
        assert r.n_tokens == base[d].n_tokens
        assert abs(r.avg_logprob - base[d].avg_logprob) < 1e-12

    plan = split._jdf.queryExecution().executedPlan().toString()
    # the hot inner join AND the hot-exclusion anti-join both broadcast
    assert plan.count("BroadcastHashJoin [t") >= 2, plan

    # frozen model: same split, same values, OOV floor intact
    model = unigram_counts(docs)
    fr_split = {r.doc_id: r.avg_logprob for r in unigram_logprob(
        docs, model_counts=model, hot_k=3).collect()}
    fr_base = {r.doc_id: r.avg_logprob for r in unigram_logprob(
        docs, model_counts=model, hot_k=0).collect()}
    assert all(abs(fr_split[d] - fr_base[d]) < 1e-12 for d in fr_base)


def test_temperature_sample_exact_prefix_cut(spark):
    """The exact cut keeps, per stratum, the (hash-fraction, id)-ordered
    prefix whose token mass fits the mixture allocation: every kept doc
    started inside the budget, the FIRST excluded doc would not have,
    and the kept mass overshoots by at most the last document."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
        temperature_mixture,
        temperature_sample_exact,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        token_count,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", "tok " * (3 + i % 5))
         for i in range(60)],
        "doc_id long, lang string, text string")
    budget = 100
    kept = temperature_sample_exact(docs, alpha=0.5,
                                    budget_tokens=budget).collect()
    alloc = {r.lang: r.alloc_tokens for r in temperature_mixture(
        docs, alpha=0.5, budget_tokens=budget).collect()}
    order = {r.doc_id: (r.lang, r.hf, r.nt) for r in docs.select(
        "doc_id", "lang", hash_fraction(F.col("doc_id"), "tsample")
        .alias("hf"), token_count(F.col("text")).alias("nt")).collect()}

    kept_ids = {r.doc_id for r in kept}
    assert kept_ids and kept_ids < {i for i in range(60)}
    for lang in alloc:
        seq = sorted(((hf, d, nt) for d, (lg, hf, nt) in order.items()
                      if lg == lang))
        cum = 0
        for hf, d, nt in seq:
            if cum < alloc[lang]:
                assert d in kept_ids, (lang, d, cum, alloc[lang])
            else:
                assert d not in kept_ids, (lang, d, cum, alloc[lang])
            cum += nt
    # determinism
    again = {r.doc_id for r in temperature_sample_exact(
        docs, alpha=0.5, budget_tokens=budget).collect()}
    assert again == kept_ids
    # original columns, unmodified rows
    assert {r.doc_id: r.text for r in kept} == {
        i: "tok " * (3 + i % 5) for i in kept_ids}


def test_epoch_shuffle_reproducible_and_epoch_independent(docs):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        epoch_shuffle,
    )

    a = epoch_shuffle(docs, 0).select("doc_id", "shuffle_key").collect()
    b = epoch_shuffle(docs, 0).select("doc_id", "shuffle_key").collect()
    c = {r.doc_id: r.shuffle_key
         for r in epoch_shuffle(docs, 1).select("doc_id",
                                                "shuffle_key").collect()}
    # same epoch → bit-identical keys; different epoch → a different order
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    order0 = [r.doc_id for r in sorted(a, key=lambda r: (r.shuffle_key,
                                                         r.doc_id))]
    order1 = sorted(c, key=lambda d: (c[d], d))
    assert order0 != order1 and sorted(order0) == sorted(order1)
    assert all(0.0 <= r.shuffle_key < 1.0 for r in a)


def test_shuffled_packing_prefix_sum_follows_shuffled_order(docs):
    """pack_chunks(order_col=shuffle_key): each start_offset is the exact
    token prefix sum over the SHUFFLED within-shard order, and the chunk
    assignment moves with the epoch while conserving the token budget."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        epoch_shuffle,
    )

    sharded = assign_shards(docs, 4)
    shuf = epoch_shuffle(sharded, 3)
    packed = pack_chunks(shuf, 20, order_col="shuffle_key").collect()
    keys = {r.doc_id: r[1] for r in
            shuf.select("doc_id", "shuffle_key").collect()}
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: (keys[r.doc_id], r.doc_id))
        running = 0
        for r in rows:
            assert r.start_offset == running
            assert r.chunk == running // 20
            running += r.n_tokens
    # id-order packing (no order_col) differs from the shuffled packing
    plain = {(r.shard, r.doc_id): r.start_offset
             for r in pack_chunks(sharded, 20).collect()}
    assert any(plain[(r.shard, r.doc_id)] != r.start_offset for r in packed)


def test_write_training_shards_shuffle_epoch_artifacts(docs, tmp_path):
    """Per-epoch shard artifacts: same epoch re-cuts byte-identically,
    different epochs order independently, and the written rows are sorted
    in loader order (chunk, shuffle_key, id) within each shard file."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        write_training_shards,
    )

    spark = docs.sparkSession
    e0, e0b, e1 = (str(tmp_path / d) for d in ("e0", "e0b", "e1"))
    for out, epoch in ((e0, 0), (e0b, 0), (e1, 1)):
        write_training_shards(docs, out, n_shards=4, budget_tokens=20,
                              shuffle_epoch=epoch)
    r0 = spark.read.parquet(e0).collect()
    r0b = spark.read.parquet(e0b).collect()
    r1 = spark.read.parquet(e1).collect()
    key = lambda r: (r.shard, r.doc_id)
    assert sorted(((key(r), r.start_offset) for r in r0)) == \
        sorted(((key(r), r.start_offset) for r in r0b))
    assert {key(r) for r in r0} == {key(r) for r in r1}
    assert sorted(((key(r), r.start_offset) for r in r0)) != \
        sorted(((key(r), r.start_offset) for r in r1))
    # loader order: within each shard partition file, rows come back in
    # (chunk, shuffle_key, doc_id) order with start_offset monotone
    for shard in {r.shard for r in r0}:
        rows = [r for r in spark.read.parquet(f"{e0}/shard={shard}")
                .collect()]
        offs = [r.start_offset for r in rows]
        assert offs == sorted(offs)


def test_corpus_report_hand_computed(spark):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        corpus_report,
    )

    rows = [
        (0, "a b c", "en"),        # 3 tokens
        (1, "a b c", "en"),        # exact dup of 0 (same fingerprint)
        (2, "a b c d e", "en"),    # 5 tokens
        (3, "x y", "fr"),          # 2 tokens
        (4, "x  Y", "fr"),         # normalizes to dup of... no: 'x y' vs 'x Y'->lower 'x y' → dup of 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.stratum: r for r in corpus_report(df).collect()}
    en, fr = out["en"], out["fr"]
    assert (en.n_docs, en.n_tokens, en.n_distinct_texts) == (3, 11, 2)
    assert (fr.n_docs, fr.n_tokens, fr.n_distinct_texts) == (2, 4, 1)
    assert abs(en.token_share - round(11 / 15, 6)) < 1e-9
    assert abs(fr.token_share - round(4 / 15, 6)) < 1e-9
    # exact linear-interpolated quantiles: en tokens [3, 3, 5]
    assert en.p50_tokens == 3.0
    assert abs(en.p90_tokens - (3 + 0.8 * 2)) < 1e-6
    assert fr.p50_tokens == 2.0


def test_corpus_report_approx_path_runs(docs):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        corpus_report,
    )

    exact = {r.stratum: r for r in corpus_report(docs).collect()}
    appr = {r.stratum: r
            for r in corpus_report(docs, exact_quantiles=False).collect()}
    assert set(exact) == set(appr)
    for s in exact:
        # counts/shares identical; quantiles within the small-n regime
        # where t-digest is exact
        assert exact[s].n_docs == appr[s].n_docs
        assert exact[s].token_share == appr[s].token_share
        assert abs(exact[s].p50_tokens - appr[s].p50_tokens) <= 1.0


def test_shuffled_packing_single_shuffle(docs):
    """The epoch-shuffle key rides the one shard repartition: ordering the
    packing window by (shuffle_key, id) instead of id adds NO exchange —
    the shuffled artifact costs the same one shuffle as the id-ordered
    one."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        _pack_columns,
        epoch_shuffle,
    )

    sharded = (epoch_shuffle(assign_shards(docs, 4), 2)
               .repartition(4, F.col("shard")))
    plan = (_pack_columns(sharded, 30, "shard", "text", "doc_id",
                          order_col="shuffle_key")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1


def test_assign_split_partitions_completely(docs):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        assign_split,
    )

    w = {"train": 0.8, "holdout": 0.1, "test": 0.1}
    out = assign_split(docs, w).collect()
    assert len(out) == 60
    labels = {r.split for r in out}
    assert labels <= set(w)
    # deterministic rerun; train dominates at these weights
    again = assign_split(docs, w).collect()
    assert sorted((r.doc_id, r.split) for r in out) == \
        sorted((r.doc_id, r.split) for r in again)
    n_train = sum(1 for r in out if r.split == "train")
    assert n_train > 30
    with pytest.raises(ValueError):
        assign_split(docs, {"train": 0.5, "test": 0.1})


def test_split_by_component_never_straddles_clusters(spark):
    """Planted near-dup clusters (as a pair list) must land whole in one
    split; singletons get exactly the id-hash assignment (component =
    own id)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        assign_split,
        split_by_component,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string")
    # clusters: {0..4} chained, {10, 11}, everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    w = {"train": 0.6, "holdout": 0.2, "test": 0.2}
    out = {r.doc_id: r for r in split_by_component(docs, pairs, w).collect()}
    assert len(out) == 40
    assert len({out[i].split for i in range(5)}) == 1
    assert out[10].split == out[11].split
    assert all(out[i].component == 0 for i in range(5))
    plain = {r.doc_id: r.split for r in assign_split(docs, w).collect()}
    singletons = set(range(40)) - set(range(5)) - {10, 11}
    assert all(out[i].split == plain[i] for i in singletons)


def test_score_buckets_equal_population_tiers(spark):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        score_buckets,
    )

    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "doc_id long, score double")
    out = score_buckets(df, 4, score_col="score").collect()
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    # quartiles of 0..99: ~equal tiers, monotone in score
    assert set(counts) == {0, 1, 2, 3}
    assert all(20 <= c <= 30 for c in counts.values())
    by_id = {r.doc_id: r.bucket for r in out}
    assert all(by_id[i] <= by_id[j]
               for i in range(100) for j in (i + 1,) if j < 100)
    # null scores bucket to null; exact vs approx agree on this ramp
    withnull = spark.createDataFrame([(0, None), (1, 1.0), (2, 2.0)],
                                     "doc_id long, score double")
    r0 = {r.doc_id: r.bucket
          for r in score_buckets(withnull, 2, score_col="score").collect()}
    assert r0[0] is None and {r0[1], r0[2]} == {0, 1}
    appr = {r.doc_id: r.bucket
            for r in score_buckets(df, 4, score_col="score",
                                   exact=False).collect()}
    assert sum(1 for i in by_id if by_id[i] != appr[i]) <= 5
    with pytest.raises(ValueError):
        score_buckets(df, 1, score_col="score")


def test_shard_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        assign_shards,
        check_shard_manifest,
        pack_chunks,
        write_shard_manifest,
        write_training_shards,
    )

    rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 5)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, budget_tokens=16)
    m = write_shard_manifest(spark, out, budget_tokens=16)
    assert m["n_shards"] == 4 and m["budget_tokens"] == 16
    assert sum(s["n_docs"] for s in m["shards"].values()) == 40
    # per-shard counts agree with the packing operator
    want = pack_chunks(assign_shards(docs, 4), budget_tokens=16)
    per = {str(r.shard): r.n for r in
           want.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert {k: v["n_docs"] for k, v in m["shards"].items()} == per

    assert check_shard_manifest(spark, out) == m

    # tamper: delete one shard directory → the loader check must raise
    import shutil

    shutil.rmtree(f"{out}/shard=2")
    with pytest.raises(ValueError, match="missing shards \\['2'\\]"):
        check_shard_manifest(spark, out)

    # no manifest at all → explicit refusal
    out2 = str(tmp_path / "bare")
    write_training_shards(docs, out2, n_shards=2, budget_tokens=16)
    with pytest.raises(ValueError, match="not a manifested"):
        check_shard_manifest(spark, out2)


def test_common_span_pairs_rejects_min_span_below_window(spark):
    """min_span < window is a silent-under-report setting (runs shorter
    than the shingle window leave no shingle to match) — the detector
    must refuse loudly, mirroring dedup.py's blocks > max_hamming
    guard. strip_shared_spans forwards the same parameters, so the
    refusal covers it too."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
        strip_shared_spans,
    )

    docs = spark.createDataFrame([(1, "a b c d e f"), (2, "a b c d e f")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="min_span=4 < window=8"):
        common_span_pairs(docs, window=8, min_span=4)
    with pytest.raises(ValueError, match="min_span"):
        strip_shared_spans(docs, window=8, min_span=4)
    # the boundary itself is legal: min_span == window
    assert common_span_pairs(docs, window=4, min_span=4).count() == 1


def test_common_span_pairs_default_max_df_is_bounded(spark):
    """The document-frequency cap is ON BY DEFAULT: a corpus-hot
    shingle (present in > DEFAULT_SPAN_MAX_DF documents) leaves the
    candidate join without the caller passing anything, so the one
    silent quadratic footgun needs an EXPLICIT max_df=None opt-out."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        DEFAULT_SPAN_MAX_DF,
        common_span_pairs,
    )

    n = DEFAULT_SPAN_MAX_DF + 4
    footer = " f1 f2 f3 f4 f5 f6 f7 f8"
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c" + footer) for i in range(1, n + 1)],
        "doc_id long, text string")
    # default: the footer shingles are corpus-hot → no candidate pairs
    assert common_span_pairs(docs, window=4, min_span=8).count() == 0
    # explicit opt-out restores the exhaustive (quadratic) behavior
    sample = docs.filter(F.col("doc_id") <= 5)
    assert common_span_pairs(sample, window=4, min_span=8,
                             max_df=None).count() == 10


def test_funnel_gopher_runs_after_boilerplate_strip(spark):
    """Gopher structural rules must score the text that SHIPS: a
    mostly-boilerplate page whose word count clears min_words only
    thanks to a footer that strip_hot then deletes must be DROPPED,
    not kept as an 8-word stub."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        filter_documents,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hot_passages,
    )

    footer = " ".join(f"f{i}" for i in range(1, 25))        # 24 tokens
    thin = "u1 u2 u3 u4 u5 u6 u7 u8 " + footer              # 32 → 8
    fat = " ".join(f"w{i}" for i in range(1, 25)) + " " + footer  # 48 → 24
    docs = spark.createDataFrame([(1, thin), (2, fat)],
                                 "doc_id long, text string")
    ref = spark.createDataFrame(
        [(100, "ref page one body " + footer),
         (101, "ref page two body " + footer)],
        "doc_id long, text string")
    hot = hot_passages(ref, window=8)
    out = filter_documents(
        docs, min_quality=0.0, strip_hot=hot,
        gopher={"min_words": 20, "min_stop_hits": 0,
                "min_mean_word_len": 0.0, "min_alpha_words": 0.0})
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {2}
    assert got[2] == " ".join(f"w{i}" for i in range(1, 25))


def test_score_weighted_sample_null_score_survives_at_floor(spark):
    """NULL scores must behave exactly like score 0.0 (survive at the
    exploration floor), never silently vanish on a NULL comparison."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        score_weighted_sample,
    )

    rows = [(i, None if i % 2 == 0 else 0.0) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, score double")
    # floor=1.0: every row survives, NULL-scored included
    assert score_weighted_sample(docs, "score", floor=1.0).count() == 40
    # any floor: NULL-scored and zero-scored rows make identical
    # decisions (same id-hash, same effective rate)
    kept = {r.doc_id for r in
            score_weighted_sample(docs, "score", floor=0.31).collect()}
    zeroed = docs.select("doc_id", F.lit(0.0).alias("score"))
    want = {r.doc_id for r in
            score_weighted_sample(zeroed, "score", floor=0.31).collect()}
    assert kept == want
    # floor=0.0: rate is exactly 0 → nothing survives (and nothing errs)
    assert score_weighted_sample(docs, "score", floor=0.0).count() == 0


def test_hashed_text_embedding_feeds_semantic_dedup(spark):
    """The model-free vectorizer closes the text → embedding →
    semantic-dedup loop: unit-norm vectors, zero vector for token-less
    docs, near-identical token multisets land as cluster-blocked
    near-dup pairs while unrelated docs do not."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hashed_text_embedding,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame([
        (1, a),
        (2, a + " today"),                       # near-identical multiset
        (3, "spark shuffles partitioned data across executor machines"),
        (4, ""),
        (5, None),    # NULL text must embed, not vanish (r11 advisor)
    ], "doc_id long, text string")
    emb = hashed_text_embedding(docs, dim=32)
    rows = {r.doc_id: r for r in emb.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}   # one output row per input row
    for i in (1, 2, 3):
        assert math.isclose(sum(x * x for x in rows[i].embedding), 1.0,
                            rel_tol=1e-4), i
    for i in (4, 5):
        assert rows[i].embedding == [0.0] * 32 and rows[i].n_tokens == 0
    # determinism: same text → identical vector
    assert rows[1].embedding == hashed_text_embedding(
        docs.filter("doc_id = 1"), dim=32).first().embedding

    vecs = emb.filter("n_tokens > 0").select(
        F.col("doc_id").alias("vec_id"), "embedding")
    cents = train_ivf_centroids(vecs, 2, 32, max_iter=4)
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in cluster_neardup_pairs(
        vecs, cents, threshold=0.8).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] > 0.9


def test_split_long_documents_pieces_and_overlap(spark):
    """Window/stride chunking: full coverage of the token stream, the
    overlap repeated between consecutive pieces, short docs untouched,
    token-less docs kept as one empty piece, bad strides refused."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        split_long_documents,
    )

    text = " ".join(f"w{i}" for i in range(1, 11))      # 10 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = {(r.doc_id, r.piece): r for r in split_long_documents(
        docs, max_tokens=4, overlap=1).collect()}
    # doc 1: step 3 → pieces at 1, 4, 7, 10 → ceil((10-4)/3)+1 = 3? no:
    # ceil(6/3)+1 = 3 pieces at starts 1, 4, 7 — the last covers 7..10
    p1 = [out[(1, i)] for i in range(3)]
    assert [(r.piece_start, r.n_tokens) for r in p1] == \
        [(1, 4), (4, 4), (7, 4)]
    assert p1[0].text == "w1 w2 w3 w4"
    assert p1[1].text == "w4 w5 w6 w7"       # 1-token overlap carried
    assert p1[2].text == "w7 w8 w9 w10"
    assert (1, 3) not in out                 # no phantom piece
    # short doc: one piece, untouched content
    assert out[(2, 0)].text == "a b c" and out[(2, 0)].n_tokens == 3
    # token-less doc survives as one empty piece
    assert out[(3, 0)].text == "" and out[(3, 0)].n_tokens == 0
    # NULL text rides the same lane — one empty piece, n_tokens 0, not
    # the -1 / dropped-row corruption sizeOfNull(NULL array) would give
    assert out[(4, 0)].text == "" and out[(4, 0)].n_tokens == 0
    assert (4, 1) not in out
    # coverage: every original token appears in some piece of doc 1
    covered = {w for r in p1 for w in r.text.split()}
    assert covered == {f"w{i}" for i in range(1, 11)}
    with pytest.raises(ValueError, match="overlap"):
        split_long_documents(docs, max_tokens=4, overlap=4)


def test_mix_sources_explicit_weights(spark):
    """Explicit-weight cross-source mixing: expected token mass tracks
    the stated shares, small sources clamp at keep-everything,
    membership is keyed by (source, id) so id reuse across corpora
    cannot correlate decisions, and contract violations refuse."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        mix_sources,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        token_count,
    )

    web = spark.createDataFrame(
        [(i, "w " * 20) for i in range(400)], "doc_id long, text string")
    code = spark.createDataFrame(
        [(i, "c " * 20) for i in range(400)], "doc_id long, text string")
    wiki = spark.createDataFrame(
        [(i, "k " * 20) for i in range(5)], "doc_id long, text string")
    out = mix_sources({"web": web, "code": code, "wiki": wiki},
                      {"web": 3.0, "code": 1.0, "wiki": 1.0},
                      budget_tokens=4000)
    got = {r.source: (r.n, r.toks) for r in out.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(token_count(F.col("text"))).alias("toks")).collect()}
    # shares: web 0.6*4000=2400, code 0.2*4000=800 of 8000 each;
    # wiki 0.2*4000=800 > its 100 tokens → keeps all 5 docs
    assert got["wiki"] == (5, 100)
    assert abs(got["web"][1] - 2400) < 600       # ±~4σ of 120-doc draw
    assert abs(got["code"][1] - 800) < 400
    # (source, id)-keyed membership: same ids, independent decisions
    kept_web = {r.doc_id for r in out.filter("source = 'web'").collect()}
    kept_code = {r.doc_id for r in out.filter("source = 'code'").collect()}
    assert kept_web != kept_code
    # determinism
    out2 = mix_sources({"web": web, "code": code, "wiki": wiki},
                       {"web": 3.0, "code": 1.0, "wiki": 1.0},
                       budget_tokens=4000)
    assert sorted((r.source, r.doc_id) for r in out2.collect()) == \
        sorted((r.source, r.doc_id) for r in out.collect())
    with pytest.raises(ValueError, match="different sources"):
        mix_sources({"web": web}, {"web": 1.0, "code": 1.0}, 100)
    with pytest.raises(ValueError, match="non-positive"):
        mix_sources({"web": web}, {"web": 0.0}, 100)
    with pytest.raises(ValueError, match="one schema"):
        mix_sources({"web": web,
                     "bad": web.select("text", "doc_id")},
                    {"web": 1.0, "bad": 1.0}, 100)
