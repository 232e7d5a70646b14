"""Streaming corpus funnel (streaming/corpus_stream.py): batch-funnel
parity on a split stream, replay idempotence, and the end-to-end
Structured Streaming loop."""

import pytest

# streaming replay/compaction soaks (~13 min) — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import json
import os

from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
    corpus_batch,
    read_corpus,
    run_corpus_stream,
)

SCHEMA = "doc_id long, text string"

T_A = ("the quick brown fox jumps over the lazy dog in the quiet park "
       "while birds sing softly overhead")
T_A2 = ("the quick brown fox jumps over the lazy dog in the quiet garden "
        "while birds sing softly overhead")  # near-dup of T_A
T_B = ("spark pipelines shuffle data between executors across the busy "
       "cluster during nightly batch processing runs")
T_C = ("a completely unrelated sentence about cooking pasta with fresh "
       "basil and ripe tomatoes from the garden")
T_D = ("numerical weather prediction models assimilate satellite "
       "observations to forecast storm tracks days ahead")

BATCHES = [
    [(1, T_A), (2, T_B), (3, T_C)],
    [(10, T_A2), (11, T_B)],   # near-dup of 1; exact copy of 2
    [(20, T_A), (21, T_D)],    # exact copy of 1; genuinely new
]
FUNNEL = dict(min_quality=0.0, near_dup_threshold=0.4,
              decontam_min_overlap=2)


def _bench(spark):
    return spark.createDataFrame([(100, T_C)], SCHEMA)


def _survivor_ids(spark, corpus_dir):
    return {r.doc_id for r in read_corpus(spark, corpus_dir).collect()}


def test_stream_matches_batch_funnel(spark, tmp_path):
    """The same documents, processed as three micro-batches against the
    persistent state, yield the same survivor set as one
    build_training_corpus run over the union — exact dedup, near-dup
    keep-one, and decontamination all agree cross-batch."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    got = _survivor_ids(spark, cdir)
    all_docs = spark.createDataFrame(
        [r for rows in BATCHES for r in rows], SCHEMA)
    funnel = {r.doc_id for r in build_training_corpus(
        all_docs, _bench(spark), **FUNNEL).collect()}
    assert got == funnel
    # the designed outcome: 3 decontaminated, 10 near-dup of 1,
    # 11 and 20 exact copies — none of the drops re-tokenized batch 0
    assert got == {1, 2, 21}
    # output keeps the original document columns
    assert set(read_corpus(spark, cdir).columns) == {"doc_id", "text"}


URL_SCHEMA = "doc_id long, text string, url string"

URL_BATCHES = [
    [(1, T_A, "https://ex.org/a?b=2&a=1"),
     (2, T_B, "https://ex.org/b")],
    [(10, T_C, "HTTPS://EX.ORG:443/a/?a=1&b=2&utm_x=1"),  # canonical == 1
     (11, T_D, "not a url")],
    [(20, T_D, "also not a url"),       # exact text copy of 11
     (21, T_C, "https://ex.org/c")],    # text copy of 10 — but 10 lost
]
URL_FUNNEL = dict(min_quality=0.0, near_dup_threshold=None, url_col="url")


def test_stream_url_dedup_matches_batch_funnel(spark, tmp_path):
    """URL-keyed crawl dedup ahead of content dedup, streamed against the
    urls/batch=* store, equals the batch funnel over the union: doc 10
    is dropped by URL (canonical form equals doc 1's) BEFORE its text
    could shadow doc 21; doc 20 is dropped by the fingerprint store
    (null URLs pass the URL stage); 21 survives in both."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(URL_BATCHES):
        corpus_batch(spark.createDataFrame(rows, URL_SCHEMA), i, cdir,
                     **URL_FUNNEL)
    got = _survivor_ids(spark, cdir)
    all_docs = spark.createDataFrame(
        [r for rows in URL_BATCHES for r in rows], URL_SCHEMA)
    funnel = {r.doc_id for r in build_training_corpus(
        all_docs, **URL_FUNNEL).collect()}
    assert got == funnel == {1, 2, 11, 21}
    assert set(read_corpus(spark, cdir).columns) \
        == {"doc_id", "text", "url"}


def test_stream_url_dedup_refuses_legacy_key_width(spark, tmp_path):
    """A urls store written by the pre-upgrade 16-hex key cut can never
    match a 32-hex probe — mixing widths would silently re-admit every
    pre-upgrade URL, so the probe fails loudly instead (the in-plan
    width guard; the sidecar discipline applied to a store that has no
    sidecar)."""
    import pytest
    from pyspark.sql import functions as F

    cdir = str(tmp_path / "corpus")
    corpus_batch(spark.createDataFrame(URL_BATCHES[0], URL_SCHEMA), 0,
                 cdir, **URL_FUNNEL)
    # truncate the stored keys to the legacy 16-hex width in place
    urls = spark.read.parquet(f"{cdir}/urls/batch=0") \
        .select("id", F.substring("u", 1, 16).alias("u")).collect()
    spark.createDataFrame(urls, "id long, u string") \
        .write.mode("overwrite").parquet(f"{cdir}/urls/batch=0")
    # the raise_error may surface as SparkRuntimeException or wrapped in
    # AQE's stage-materialization error — the message is the contract
    with pytest.raises(Exception, match="holds a key of width"):
        corpus_batch(spark.createDataFrame(URL_BATCHES[1], URL_SCHEMA),
                     1, cdir, **URL_FUNNEL)


def test_stream_url_dedup_replay_after_compaction(spark, tmp_path):
    """A batch replayed after compact_corpus_state folds the urls store
    into batch=-1 must not match its OWN url hashes (the own-id
    anti-join guard) — survivors identical before and after."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        compact_corpus_state,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(URL_BATCHES):
        corpus_batch(spark.createDataFrame(rows, URL_SCHEMA), i, cdir,
                     **URL_FUNNEL)
    before = _survivor_ids(spark, cdir)
    folded = compact_corpus_state(spark, cdir)
    assert folded["urls"] > 0
    for i, rows in enumerate(URL_BATCHES):
        corpus_batch(spark.createDataFrame(rows, URL_SCHEMA), i, cdir,
                     **URL_FUNNEL)
    assert _survivor_ids(spark, cdir) == before == {1, 2, 11, 21}


def test_stream_semantic_decontam_matches_batch_funnel(spark, tmp_path):
    """decontam_mode='semantic' in the streaming funnel equals the batch
    funnel over the union: the stage is shared verbatim and the
    benchmark-trained blocking centroids are a deterministic function
    of the frozen benchmark, so per-batch retraining reproduces the
    same cells every micro-batch."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    bench_words = [f"tok{i}" for i in range(12)]
    shuffled = [bench_words[j] for j in
                (7, 0, 5, 2, 9, 11, 1, 4, 10, 3, 8, 6)]
    batches = [
        [(1, " ".join(shuffled)),                       # reordered leak
         (2, " ".join(f"alpha{i}" for i in range(12)))],
        [(11, " ".join(reversed(bench_words))),         # another leak
         (12, " ".join(f"beta{i}" for i in range(12)))],
    ]
    bench = spark.createDataFrame([(100, " ".join(bench_words))],
                                  "doc_id long, text string")
    kw = dict(min_quality=0.0, near_dup_threshold=None,
              decontam_mode="semantic", decontam_threshold=0.9,
              decontam_k=1)
    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(batches):
        corpus_batch(spark.createDataFrame(
            rows, "doc_id long, text string"), i, cdir, bench, **kw)
    got = _survivor_ids(spark, cdir)
    want = {r.doc_id for r in build_training_corpus(
        spark.createDataFrame([r for b in batches for r in b],
                              "doc_id long, text string"),
        bench, **kw).collect()}
    assert got == want == {2, 12}


def test_corpus_batch_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (failure before the checkpoint commit)
    rewrites its own fingerprint/index/pairs/components/corpus
    partitions identically: survivors unchanged, no duplicated state."""
    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)
    before = _survivor_ids(spark, cdir)
    n_fp = spark.read.option("basePath", f"{cdir}/fingerprints") \
        .parquet(f"{cdir}/fingerprints").count()

    corpus_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2, cdir,
                 _bench(spark), **FUNNEL)
    assert _survivor_ids(spark, cdir) == before
    assert spark.read.option("basePath", f"{cdir}/fingerprints") \
        .parquet(f"{cdir}/fingerprints").count() == n_fp
    # batch 2's own corpus partition holds exactly its survivors
    assert {r.doc_id for r in spark.read.parquet(
        f"{cdir}/corpus/batch=2").collect()} == {21}


def test_run_corpus_stream_end_to_end(spark, tmp_path):
    """The foreachBatch wiring: a file stream drained twice under one
    checkpoint processes each delivery exactly once and accumulates the
    corpus output."""
    stream_dir = str(tmp_path / "docs")
    cdir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)

    def write_docs(name, rows):
        with open(f"{stream_dir}/{name}", "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run_once():
        st = spark.readStream.schema(SCHEMA).json(stream_dir)
        q = run_corpus_stream(st, cdir, ckpt, _bench(spark), **FUNNEL)
        q.awaitTermination(120)

    write_docs("b0.json", BATCHES[0])
    run_once()
    assert _survivor_ids(spark, cdir) == {1, 2}

    write_docs("b1.json", BATCHES[1] + BATCHES[2])
    run_once()
    assert _survivor_ids(spark, cdir) == {1, 2, 21}

    # without near-dup state the dropped docs would have resurfaced:
    # prove the second run actually consulted the cross-batch stores
    comp = spark.read.option("basePath", f"{cdir}/components") \
        .parquet(f"{cdir}/components")
    assert comp.filter("id = 10 and component = 1").count() == 1


def test_compact_corpus_state_preserves_dedup(spark, tmp_path):
    """Folding the state tables into batch=-1 changes no decision: a
    post-compaction batch still drops exact copies (fingerprint store)
    and near-dups (LSH index + components) of pre-compaction documents,
    and survivor sets are unchanged."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        compact_corpus_state,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES[:2]):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)
    before = _survivor_ids(spark, cdir)

    folded = compact_corpus_state(spark, cdir)
    assert folded == {"fingerprints": 2, "index": 2, "components": 2,
                      "idwatermark": 0, "urls": 0}
    assert _survivor_ids(spark, cdir) == before

    # batch 2 against the compacted state: 20 is an exact copy of 1
    # (pre-compaction), 21 is new — same outcome as the uncompacted run
    corpus_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2, cdir,
                 _bench(spark), **FUNNEL)
    assert _survivor_ids(spark, cdir) == before | {21}


def test_corpus_batch_shard_append(spark, tmp_path):
    """With n_shards + budget_tokens the batch's survivors are also
    packed into per-batch training shards; a shard's training stream is
    the two-level partitioned read shards/batch=*/shard=<k>, and replay
    rewrites the batch's shard directory identically."""
    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), n_shards=2, budget_tokens=8, **FUNNEL)

    shards = spark.read.option("basePath", f"{cdir}/shards") \
        .parquet(f"{cdir}/shards")
    assert {"doc_id", "text", "n_tokens", "start_offset", "chunk",
            "shard", "batch"} <= set(shards.columns)
    # every survivor is in exactly one shard row
    assert {r.doc_id for r in shards.collect()} \
        == _survivor_ids(spark, cdir) == {1, 2, 21}

    before = sorted(map(tuple, shards.drop("batch").collect()))
    corpus_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2, cdir,
                 _bench(spark), n_shards=2, budget_tokens=8, **FUNNEL)
    again = spark.read.option("basePath", f"{cdir}/shards") \
        .parquet(f"{cdir}/shards")
    assert sorted(map(tuple, again.drop("batch").collect())) == before


def test_stream_parity_random_splits(spark, tmp_path):
    """Property: for ANY document sequence (with arrival-ordered ids) and
    ANY micro-batch split, the streaming funnel's accumulated survivors
    equal one batch-funnel run over the union — the parity is structural
    (same shared stages, same pair set, same keep-one rule), not an
    artifact of the hand-built fixture."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    pool = [T_A, T_A2, T_B, T_C, T_D,
            "short low quality text",
            T_B.replace("nightly", "weekly"),  # near-dup of T_B
            ]

    @given(data=st.data())
    @settings(max_examples=3, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    def check(data):
        picks = data.draw(st.lists(st.integers(0, len(pool) - 1),
                                   min_size=2, max_size=8))
        docs = [(i * 7 + 1, pool[p]) for i, p in enumerate(picks)]
        n_cuts = data.draw(st.integers(0, min(2, len(docs) - 1)))
        cuts = sorted(data.draw(
            st.sets(st.integers(1, len(docs) - 1),
                    min_size=n_cuts, max_size=n_cuts)))
        bounds = [0, *cuts, len(docs)]
        batches = [docs[a:b] for a, b in zip(bounds, bounds[1:])]

        root = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            for i, rows in enumerate(batches):
                corpus_batch(spark.createDataFrame(rows, SCHEMA), i,
                             f"{root}/c", _bench(spark), **FUNNEL)
            got = _survivor_ids(spark, f"{root}/c")
            want = {r.doc_id for r in build_training_corpus(
                spark.createDataFrame(docs, SCHEMA), _bench(spark),
                **FUNNEL).collect()}
            assert got == want, (batches, got, want)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    check()


def test_fingerprint_probe_scans_store_without_shuffle(spark, tmp_path):
    """The exact-dedup store probe must broadcast the BATCH side and only
    scan the store (the LSH-probe discipline): a plain anti-join would
    shuffle the corpus-sized fingerprint store every micro-batch."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        read_state_except,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES[:2]):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    stored = read_state_except(spark, f"{cdir}/fingerprints", 99)
    batch_fps = spark.createDataFrame([("ab",), ("cd",)], "_fp string")
    hit = (stored.select(F.col("fp").alias("_fp"))
           .join(F.broadcast(batch_fps), "_fp", "left_semi"))
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    store_branch = plan.split("BroadcastHashJoin")[1] \
        .split("BroadcastQueryStage")[0]
    assert "Exchange hashpartitioning" not in store_branch, plan


def test_url_store_probe_scans_store_without_shuffle(spark, tmp_path):
    """The canonical-URL store probe keeps the fingerprint probe's
    discipline: batch side broadcasts, store side only SCANS — no hash
    exchange over the accumulated urls store."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        read_state_except,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(URL_BATCHES[:2]):
        corpus_batch(spark.createDataFrame(rows, URL_SCHEMA), i, cdir,
                     **URL_FUNNEL)

    stored = read_state_except(spark, f"{cdir}/urls", 99)
    batch_us = spark.createDataFrame([("ab",), ("cd",)], "_u string")
    hit = (stored.select(F.col("u").alias("_u"))
           .join(F.broadcast(batch_us), "_u", "left_semi"))
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    store_branch = plan.split("BroadcastHashJoin")[1] \
        .split("BroadcastQueryStage")[0]
    assert "Exchange hashpartitioning" not in store_branch, plan


def test_frozen_strip_hot_shared_by_batch_and_stream(spark, tmp_path):
    """A FROZEN hot-passage table makes boilerplate stripping a pure
    per-document rewrite: batch and streaming funnels strip the same
    footer, and two docs identical EXCEPT for the footer become exact
    duplicates after the strip in both paths."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hot_passages,
    )

    footer = "subscribe to our newsletter for weekly updates and offers"
    docs = [
        (1, f"unique alpha content about glaciers today {footer}"),
        (2, "unique alpha content about glaciers today"),  # dup post-strip
        (3, f"different beta story about volcanoes erupting {footer}"),
    ]
    # freeze the hot set from a reference crawl where the footer repeats
    ref = spark.createDataFrame(
        [(100, f"one reference page body {footer}"),
         (101, f"another reference body text {footer}")],
        "doc_id long, text string")
    hot = hot_passages(ref, window=8)
    assert hot.count() >= 1

    params = dict(min_quality=0.0, near_dup_threshold=None,
                  strip_hot=hot)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    batch = {(r.doc_id, r.text) for r in
             build_training_corpus(sdf, **params).collect()}
    # 2 collapsed into 1 (post-strip exact dup); footers gone
    assert {i for i, _ in batch} == {1, 3}
    assert all(not t.endswith("offers") for _, t in batch)

    cdir = str(tmp_path / "corpus")
    corpus_batch(spark.createDataFrame(docs[:1], "doc_id long, text string"),
                 0, cdir, **params)
    corpus_batch(spark.createDataFrame(docs[1:], "doc_id long, text string"),
                 1, cdir, **params)
    stream = {(r.doc_id, r.text) for r in
              read_corpus(spark, cdir).collect()}
    assert stream == batch


def test_empty_micro_batches_are_harmless(spark, tmp_path):
    """Empty micro-batches through the full corpus funnel: state and
    output stay consistent, later real batches are unaffected."""
    empty = spark.createDataFrame([], SCHEMA)
    cdir = str(tmp_path / "corpus")
    corpus_batch(empty, 0, cdir, _bench(spark), **FUNNEL)
    corpus_batch(spark.createDataFrame(BATCHES[0], SCHEMA), 1, cdir,
                 _bench(spark), **FUNNEL)
    corpus_batch(empty, 2, cdir, _bench(spark), **FUNNEL)
    assert _survivor_ids(spark, cdir) == {1, 2}


def test_read_training_shard_order_and_pruning(spark, tmp_path):
    """A shard's stream is its batches' rows in (batch, start_offset)
    order, covers exactly that shard's survivors, and the shard filter
    reaches the scan as a partition-pruning predicate."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        read_training_shard,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), n_shards=2, budget_tokens=8, **FUNNEL)

    seen = set()
    for shard in (0, 1):
        df = read_training_shard(spark, cdir, shard)
        rows = df.collect()
        seen |= {r.doc_id for r in rows}
        keys = [(r.batch, r.start_offset) for r in rows]
        assert keys == sorted(keys)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = plan[plan.find("PartitionFilters"):].split("]")[0]
        assert "shard" in pf and "isnotnull" in pf, plan
    assert seen == _survivor_ids(spark, cdir)


def test_corpus_batch_replay_after_compaction(spark, tmp_path):
    """The failure mode the fingerprint-store guard exists for: after
    compact_corpus_state folds the state into batch=-1, a replayed batch
    finds its OWN fingerprints (and component labels) in the store —
    read_state_except can no longer exclude them by partition. Without
    the own-id anti-join the replay's `kept` set would come out empty and
    corpus/batch=<id> would be overwritten empty, permanently losing the
    batch's survivors; without update_components' write-every-batch-id
    contract the keep-one read would lose the representatives the same
    way. The replay must rewrite every partition equivalently."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        compact_corpus_state,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)
    before = _survivor_ids(spark, cdir)
    assert before == {1, 2, 21}
    n_fp = spark.read.option("basePath", f"{cdir}/fingerprints") \
        .parquet(f"{cdir}/fingerprints").count()

    assert compact_corpus_state(spark, cdir) \
        == {"fingerprints": 3, "index": 3, "components": 3,
            "idwatermark": 0, "urls": 0}

    # replay every batch post-compaction (worst case: all ids already in
    # batch=-1 state)
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    assert _survivor_ids(spark, cdir) == before
    # each batch's corpus partition still holds exactly its survivors
    assert {r.doc_id for r in spark.read.parquet(
        f"{cdir}/corpus/batch=0").collect()} == {1, 2}
    assert {r.doc_id for r in spark.read.parquet(
        f"{cdir}/corpus/batch=2").collect()} == {21}
    # fingerprint store: no duplicated rows (batch partitions redundant
    # with batch=-1 hold the same (id, fp) facts)
    fp = spark.read.option("basePath", f"{cdir}/fingerprints") \
        .parquet(f"{cdir}/fingerprints")
    assert fp.select("id", "fp").distinct().count() == n_fp


def test_read_training_shard_tiebreak_on_zero_token_docs(spark, tmp_path):
    """start_offset TIES are real: zero-token documents (e.g. texts
    stripped empty) advance the running offset by 0, so consecutive ids
    share an offset. The loader contract must pin a total order — rows
    with equal (batch, start_offset) come back in id order."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        write_training_shards,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        read_training_shard,
    )

    cdir = str(tmp_path / "corpus")
    rows = [(1, "five words of real text"), (2, ""), (3, ""), (4, ""),
            (5, "more text")]
    df = spark.createDataFrame(rows, SCHEMA)
    write_training_shards(df, f"{cdir}/shards/batch=0", n_shards=1,
                          budget_tokens=8)

    out = read_training_shard(spark, cdir, 0).collect()
    assert [r.doc_id for r in out] == [1, 2, 3, 4, 5]
    # the tie exists (docs 2-4 share doc 1's end offset with doc 5)
    offsets = [r.start_offset for r in out]
    assert len(set(offsets)) < len(offsets)
    keys = [(r.batch, r.start_offset, r.doc_id) for r in out]
    assert keys == sorted(keys)


def test_finalize_corpus_matches_batch_funnel(spark, tmp_path):
    """The quiesce-time finalization (read_corpus -> cap -> shards) over
    a STREAMED corpus equals one build_training_corpus run with
    cap_per_lang over the same documents — the sampling stage is shared
    verbatim (capped_sample_stage), so counts, rates, and hash-fraction
    membership are bit-identical."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        finalize_corpus,
    )

    cdir = str(tmp_path / "corpus")
    out = str(tmp_path / "final")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    fin = finalize_corpus(spark, cdir, out, cap_per_lang=2,
                          n_shards=2, budget_tokens=8)
    got = {r.doc_id for r in fin.collect()}
    all_docs = spark.createDataFrame(
        [r for rows in BATCHES for r in rows], SCHEMA)
    want = {r.doc_id for r in build_training_corpus(
        all_docs, _bench(spark), cap_per_lang=2, **FUNNEL).collect()}
    assert got == want
    # the cap bit: 3 streamed survivors, expected-2 kept — strictly fewer
    assert got < _survivor_ids(spark, cdir)
    # finalized columns are the document columns, untouched
    assert set(fin.columns) == {"doc_id", "text"}
    # the training artifact: shard-partitioned, packed, loader-ordered,
    # covering exactly the finalized survivors
    shards = spark.read.option("basePath", out).parquet(out)
    assert {r.doc_id for r in shards.collect()} == got
    assert {"shard", "chunk", "start_offset"} <= set(shards.columns)


def test_finalize_corpus_temperature_and_guards(spark, tmp_path):
    """The temperature stage realizes the alpha-mixture over the
    accumulated corpus (same rows as temperature_sample_stage applied
    directly), and temperature_alpha without its token budget fails
    loudly instead of sampling against an undefined allocation."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        temperature_sample_stage,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        finalize_corpus,
        read_corpus,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    got = {r.doc_id for r in finalize_corpus(
        spark, cdir, temperature_alpha=0.5,
        temperature_budget_tokens=20).collect()}
    want = {r.doc_id for r in temperature_sample_stage(
        read_corpus(spark, cdir), 0.5, 20).collect()}
    assert got == want and got  # non-degenerate: the budget keeps some

    with pytest.raises(ValueError, match="temperature_budget_tokens"):
        finalize_corpus(spark, cdir, temperature_alpha=0.5)


# out-of-order delivery: batch 1 ships a SMALLER-id near-dup of a doc
# batch 0 already shipped — the one precondition violation that silently
# breaks stream/batch keep-one parity (the batch funnel would elect the
# later, smaller id as representative; the stream can't unship)
OOO_BATCHES = [
    [(100, T_A), (101, T_B)],
    [(5, T_A2), (6, T_C)],
]


def test_monotone_id_guard_fails_reordered_stream(spark, tmp_path):
    """enforce_monotone_ids turns the silent parity break into a loud
    per-batch failure, stays replay-safe (a replayed batch ignores its
    own watermark), and survives compaction (the in-row src_batch keeps
    the self-exclusion working from batch=-1)."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        compact_corpus_state,
    )

    cdir = str(tmp_path / "corpus")
    corpus_batch(spark.createDataFrame(OOO_BATCHES[0], SCHEMA), 0, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    with pytest.raises(ValueError, match="monotone"):
        corpus_batch(spark.createDataFrame(OOO_BATCHES[1], SCHEMA), 1,
                     cdir, enforce_monotone_ids=True, **FUNNEL)
    # the rejected batch advanced nothing: a corrected redelivery passes
    corpus_batch(spark.createDataFrame([(200, T_D)], SCHEMA), 1, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    # replay of an accepted batch passes the check (own watermark row is
    # excluded by partition)
    corpus_batch(spark.createDataFrame(OOO_BATCHES[0], SCHEMA), 0, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    # ... and still passes after compaction folds the watermark into
    # batch=-1 (excluded by the in-row src_batch, not the partition)
    folded = compact_corpus_state(spark, cdir)
    assert folded["idwatermark"] == 2
    corpus_batch(spark.createDataFrame(OOO_BATCHES[0], SCHEMA), 0, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    assert _survivor_ids(spark, cdir) == {100, 101, 200}


def test_remap_arrival_ids_restores_parity(spark, tmp_path):
    """Re-keying each batch with remap_arrival_ids makes the reordered
    stream's survivors equal one build_training_corpus run over the
    re-keyed union — the remap IS the fix the guard test demands."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        remap_arrival_ids,
    )

    cdir = str(tmp_path / "corpus")
    remapped = [
        remap_arrival_ids(spark.createDataFrame(rows, SCHEMA), i)
        for i, rows in enumerate(OOO_BATCHES)
    ]
    for i, b in enumerate(remapped):
        corpus_batch(b, i, cdir, enforce_monotone_ids=True, **FUNNEL)

    union = remapped[0].unionByName(remapped[1])
    want = {r.doc_id for r in build_training_corpus(
        union, **FUNNEL).collect()}
    got_rows = read_corpus(spark, cdir).collect()
    assert {r.doc_id for r in got_rows} == want
    # keep-one elected batch 0's copy of the near-dup pair (arrival
    # order), traceable to the source id through the lineage column
    assert {r.doc_id_src for r in got_rows} == {100, 101, 6}


def test_remap_arrival_ids_contract(spark):
    """Deterministic (a replay re-derives identical ids), unique,
    monotone across batches, lineage preserved, capacity guarded."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        remap_arrival_ids,
    )

    rows = [(i * 7 % 50, f"text number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = remap_arrival_ids(df, 3, n_buckets=8).collect()
    b = remap_arrival_ids(df, 3, n_buckets=8).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    assert {(r.doc_id, r.doc_id_src) for r in a} \
        == {(r.doc_id, r.doc_id_src) for r in b}
    assert len({r.doc_id for r in a}) == 50
    # monotone: every batch-3 id exceeds every batch-2 id
    prev = remap_arrival_ids(df, 2, n_buckets=8).collect()
    assert min(r.doc_id for r in a) > max(r.doc_id for r in prev)
    # lineage column round-trips the source ids
    assert sorted(r.doc_id_src for r in a) == sorted(r[0] for r in rows)

    with pytest.raises(ValueError, match="range"):
        remap_arrival_ids(df, 1 << 23)
    with pytest.raises(ValueError, match="n_buckets"):
        remap_arrival_ids(df, 0, n_buckets=5000)
    with pytest.raises(ValueError, match="lineage"):
        remap_arrival_ids(df.withColumn("doc_id_src", df.doc_id), 0)


def test_finalize_corpus_snapshot_vs_live_stream(spark, tmp_path):
    """Finalization over a still-running stream is batch-boundary
    consistent: the corpus listing is pinned when finalize_corpus reads
    the directory, so a batch landing afterwards is wholly excluded
    (never a torn batch), and a re-run picks it up. The exact
    temperature cut (temperature_exact=True) equals
    temperature_sample_exact applied directly."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        temperature_sample_stage,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        finalize_corpus,
        read_corpus,
    )

    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(BATCHES[:2]):
        corpus_batch(spark.createDataFrame(rows, SCHEMA), i, cdir,
                     _bench(spark), **FUNNEL)

    fin = finalize_corpus(spark, cdir)  # listing pinned HERE
    # a new batch lands while the finalize plan is in flight
    corpus_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2, cdir,
                 _bench(spark), **FUNNEL)
    got = {r.doc_id for r in fin.collect()}
    assert got == {1, 2}  # batch 2's survivor (21) wholly excluded
    rerun = {r.doc_id for r in finalize_corpus(spark, cdir).collect()}
    assert rerun == {1, 2, 21}

    # exact temperature cut wired through the stage — compare against
    # the stage applied directly to the same input (the corpus has no
    # lang column, so the stage annotates lang_pred)
    exact = {r.doc_id for r in finalize_corpus(
        spark, cdir, temperature_alpha=0.5, temperature_budget_tokens=25,
        temperature_exact=True).collect()}
    want = {r.doc_id for r in temperature_sample_stage(
        read_corpus(spark, cdir), 0.5, 25, exact=True).collect()}
    assert exact == want and exact <= rerun


def test_monotone_guard_string_ids(spark, tmp_path):
    """The watermark schema follows the id column's type — string doc
    ids (URL-keyed crawls) are valid everywhere else in the funnel, so
    the opt-in order check must validate them, not crash on a
    hard-coded long schema."""
    import pytest

    cdir = str(tmp_path / "corpus")
    s_schema = "doc_id string, text string"
    corpus_batch(spark.createDataFrame([("a1", T_A)], s_schema), 0, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    corpus_batch(spark.createDataFrame([("b1", T_B)], s_schema), 1, cdir,
                 enforce_monotone_ids=True, **FUNNEL)
    with pytest.raises(ValueError, match="monotone"):
        corpus_batch(spark.createDataFrame([("a0", T_D)], s_schema), 2,
                     cdir, enforce_monotone_ids=True, **FUNNEL)
    assert _survivor_ids(spark, cdir) == {"a1", "b1"}


def test_remap_arrival_ids_duplicate_source_ids(spark):
    """A batch carrying DUPLICATE source ids (same URL crawled twice in
    one window) still re-derives byte-identical (id, text) pairings on
    replay — the full-row hash tiebreaker makes the within-duplicate
    order deterministic."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        remap_arrival_ids,
    )

    rows = [(7, "first crawl of the page"), (7, "second crawl revised"),
            (8, "another page")]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted((r.doc_id, r.doc_id_src, r.text)
               for r in remap_arrival_ids(df, 0, n_buckets=4).collect())
    b = sorted((r.doc_id, r.doc_id_src, r.text)
               for r in remap_arrival_ids(df, 0, n_buckets=4).collect())
    assert a == b
    assert len({i for i, _, _ in a}) == 3  # unique new ids
    assert sorted(s for _, s, _ in a) == [7, 7, 8]
