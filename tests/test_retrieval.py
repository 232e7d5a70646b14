"""Lexical retrieval (operators/retrieval.py) + the persisted BM25 index
(streaming/lexical_stream.py): scores vs an independent python mirror,
batched ≡ single-query, skew pruning, RRF fusion math, stored-index ≡
ad-hoc parity, replay idempotence, sidecar refusal, and the pruning
predicates actually reaching the parquet scan."""

import pytest

# index fold/lease/crash soaks (~10 min; the fast tier keeps test_bm25_doclens.py for the delete path) — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_join,
    corpus_stats,
    hybrid_topk,
    postings,
    reciprocal_rank_fusion,
)
from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (
    bm25_index_batch,
    bm25_search,
    run_bm25_index_stream,
    term_bucket_py,
)

DOCS = [(0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat cat cat dog"),
        (3, None),
        (4, ""),
        (5, "fish swim and CAT naps")]
D_SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(DOCS, D_SCHEMA)


def _gen_ptr(spark, idir):
    """The index's read pointer MINUS the per-segment stats snapshot
    (asserted separately where it matters) — keeps the protocol
    assertions exact without restating every segment's (n_docs,
    sum_dl) pair."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    p = _read_json_sidecar(spark, idir + "/_bm25_generation.json")
    if p is not None:
        p = dict(p)
        p.pop("seg_stats", None)
    return p


def _mirror_bm25(query_terms, k1=1.2, b=0.75, docs=None):
    """Independent python BM25 mirror (Lucene idf, term-sorted left
    fold, round-6 — the contract the Spark path and the DuckDB oracle
    both state). THE one sequential restatement of the scoring
    contract: test_properties.py imports it too, so a contract change
    has exactly one mirror to update."""
    tok = {i: (t or "").lower().split() for i, t in (docs or DOCS)}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    qt = sorted({t.lower() for t in query_terms if t and t.strip()})
    dfreq = {t: sum(1 for v in tok.values() if t in v) for t in qt}
    out = {}
    for d, words in tok.items():
        s, hits = 0.0, 0
        for t in qt:
            tf = words.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(words) / avgdl))
        if hits:
            out[d] = (hits, round(s, 6))
    return out


def test_bm25_matches_python_mirror(spark):
    got = {r.doc_id: (r.n_terms_hit, r.score)
           for r in bm25_topk(_docs(spark), ["cat", "dog", "absent"],
                              k=10).collect()}
    assert got == _mirror_bm25(["cat", "dog", "absent"])


def test_bm25_rank_order_and_ties(spark):
    rows = bm25_topk(_docs(spark), ["cat", "dog"], k=10).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # equal scores order by doc_id (determinism the oracle also states)
    for a, b2 in zip(rows, rows[1:]):
        if a.score == b2.score:
            assert a.doc_id < b2.doc_id


def test_null_and_empty_docs_count_in_stats_but_never_rank(spark):
    """Doc 3 (NULL) and doc 4 (empty) contribute to N and avgdl yet can
    never appear in results; dropping them from the corpus CHANGES other
    docs' scores (proof they entered the stats)."""
    full = {r.doc_id: r.score
            for r in bm25_topk(_docs(spark), ["cat"], k=10).collect()}
    assert 3 not in full and 4 not in full
    trimmed = spark.createDataFrame(
        [d for d in DOCS if d[0] not in (3, 4)], D_SCHEMA)
    cut = {r.doc_id: r.score
           for r in bm25_topk(trimmed, ["cat"], k=10).collect()}
    assert set(full) == set(cut) and full != cut


def test_case_insensitive_query_and_doc(spark):
    # "CAT" in doc 5 and query casing both normalize
    got = {r.doc_id for r in
           bm25_topk(_docs(spark), ["CaT"], k=10).collect()}
    assert got == {0, 2, 5}


def test_postings_shape(spark):
    ps = postings(_docs(spark)).collect()
    by = {(r.id, r.term): (r.tf, r.dl) for r in ps}
    assert by[(2, "cat")] == (3, 4)
    assert by[(0, "the")] == (2, 6)
    assert not [r for r in ps if r.id in (3, 4)]
    st = corpus_stats(_docs(spark)).head()
    assert (st.n_docs, st.sum_dl) == (6, 18)
    assert st.avgdl == 3.0


def test_batched_join_equals_per_query(spark):
    docs = _docs(spark)
    queries = [(0, "cat dog"), (1, "fish the"), (2, "absent only")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = bm25_topk_join(qdf, docs, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(
            (r.rank, r.doc_id, r.n_terms_hit, r.score))
    for qid, text in queries:
        want = [(r.rank, r.doc_id, r.n_terms_hit, r.score)
                for r in bm25_topk(docs, text.split(), k=4).collect()]
        assert sorted(by_q.get(qid, [])) == sorted(want), qid


def test_batched_join_shuffle_path_identical(spark):
    docs = _docs(spark)
    qdf = spark.createDataFrame([(0, "cat dog"), (1, "fish the")],
                                "query_id long, text string")
    a = sorted(map(tuple, bm25_topk_join(qdf, docs, k=4).collect()))
    b = sorted(map(tuple, bm25_topk_join(
        qdf, docs, k=4, broadcast_queries=False).collect()))
    assert a == b


def test_max_df_pruning_drops_common_terms(spark):
    """With max_df_ratio=0.4 'the' (df 2/6) survives but 'cat' and 'sat'
    (df 3/6 each) prune — scores become the-only."""
    docs = _docs(spark)
    qdf = spark.createDataFrame([(0, "cat the")],
                                "query_id long, text string")
    got = bm25_topk_join(qdf, docs, k=10, max_df_ratio=0.4).collect()
    assert {r.doc_id for r in got} == {0, 1}  # the-docs, not cat-docs
    assert all(r.n_terms_hit == 1 for r in got)
    want = {r.doc_id: r.score
            for r in bm25_topk(docs, ["the"], k=10).collect()}
    assert {r.doc_id: r.score for r in got} == want


def test_rrf_matches_python_mirror(spark):
    lex = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                "doc_id long, rank long")
    vec = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank long")
    got = {r.doc_id: (r.n_sources, r.rrf_score)
           for r in reciprocal_rank_fusion(
               [("lex", lex), ("vec", vec)]).collect()}
    assert got == {
        0: (1, round(1 / 61, 6)),
        1: (2, round(1 / 62 + 1 / 61, 6)),
        2: (1, round(1 / 63, 6)),
        3: (1, round(1 / 62, 6))}


def test_rrf_duplicate_source_refused(spark):
    d = spark.createDataFrame([(0, 1)], "doc_id long, rank long")
    with pytest.raises(ValueError, match="duplicate source"):
        reciprocal_rank_fusion([("a", d), ("a", d)])


def test_hybrid_topk_fixture(spark, sf_dir):
    """Over the driver fixtures: valid rank sequence, descending fused
    scores, and the doc both retrievers agree on outranks docs only one
    found at the same reciprocal-rank budget."""
    from harvesting_extract_to_ttl_service_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    rows = hybrid_topk(docs, emb, ["dup", "spark"], qvec, k=5,
                       n_candidates=10).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.n_sources in (1, 2) for r in rows)


# --- persisted index -----------------------------------------------------


def test_index_parity_replay_and_refusal(spark, tmp_path):
    idir = str(tmp_path / "bm25")
    d1 = spark.createDataFrame(DOCS[:3], D_SCHEMA)
    d2 = spark.createDataFrame(DOCS[3:], D_SCHEMA)
    bm25_index_batch(d1, 0, idir, n_buckets=8)
    bm25_index_batch(d2, 1, idir, n_buckets=8)
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "dog"], k=5).collect()]
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat", "dog"], k=5,
                       n_buckets=8).collect()]
    assert got == want
    # replaying a batch rewrites its own directory — results unchanged
    bm25_index_batch(d2, 1, idir, n_buckets=8)
    got2 = [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "dog"], k=5,
                        n_buckets=8).collect()]
    assert got2 == want
    # a different bucket count is a different index — refuse up front
    with pytest.raises(Exception, match="n_buckets"):
        bm25_search(spark, idir, ["cat"], n_buckets=16)


def test_index_search_prunes_at_the_scan(spark, tmp_path):
    """The bucket IN-list must land in the partition directories read
    and the term IN-list in the parquet scan's data filters — the whole
    point of persisting postings."""
    idir = str(tmp_path / "bm25p")
    bm25_index_batch(_docs(spark), 0, idir, n_buckets=8)
    import re

    plan = (bm25_search(spark, idir, ["cat"], k=3, n_buckets=8)
            ._jdf.queryExecution().executedPlan().toString())
    # the term equality must reach the parquet scan as a data filter
    assert re.search(r"DataFilters: \[[^\]]*term#\d+ = cat", plan)
    # and the driver-computed bucket must appear INSIDE a
    # PartitionFilters list (directory pruning) — not merely as a
    # column reference, which any plan touching `bucket` would show
    want_bucket = term_bucket_py("cat", 8)
    assert re.search(
        rf"PartitionFilters: \[[^\]]*bucket#\d+ = {want_bucket}\)",
        plan), plan[:2000]
    # the only nested-loop join is the documented one-row stats scalar
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bucket_py_matches_spark(spark):
    terms_ = ["cat", "dog", "fish", "the", "dup"]
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        term_bucket,
    )

    df = spark.createDataFrame([(t,) for t in terms_], "term string")
    got = {r.term: r.b for r in
           df.select("term", term_bucket(F.col("term"), 8).alias("b"))
           .collect()}
    assert got == {t: term_bucket_py(t, 8) for t in terms_}


def test_run_bm25_index_stream_end_to_end(spark, tmp_path):
    sdir = str(tmp_path / "docs")
    idir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)
    with open(f"{sdir}/b0.json", "w") as f:
        for i, t in DOCS[:3]:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    st = spark.readStream.schema(D_SCHEMA).json(sdir)
    q = run_bm25_index_stream(st, idir, ckpt, n_buckets=8)
    q.awaitTermination(120)
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat"], k=5, n_buckets=8).collect()]
    want = [tuple(r) for r in
            bm25_topk(spark.createDataFrame(DOCS[:3], D_SCHEMA),
                      ["cat"], k=5).collect()]
    assert got == want


def test_compact_bm25_index_parity_and_marker(spark, tmp_path):
    """Generational compaction folds batch dirs into gen=<g> with
    identical search results (postings AND additive stats), is a no-op
    when already compact, keeps working for post-compaction ingest, and
    its in-progress marker refuses INGEST (a mid-fold batch could be
    missed yet fenced) while SEARCH runs undisturbed."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "bm25c")
    bm25_index_batch(spark.createDataFrame(DOCS[:2], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[2:4], D_SCHEMA), 1, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[4:], D_SCHEMA), 2, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()]

    assert compact_bm25_index(spark, idir, n_buckets=8) == 3
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat", "the"], k=6,
                       n_buckets=8).collect()]
    assert got == want
    # all batch dirs folded into gen=0/seg=0; pointer names it
    assert not any(n.startswith("batch=")
                   for n in os.listdir(f"{idir}/postings"))
    ptr = _gen_ptr(spark, idir)
    assert ptr == {"generation": 0, "segments": [0],
                   "max_folded_batch": 2, "applied_dels": -1}
    assert os.path.exists(f"{idir}/gen=0/postings/seg=0")
    # already compact → no-op, pointer unchanged
    assert compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert _gen_ptr(spark, idir) == ptr

    # ingest continues after compaction; the next fold is MINOR: it
    # reads ONLY the new batch (O(new data)), adds segment 1 beside
    # segment 0, and the scores still match the ad-hoc path
    extra = [(10, "another cat appears"), (11, "dogs bark")]
    bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 7, idir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 1
    ptr2 = _gen_ptr(spark, idir)
    assert ptr2 == {"generation": 0, "segments": [0, 1],
                    "max_folded_batch": 7, "applied_dels": -1}
    assert os.path.exists(f"{idir}/gen=0/postings/seg=0")
    assert os.path.exists(f"{idir}/gen=0/postings/seg=1")
    assert not os.path.exists(f"{idir}/postings/batch=7")
    all_docs = spark.createDataFrame(DOCS + extra, D_SCHEMA)
    want2 = [tuple(r) for r in
             bm25_topk(all_docs, ["cat", "the"], k=6).collect()]
    got2 = [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()]
    assert got2 == want2
    # a FULL fold merges every segment into gen=1/seg=0 and retires
    # the old generation; results unchanged
    assert compact_bm25_index(spark, idir, n_buckets=8, full=True) == 0
    assert not os.path.exists(f"{idir}/gen=0")
    assert _gen_ptr(spark, idir) == {
            "generation": 1, "segments": [0],
            "max_folded_batch": 7, "applied_dels": -1}
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want2

    # marker protocol: ingest refuses while compacting, search does
    # NOT; a resume run (nothing to do) clears the marker. A BARE
    # pre-lease marker (no deadline — the mixed-version rollout case)
    # refuses takeover unless steal_legacy says the old job is dead
    marker = f"{idir}/_bm25_compacting.json"
    _write_json_sidecar(spark, marker, {"compacting": True})
    with pytest.raises(Exception, match="compacting"):
        bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 8, idir,
                         n_buckets=8)
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want2
    with pytest.raises(ValueError, match="steal_legacy"):
        compact_bm25_index(spark, idir, n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8,
                              steal_legacy=True) == 0
    assert not os.path.exists(marker)
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want2


def test_compact_bm25_marker_only_resume_is_safe_noop(spark, tmp_path):
    """A compacting marker over an index where nothing was folded yet
    is always recoverable (the generational fold deletes nothing before
    the new tree + manifest + pointer flip are all durable): the resume
    run finds no work, clears the marker, and search parity holds."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "bm25x")
    bm25_index_batch(_docs(spark), 0, idir, n_buckets=8)
    want = [tuple(r) for r in
            bm25_search(spark, idir, ["cat"], k=5, n_buckets=8).collect()]
    _write_json_sidecar(spark, f"{idir}/_bm25_compacting.json",
                        {"compacting": True})
    # crash window 1: bare pre-lease marker, nothing else happened —
    # takeover refuses by default (the pre-upgrade writer may still
    # be running), proceeds under steal_legacy
    with pytest.raises(ValueError, match="steal_legacy"):
        compact_bm25_index(spark, idir, n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8,
                              steal_legacy=True) == 1
    assert not os.path.exists(f"{idir}/_bm25_compacting.json")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat"], k=5,
                        n_buckets=8).collect()] == want


def test_compact_bm25_crash_resume_every_window(spark, tmp_path,
                                                monkeypatch):
    """Crash-inject each window of the generational protocol (mid-fold,
    after-manifest-before-flip, after-flip-before-cleanup) and verify:
    searches DURING the window return the correct pre- or post-flip
    results, nothing is double-counted, and re-running the job resumes
    to full parity with the replay fence intact."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    idir = str(tmp_path / "crash")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()]

    # window A: crash mid-fold (partial gen tree, no manifest) —
    # simulate by a junk partial gen=0 dir under the marker
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _write_json_sidecar,
    )

    os.makedirs(f"{idir}/gen=0/postings", exist_ok=True)
    with open(f"{idir}/gen=0/postings/part-junk.parquet", "w") as fh:
        fh.write("partial")
    _write_json_sidecar(spark, f"{idir}/_bm25_compacting.json",
                        {"compacting": True})
    # search during the window: pointer still names the batch dirs
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    # resume: the bare pre-lease marker refuses without steal_legacy;
    # with it, the partial tree drops and the batch dirs refold
    with pytest.raises(ValueError, match="steal_legacy"):
        lx.compact_bm25_index(spark, idir, n_buckets=8)
    assert lx.compact_bm25_index(spark, idir, n_buckets=8,
                                 steal_legacy=True) == 2
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want

    # window B: crash after the manifest, before the flip — run a real
    # fold with _flip raising; gen=1 is complete but unnamed
    extra = [(20, "cat encore"), (21, "the end")]
    bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 5, idir,
                     n_buckets=8)
    want2 = [tuple(r) for r in
             bm25_topk(spark.createDataFrame(DOCS + extra, D_SCHEMA),
                       ["cat", "the"], k=8).collect()]

    def boom(*a, **kw):
        raise RuntimeError("crash before flip")

    monkeypatch.setattr(lx, "_flip", boom)
    with pytest.raises(RuntimeError, match="crash before flip"):
        # lease_seconds=0: the crashed fold's lease is expired by the
        # time the resume runs (a live lease blocks resume by design)
        lx.compact_bm25_index(spark, idir, n_buckets=8,
                              lease_seconds=0.0)
    monkeypatch.undo()
    # the pause-between-fold-and-flip: the MINOR fold's segment-1
    # manifest exists, the pointer still names seg 0 + batch=5 —
    # search is correct NOW
    assert _read_json_sidecar(
        spark, f"{idir}/gen=0/_manifest_seg=1.json") is not None
    assert _gen_ptr(spark, idir)["segments"] == [0]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=8,
                        n_buckets=8).collect()] == want2
    # resume finishes flip + cleanup WITHOUT refolding, parity holds
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert _gen_ptr(spark, idir) == {
            "generation": 0, "segments": [0, 1],
            "max_folded_batch": 5, "applied_dels": -1}
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=8,
                        n_buckets=8).collect()] == want2
    # replay fence survived the crash-resume
    with pytest.raises(ValueError, match="already folded"):
        bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 5,
                         idir, n_buckets=8)

    # window C: crash after the flip, before cleanup — the superseded
    # trees linger but the pointer excludes them (no double counting)
    more = [(30, "cat again")]
    bm25_index_batch(spark.createDataFrame(more, D_SCHEMA), 9, idir,
                     n_buckets=8)
    want3 = [tuple(r) for r in
             bm25_topk(spark.createDataFrame(DOCS + extra + more,
                                             D_SCHEMA),
                       ["cat", "the"], k=9).collect()]

    # the pre-fold leftover sweep must succeed; only the POST-flip
    # cleanup crashes
    real_cleanup = lx._cleanup
    calls = {"n": 0}

    def no_cleanup(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("crash before cleanup")
        return real_cleanup(*a, **kw)

    monkeypatch.setattr(lx, "_cleanup", no_cleanup)
    with pytest.raises(RuntimeError, match="crash before cleanup"):
        lx.compact_bm25_index(spark, idir, n_buckets=8,
                              lease_seconds=0.0)
    monkeypatch.undo()
    # the stale batch=9 dirs survive, but the flipped pointer reads
    # only the segments (fence 9 excludes them) — scores are correct,
    # not doubled
    assert os.path.exists(f"{idir}/postings/batch=9")
    assert _gen_ptr(spark, idir) == {
            "generation": 0, "segments": [0, 1, 2],
            "max_folded_batch": 9, "applied_dels": -1}
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=9,
                        n_buckets=8).collect()] == want3
    # resume = cleanup only
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert not os.path.exists(f"{idir}/postings/batch=9")
    assert not os.path.exists(f"{idir}/_bm25_compacting.json")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=9,
                        n_buckets=8).collect()] == want3


def test_compact_bm25_retain_old_defers_cleanup(spark, tmp_path):
    """retain_old=True flips the pointer but leaves the superseded
    trees for in-flight readers (the grace-period pattern); the NEXT
    compaction sweeps them."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "retain")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()]
    assert compact_bm25_index(spark, idir, n_buckets=8,
                              retain_old=True) == 2
    # old batch dirs retained on disk, excluded by the pointer
    assert os.path.exists(f"{idir}/postings/batch=0")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    # next compaction sweeps the leftovers (nothing new to fold)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert not os.path.exists(f"{idir}/postings/batch=0")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


def test_ingest_visibility_is_atomic(spark, tmp_path):
    """A crash between the posting write and the stats write (postings
    on disk, stats dir absent — ingest writes postings FIRST) leaves
    the batch INVISIBLE to search: neither postings nor stats, never
    postings whose docs are missing from N/avgdl. Same for a stats dir
    without its _SUCCESS commit marker. Replaying the batch commits
    it."""
    import shutil

    idir = str(tmp_path / "atomic")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    want0 = [tuple(r) for r in
             bm25_search(spark, idir, ["cat", "the"], k=6,
                         n_buckets=8).collect()]
    mirror0 = [tuple(r) for r in
               bm25_topk(spark.createDataFrame(DOCS[:3], D_SCHEMA),
                         ["cat", "the"], k=6).collect()]
    assert want0 == mirror0

    # crash state 1: postings landed, the stats write never ran
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    shutil.rmtree(f"{idir}/stats/batch=1")
    assert os.path.exists(f"{idir}/postings/batch=1")
    # search sees NEITHER side: results equal the 3-doc index
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want0

    # crash state 2: stats dir exists but its _SUCCESS never landed
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    os.remove(f"{idir}/stats/batch=1/_SUCCESS")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want0

    # replay commits the batch atomically
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == [
        tuple(r) for r in
        bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]


# --- phrase search ---------------------------------------------------------


def test_phrase_counts_mirror(spark):
    """Positional intersection vs a hand-computed mirror: adjacency, in
    order, overlaps counted, repeated words handled by shifted joins of
    the same posting row."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_counts,
    )

    docs = spark.createDataFrame(
        [(0, "the cat sat the cat ran"),
         (1, "cat the sat"),
         (2, "a a a b"),
         (3, "the cat"),
         (4, None)],
        D_SCHEMA)
    got = {r.id: r.phrase_tf
           for r in phrase_counts(docs, ["the", "cat"]).collect()}
    assert got == {0: 2, 3: 1}  # doc 1 has the words, not the phrase
    # overlapping occurrences: "a a a" contains "a a" twice
    got2 = {r.id: r.phrase_tf
            for r in phrase_counts(docs, ["a", "a"]).collect()}
    assert got2 == {2: 2}
    # three-word phrase with a repeat
    got3 = {r.id: r.phrase_tf
            for r in phrase_counts(docs, ["a", "a", "b"]).collect()}
    assert got3 == {2: 1}
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_counts(docs, ["  "])


def test_phrase_topk_scores_as_one_bm25_unit(spark):
    """phrase_topk ranks by phrase occurrences with BM25 saturation and
    df = documents containing the phrase; its scores equal a hand
    mirror of the same formula."""
    import math

    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_topk,
    )

    pairs = [(0, "hash join beats loop join"),
             (1, "hash join hash join wins"),
             (2, "hash only here"),
             (3, "join only here"),
             (4, "nothing at all")]
    docs = spark.createDataFrame(pairs, D_SCHEMA)
    rows = phrase_topk(docs, ["hash", "join"], k=10).collect()
    got = {r.doc_id: (r.rank, r.phrase_tf, r.score) for r in rows}
    assert set(got) == {0, 1}
    assert got[1][1] == 2 and got[0][1] == 1
    assert got[1][0] == 1  # two occurrences outrank one

    k1, b = 1.2, 0.75
    n, avgdl, dfp = 5, (5 + 5 + 3 + 3 + 3) / 5, 2
    idf = math.log(1.0 + (n - dfp + 0.5) / (dfp + 0.5))

    def want(tf, dl):
        return round(idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1.0 - b + b * dl / avgdl)), 6)

    assert got[0][2] == want(1, 5)
    assert got[1][2] == want(2, 5)


def test_positional_index_phrase_parity_and_refusals(spark, tmp_path):
    """A positional index answers phrase queries identically to the
    ad-hoc phrase_topk over the ingested docs (multi-batch), still
    serves plain BM25 identically to a flat index, survives compaction,
    and the mode is index identity: flat indexes refuse phrase_search,
    and positional/flat batches cannot mix."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_topk,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
        phrase_search,
    )

    docs = [(0, "hash join beats loop join"),
            (1, "hash join hash join wins"),
            (2, "hash only here"),
            (3, "the cat sat"),
            (4, None)]
    pdir = str(tmp_path / "pos")
    bm25_index_batch(spark.createDataFrame(docs[:2], D_SCHEMA), 0, pdir,
                     n_buckets=8, positional=True)
    bm25_index_batch(spark.createDataFrame(docs[2:], D_SCHEMA), 1, pdir,
                     n_buckets=8, positional=True)
    all_docs = spark.createDataFrame(docs, D_SCHEMA)
    want = [tuple(r) for r in
            phrase_topk(all_docs, ["hash", "join"], k=5).collect()]
    got = [tuple(r) for r in
           phrase_search(spark, pdir, ["hash", "join"], k=5,
                         n_buckets=8).collect()]
    assert got == want and len(want) == 2

    # plain BM25 over the positional index == over a flat index
    fdir = str(tmp_path / "flat")
    bm25_index_batch(all_docs, 0, fdir, n_buckets=8)
    bm_pos = [tuple(r) for r in
              bm25_search(spark, pdir, ["hash", "cat"], k=5,
                          n_buckets=8).collect()]
    bm_flat = [tuple(r) for r in
               bm25_search(spark, fdir, ["hash", "cat"], k=5,
                           n_buckets=8).collect()]
    assert bm_pos == bm_flat

    # compaction preserves positions → phrase results unchanged
    assert compact_bm25_index(spark, pdir, n_buckets=8) == 2
    got2 = [tuple(r) for r in
            phrase_search(spark, pdir, ["hash", "join"], k=5,
                          n_buckets=8).collect()]
    assert got2 == want

    # a flat index refuses phrase queries instead of degrading to AND
    with pytest.raises(ValueError, match="not positional"):
        phrase_search(spark, fdir, ["hash", "join"], n_buckets=8)
    # and the mode can't silently mix within one index
    with pytest.raises(Exception, match="positional"):
        bm25_index_batch(spark.createDataFrame(docs[:1], D_SCHEMA), 9,
                         pdir, n_buckets=8, positional=False)
    with pytest.raises(Exception, match="positional"):
        bm25_index_batch(spark.createDataFrame(docs[:1], D_SCHEMA), 9,
                         fdir, n_buckets=8, positional=True)


def test_compaction_replay_fence(spark, tmp_path):
    """A batch id at or below max_folded_batch refuses to ingest after
    compaction (its rows already live in batch=-1 — rewriting would
    double tf/df); fresh batch ids keep working, and the fence
    survives a second compaction."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "fence")
    bm25_index_batch(spark.createDataFrame(DOCS[:2], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[2:4], D_SCHEMA), 3, idir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    # replaying a folded batch (or any id at/below the fence) refuses
    for bad in (0, 3, 2):
        with pytest.raises(ValueError, match="already folded"):
            bm25_index_batch(spark.createDataFrame(DOCS[:1], D_SCHEMA),
                             bad, idir, n_buckets=8)
    # a fresh id works, replays idempotently pre-fold, and the fence
    # advances with the next compaction
    d5 = spark.createDataFrame(DOCS[4:], D_SCHEMA)
    bm25_index_batch(d5, 5, idir, n_buckets=8)
    bm25_index_batch(d5, 5, idir, n_buckets=8)  # pre-fold replay OK
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    assert compact_bm25_index(spark, idir, n_buckets=8) == 1
    with pytest.raises(ValueError, match="already folded"):
        bm25_index_batch(d5, 5, idir, n_buckets=8)
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


# --- BM25F field weighting -------------------------------------------------


FDOCS = [(0, "spark engine", "the cat sat on the mat"),
         (1, "cat manual", "the dog sat"),
         (2, "dog tales", "cat cat cat dog"),
         (3, None, None),
         (4, "", "fish swim and CAT naps"),
         (5, "fish", "")]
F_SCHEMA = "doc_id long, title string, body string"
F_WEIGHTS = {"title": 2.0, "body": 1.0}


def _mirror_bm25f(query_terms, weights=None, docs=None, k1=1.2, b=0.75):
    """Sequential simple-BM25F mirror: weighted tf/dl, one row per
    (doc, term) for df no matter how many fields matched, term-sorted
    fold, round-6."""
    weights = weights or F_WEIGHTS
    rows = docs or FDOCS
    tok = {r[0]: {f: ((r[j + 1] or "").lower().split())
                  for j, f in enumerate(["title", "body"])}
           for r in rows}
    wdl = {i: sum(w * len(tok[i][f]) for f, w in weights.items())
           for i in tok}
    n = len(tok)
    avgdl = sum(wdl.values()) / n
    qt = sorted({t.lower() for t in query_terms if t and t.strip()})
    dfq = {t: sum(1 for i in tok
                  if any(t in v for v in tok[i].values())) for t in qt}
    out = {}
    for i in tok:
        s, hits = 0.0, 0
        for t in qt:
            tf = sum(w * tok[i][f].count(t) for f, w in weights.items())
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * wdl[i] / avgdl))
        if hits:
            out[i] = (hits, round(s, 6))
    return out


def test_bm25f_matches_python_mirror(spark):
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )

    fdf = spark.createDataFrame(FDOCS, F_SCHEMA)
    got = {r.doc_id: (r.n_terms_hit, r.score)
           for r in bm25f_topk(fdf, ["cat", "dog", "absent"], F_WEIGHTS,
                               k=10).collect()}
    assert got == _mirror_bm25f(["cat", "dog", "absent"])
    # doc 2 hits 'dog' in BOTH fields yet counts once per TERM (df and
    # n_terms_hit are per (doc, term), not per field)
    assert got[1][0] == 2 and got[2][0] == 2
    assert 3 not in got and 4 in got  # all-NULL doc never ranks


def test_bm25f_field_weight_changes_ranking(spark):
    """With title weighted 2×, a title hit outranks a single body hit
    of the same term; with flat weights the longer-field normalization
    decides instead — the weighting is observable, not cosmetic."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )

    rows = [(0, "cat", "filler words here"),
            (1, "filler", "cat words here")]
    fdf = spark.createDataFrame(rows, F_SCHEMA)
    up = {r.doc_id: r.score
          for r in bm25f_topk(fdf, ["cat"], {"title": 5.0, "body": 1.0},
                              k=10).collect()}
    assert up[0] > up[1]
    flat = {r.doc_id: r.score
            for r in bm25f_topk(fdf, ["cat"], {"title": 1.0, "body": 1.0},
                                k=10).collect()}
    assert flat[0] == flat[1]  # same weighted tf, dl → same score


def test_bm25f_degenerates_to_bm25_on_one_field(spark):
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )

    got = [(r.doc_id, r.rank, r.n_terms_hit, r.score) for r in
           bm25f_topk(_docs(spark), ["cat", "dog"], {"text": 1.0},
                      k=10).collect()]
    want = [(r.doc_id, r.rank, r.n_terms_hit, r.score) for r in
            bm25_topk(_docs(spark), ["cat", "dog"], k=10).collect()]
    assert got == want


def test_bm25f_refuses_bad_weights(spark):
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )

    fdf = spark.createDataFrame(FDOCS, F_SCHEMA)
    with pytest.raises(ValueError, match="at least one"):
        bm25f_topk(fdf, ["cat"], {})
    with pytest.raises(ValueError, match="must be > 0"):
        bm25f_topk(fdf, ["cat"], {"title": 0.0})


def test_bm25f_persisted_index_parity_and_identity(spark, tmp_path):
    """A field-weighted persisted index scores identically to the
    ad-hoc bm25f_topk across batches and through compaction; the field
    convention is index identity (weighted and flat batches refuse to
    mix, as do two different weightings), and positional BM25F is
    refused."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    fdf = spark.createDataFrame(FDOCS, F_SCHEMA)
    idir = str(tmp_path / "bm25f")
    bm25_index_batch(spark.createDataFrame(FDOCS[:3], F_SCHEMA), 0, idir,
                     n_buckets=8, field_weights=F_WEIGHTS)
    bm25_index_batch(spark.createDataFrame(FDOCS[3:], F_SCHEMA), 1, idir,
                     n_buckets=8, field_weights=F_WEIGHTS)
    want = [tuple(r) for r in
            bm25f_topk(fdf, ["cat", "dog"], F_WEIGHTS, k=6).collect()]
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat", "dog"], k=6,
                       n_buckets=8).collect()]
    assert got == want
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "dog"], k=6,
                        n_buckets=8).collect()] == want

    # identity refusals: flat batch into a weighted index, a different
    # weighting, and positional+fields
    with pytest.raises(Exception, match="fields"):
        bm25_index_batch(_docs(spark), 5, idir, n_buckets=8)
    with pytest.raises(Exception, match="fields"):
        bm25_index_batch(spark.createDataFrame(FDOCS[:1], F_SCHEMA), 5,
                         idir, n_buckets=8,
                         field_weights={"title": 3.0, "body": 1.0})
    with pytest.raises(ValueError, match="positional"):
        bm25_index_batch(spark.createDataFrame(FDOCS[:1], F_SCHEMA), 5,
                         idir, n_buckets=8, field_weights=F_WEIGHTS,
                         positional=True)


# --- rarest-first phrase chain ---------------------------------------------


def test_phrase_rarest_first_order_and_parity(spark):
    """The chain order is ascending df with phrase offset as tiebreak;
    both orders produce the same matches and counts (the intersection
    is a set under relative shifts), including with repeated words and
    an absent word (df 0 sorts first → cheapest empty result)."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        _phrase_chain_order,
        clean_phrase,
        phrase_counts,
        positional_postings,
    )

    rows = ([(i, "the common word everywhere") for i in range(20)]
            + [(100, "the rare gem the common sight"),
               (101, "rare gem the common word"),
               (102, "a a b a a b")])
    docs = spark.createDataFrame(rows, D_SCHEMA)
    pp = positional_postings(docs)

    words = clean_phrase(["the", "common", "gem"])
    flt = pp.filter(F.col("term").isin(sorted(set(words))))
    order = _phrase_chain_order(flt, words, rarest_first=True)
    assert order[0] == (2, "gem")  # df 2 ≪ df 22/21
    assert _phrase_chain_order(flt, words, rarest_first=False) == [
        (0, "the"), (1, "common"), (2, "gem")]

    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_intersect,
    )

    for phrase in (["the", "common"], ["the", "rare", "gem"],
                   ["a", "a", "b"], ["gem", "zzz_absent"]):
        fast = {r.id: r.phrase_tf
                for r in phrase_counts(docs, phrase).collect()}
        slow = {r.id: r.phrase_tf
                for r in phrase_intersect(positional_postings(docs),
                                          clean_phrase(phrase),
                                          rarest_first=False)
                .select("id", "phrase_tf").collect()}
        assert fast == slow, phrase
    # the absent-word phrase matches nothing, cheaply
    assert phrase_counts(docs, ["gem", "zzz_absent"]).count() == 0


def test_hybrid_search_stored_matches_adhoc(spark, tmp_path):
    """hybrid_search over PERSISTED BM25 + IVF indexes equals the
    ad-hoc hybrid_topk row for row when the vector side probes every
    cell (exact) — the at-scale deployment shape is a drop-in."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        hybrid_search,
    )

    dim = 8
    texts = ["the cat sat", "dog runs fast", "cat and dog", "fish swim",
             "the mat is flat", "cat naps here", "spark joins tables",
             "hash join wins"]
    rows = [(i, texts[i % len(texts)] + f" tag{i}",
             [1.0 if d == i % dim else 0.1 * ((i * 7 + d) % 5)
              for d in range(dim)])
            for i in range(32)]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], D_SCHEMA)
    vecs = spark.createDataFrame([(i, v) for i, _, v in rows],
                                 "vec_id long, embedding array<double>")
    qvec = [1.0] + [0.05] * (dim - 1)
    qterms = ["cat", "join"]

    want = [tuple(r) for r in
            hybrid_topk(docs, vecs, qterms, qvec, k=6,
                        n_candidates=10).collect()]

    cents = train_ivf_centroids(vecs, k=4, dim=dim)
    bdir, vdir = str(tmp_path / "lex"), str(tmp_path / "ivf")
    bm25_index_batch(docs.filter("doc_id < 16"), 0, bdir, n_buckets=8)
    bm25_index_batch(docs.filter("doc_id >= 16"), 1, bdir, n_buckets=8)
    ivf_index_batch(vecs.filter("vec_id < 16"), 0, vdir, cents)
    ivf_index_batch(vecs.filter("vec_id >= 16"), 1, vdir, cents)

    got = [tuple(r) for r in
           hybrid_search(spark, bdir, vdir, qterms, qvec, cents, k=6,
                         n_candidates=10, n_probe=len(cents),
                         n_buckets=8).collect()]
    assert got == want and len(got) == 6


def test_legacy_batch_minus1_index_reads_and_migrates(spark, tmp_path):
    """A pre-generation index (consolidated ``batch=-1`` dir + the old
    ``_bm25_compaction.json`` fence, no pointer file) still searches
    correctly — batch=-1 visible, folded ids fenced — and the first
    generational compaction absorbs it into gen=0 and retires the
    legacy layout."""
    import shutil

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "legacy")
    # build the legacy on-disk state: batches 0/1 folded into batch=-1
    # (simulated by renaming a real batch dir), fence=1, plus a live
    # unfolded batch 2
    bm25_index_batch(spark.createDataFrame(DOCS[:4], D_SCHEMA), 0, idir,
                     n_buckets=8)
    for side in ("postings", "stats"):
        shutil.move(f"{idir}/{side}/batch=0", f"{idir}/{side}/batch=-1")
    _write_json_sidecar(spark, f"{idir}/_bm25_compaction.json",
                        {"max_folded_batch": 1})
    bm25_index_batch(spark.createDataFrame(DOCS[4:], D_SCHEMA), 2, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    # the legacy fence refuses folded replays before any migration
    with pytest.raises(ValueError, match="already folded"):
        bm25_index_batch(spark.createDataFrame(DOCS[:1], D_SCHEMA), 1,
                         idir, n_buckets=8)
    # first generational compaction absorbs batch=-1 + batch 2
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    assert _gen_ptr(spark, idir) == {
            "generation": 0, "segments": [0],
            "max_folded_batch": 2, "applied_dels": -1}
    assert not os.path.exists(f"{idir}/postings/batch=-1")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


def test_query_tf_saturation(spark):
    """query_tf=k3 weights each term's contribution by Robertson's
    (k3+1)·qtf/(k3+qtf): k3=0 is exactly the default distinct-term
    scoring; k3=8 matches a hand mirror on a repeated-term query; the
    shuffle path agrees with the broadcast path."""
    docs = _docs(spark)
    qdf = spark.createDataFrame([(0, "cat cat dog")],
                                "query_id long, text string")
    base = sorted(map(tuple, bm25_topk_join(qdf, docs, k=10).collect()))
    zero = sorted(map(tuple, bm25_topk_join(qdf, docs, k=10,
                                            query_tf=0.0).collect()))
    assert zero == base

    k1, b, k3 = 1.2, 0.75, 8.0
    got = {r.doc_id: (r.n_terms_hit, r.score)
           for r in bm25_topk_join(qdf, docs, k=10,
                                   query_tf=k3).collect()}
    # mirror: per-term BM25 contribution × the query-side saturation
    tok = {i: (t or "").lower().split() for i, t in DOCS}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    qtf = {"cat": 2, "dog": 1}
    want = {}
    for d, words in tok.items():
        s, hits = 0.0, 0
        for t in sorted(qtf):  # term-sorted fold order
            tf = words.count(t)
            if tf == 0:
                continue
            hits += 1
            dfq = sum(1 for v in tok.values() if t in v)
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            c = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(words) / avgdl))
            s = s + c * (qtf[t] * (k3 + 1.0)) / (qtf[t] + k3)
        if hits:
            want[d] = (hits, round(s, 6))
    assert got == want
    # the doubled query term strictly outweighs the default scoring
    # wherever 'cat' matches
    base_scores = {r[1]: r[4] for r in base}
    assert all(got[d][1] > base_scores[d] for d in got
               if "cat" in tok[d])

    shuf = {(r.doc_id, r.n_terms_hit, r.score)
            for r in bm25_topk_join(qdf, docs, k=10, query_tf=k3,
                                    broadcast_queries=False).collect()}
    assert shuf == {(d, want[d][0], want[d][1]) for d in want}
    with pytest.raises(ValueError, match="query_tf"):
        bm25_topk_join(qdf, docs, query_tf=-1.0)


def test_hybrid_search_plans_keep_both_prunings(spark, tmp_path):
    """Through the RRF fusion, the lexical side still shows bucket
    partition pruning + the term data filter, and the vector side
    still shows ivf_cell partition pruning — neither index pruning is
    lost to the union."""
    import re

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        hybrid_search,
    )

    dim = 8
    rows = [(i, "cat dog " + f"t{i}",
             [1.0 if d == i % dim else 0.1 * ((i * 7 + d) % 5)
              for d in range(dim)]) for i in range(24)]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], D_SCHEMA)
    vecs = spark.createDataFrame([(i, v) for i, _, v in rows],
                                 "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(vecs, k=4, dim=dim)
    bdir, vdir = str(tmp_path / "lexp"), str(tmp_path / "ivfp")
    bm25_index_batch(docs, 0, bdir, n_buckets=8)
    ivf_index_batch(vecs, 0, vdir, cents)

    plan = hybrid_search(spark, bdir, vdir, ["cat"],
                         [1.0] + [0.05] * (dim - 1), cents, k=5,
                         n_candidates=8, n_probe=2, n_buckets=8) \
        ._jdf.queryExecution().executedPlan().toString()
    want_bucket = term_bucket_py("cat", 8)
    assert re.search(
        rf"PartitionFilters: \[[^\]]*bucket#\d+ = {want_bucket}\)", plan)
    assert re.search(r"DataFilters: \[[^\]]*term#\d+ = cat", plan)
    assert re.search(r"PartitionFilters: \[[^\]]*ivf_cell#\d+ IN", plan)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ingest_flows_during_compaction(spark, tmp_path, monkeypatch):
    """Once the fold publishes its folding_through snapshot, FRESH
    batch ids ingest normally mid-fold, are searchable immediately
    (pre-flip view), survive the pointer flip (the new fence is the
    snapshot), and fold next time; a replay of an in-fold id still
    refuses (it would race the fold's scan of that directory)."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    idir = str(tmp_path / "inflow")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)

    def boom(*a, **kw):
        raise RuntimeError("crash before flip")

    monkeypatch.setattr(lx, "_flip", boom)
    with pytest.raises(RuntimeError, match="crash before flip"):
        # lease_seconds=0: the crashed fold's lease is expired by the
        # time the resume runs (a live lease blocks resume by design)
        lx.compact_bm25_index(spark, idir, n_buckets=8,
                              lease_seconds=0.0)
    monkeypatch.undo()
    # the paused fold published its snapshot (the marker also carries
    # the compactor lease: owner token + expiring deadline)
    marker = _read_json_sidecar(spark, f"{idir}/_bm25_compacting.json")
    assert marker["compacting"] is True
    assert marker["folding_through"] == 1
    assert marker["owner"] and marker["deadline"] > 0

    # a replay of an in-fold id refuses; a FRESH id lands and is
    # immediately searchable in the pre-flip view
    with pytest.raises(ValueError, match="compacting through"):
        bm25_index_batch(spark.createDataFrame(DOCS[:1], D_SCHEMA), 1,
                         idir, n_buckets=8)
    fresh = [(40, "cat cameo"), (41, "the finale")]
    bm25_index_batch(spark.createDataFrame(fresh, D_SCHEMA), 7, idir,
                     n_buckets=8)
    all_docs = spark.createDataFrame(DOCS + fresh, D_SCHEMA)
    want = [tuple(r) for r in
            bm25_topk(all_docs, ["cat", "the"], k=9).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=9,
                        n_buckets=8).collect()] == want

    # resume finishes the fold; the mid-fold batch survives the flip
    # (fence = snapshot 1 < 7) and folds on the NEXT compaction
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert _gen_ptr(spark, idir) == {
            "generation": 0, "segments": [0],
            "max_folded_batch": 1, "applied_dels": -1}
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=9,
                        n_buckets=8).collect()] == want
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 1
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=9,
                        n_buckets=8).collect()] == want


# --- proximity (NEAR) ------------------------------------------------------


def test_proximity_counts_mirror(spark):
    """NEAR semantics vs a hand mirror: tf = anchor occurrences with
    every other term within ±window; order and adjacency don't matter;
    the other-terms chain order cannot change the result (pure
    conjunctive filters over the anchor's positions)."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        clean_prox_terms,
        positional_postings,
        proximity_counts,
        proximity_intersect,
    )

    docs = spark.createDataFrame(
        [(0, "error at midnight then a timeout"),          # dist 5
         (1, "timeout before the error"),                  # dist 3, order flipped
         (2, "error alone here"),
         (3, "timeout alone here"),
         (4, "error error near timeout"),                  # two anchors, dists 3,1
         (5, "error x x x x x x x x timeout"),             # dist 9 — outside
         (6, None)],
        D_SCHEMA)
    got = {r.id: r.prox_tf
           for r in proximity_counts(docs, ["error", "timeout"],
                                     5).collect()}
    assert got == {0: 1, 1: 1, 4: 2}
    # three-term NEAR: all must be inside the window of the SAME anchor
    docs3 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta x x x x x x gamma")],
        D_SCHEMA)
    got3 = {r.id: r.prox_tf
            for r in proximity_counts(docs3,
                                      ["alpha", "beta", "gamma"],
                                      3).collect()}
    assert got3 == {0: 1}
    # chain order independence: rarest_first off ≡ on
    words = clean_prox_terms(["error", "timeout"])
    pp = positional_postings(docs)
    a = {r.id: r.prox_tf for r in
         proximity_intersect(pp, words, 5, rarest_first=False).collect()}
    assert a == got
    with pytest.raises(ValueError, match="empty term"):
        proximity_counts(docs, ["  "], 5)
    with pytest.raises(ValueError, match="window"):
        proximity_counts(docs, ["error", "timeout"], 0)


def test_proximity_topk_scores_and_stored_parity(spark, tmp_path):
    """proximity_topk scores the NEAR group as one BM25 unit (same
    formula as the phrase member, hand-checked), and the positional
    index answers identically across batches; a flat index refuses."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        proximity_topk,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        proximity_search,
    )

    rows = [(0, "error at midnight then a timeout"),
            (1, "timeout before the error"),
            (2, "error alone here"),
            (3, "error error near timeout"),
            (4, "nothing at all")]
    docs = spark.createDataFrame(rows, D_SCHEMA)
    got = {r.doc_id: (r.rank, r.prox_tf, r.score)
           for r in proximity_topk(docs, ["error", "timeout"], 5,
                                   k=10).collect()}
    assert set(got) == {0, 1, 3}
    assert got[3][1] == 2  # both anchor occurrences qualify

    k1, b = 1.2, 0.75
    n, avgdl, dfp = 5, (6 + 4 + 3 + 4 + 3) / 5, 3
    idf = math.log(1.0 + (n - dfp + 0.5) / (dfp + 0.5))

    def want(tf, dl):
        return round(idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1.0 - b + b * dl / avgdl)), 6)

    assert got[0][2] == want(1, 6)
    assert got[3][2] == want(2, 4)

    pdir = str(tmp_path / "proxidx")
    bm25_index_batch(spark.createDataFrame(rows[:2], D_SCHEMA), 0, pdir,
                     n_buckets=8, positional=True)
    bm25_index_batch(spark.createDataFrame(rows[2:], D_SCHEMA), 1, pdir,
                     n_buckets=8, positional=True)
    stored = {r.doc_id: (r.rank, r.prox_tf, r.score)
              for r in proximity_search(spark, pdir,
                                        ["error", "timeout"], 5, k=10,
                                        n_buckets=8).collect()}
    assert stored == got

    fdir = str(tmp_path / "proxflat")
    bm25_index_batch(docs, 0, fdir, n_buckets=8)
    with pytest.raises(ValueError, match="not positional"):
        proximity_search(spark, fdir, ["error", "timeout"], 5,
                         n_buckets=8)


def test_bm25_index_stats_lifecycle(spark, tmp_path, monkeypatch):
    """The monitoring snapshot tracks the index through its lifecycle:
    unfolded batches accumulate (compaction pressure), a fold empties
    them and advances the pointer, a paused fold reports compacting +
    its snapshot, and the corpus totals stay exact throughout."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    idir = str(tmp_path / "statsidx")
    with pytest.raises(ValueError, match="no index"):
        lx.bm25_index_stats(spark, idir)
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    s = lx.bm25_index_stats(spark, idir)
    assert (s["generation"], s["max_folded_batch"]) == (-1, -1)
    assert s["unfolded_batches"] == [0, 1] and not s["compacting"]
    assert (s["n_docs"], s["sum_dl"], s["avgdl"]) == (6, 18, 3.0)
    assert s["n_buckets"] == 8 and not s["positional"]

    def boom(*a, **kw):
        raise RuntimeError("pause")

    monkeypatch.setattr(lx, "_flip", boom)
    with pytest.raises(RuntimeError):
        lx.compact_bm25_index(spark, idir, n_buckets=8,
                              lease_seconds=0.0)
    monkeypatch.undo()
    s2 = lx.bm25_index_stats(spark, idir)
    assert s2["compacting"] and s2["folding_through"] == 1
    assert (s2["n_docs"], s2["sum_dl"]) == (6, 18)  # pre-flip view

    lx.compact_bm25_index(spark, idir, n_buckets=8)
    s3 = lx.bm25_index_stats(spark, idir)
    assert (s3["generation"], s3["max_folded_batch"]) == (0, 1)
    assert s3["unfolded_batches"] == [] and not s3["compacting"]
    assert (s3["n_docs"], s3["sum_dl"], s3["avgdl"]) == (6, 18, 3.0)


def test_compaction_refuses_to_fence_stranded_half_commits(spark,
                                                           tmp_path):
    """A batch whose ingest crashed between the posting write and the
    stats commit is invisible — but a fold whose range covers its id
    must REFUSE rather than fence it unfolded (the flip would turn an
    uncommitted batch into a permanently lost one with a lying
    'already folded' refusal). Replaying the batch clears the refusal;
    so does deleting its postings dir."""
    import shutil

    idir = str(tmp_path / "strand")
    bm25_index_batch(spark.createDataFrame(DOCS[:2], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[2:4], D_SCHEMA), 1, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[4:], D_SCHEMA), 2, idir,
                     n_buckets=8)
    # strand batch 1: postings on disk, stats commit gone
    shutil.rmtree(f"{idir}/stats/batch=1")

    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    with pytest.raises(ValueError, match=r"\[1\].*no committed stats"):
        lx.compact_bm25_index(spark, idir, n_buckets=8)
    # the refusal left no marker behind — ingest still works
    assert not os.path.exists(f"{idir}/_bm25_compacting.json")
    # replaying the stranded batch commits it; the fold then proceeds
    bm25_index_batch(spark.createDataFrame(DOCS[2:4], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 3
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


def test_bm25_search_batch_matches_adhoc_join(spark, tmp_path):
    """Batched search over the persisted index equals bm25_topk_join
    over the ingested batches row for row — including max_df pruning
    and query_tf saturation — and the union of query terms still
    prunes at the scan."""
    import re

    docs = _docs(spark)
    idir = str(tmp_path / "bsb")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_search_batch,
        compact_bm25_index,
    )

    qdf = spark.createDataFrame(
        [(0, "cat dog"), (1, "fish the"), (2, "absent only"),
         (3, "cat cat the")],
        "query_id long, text string")
    for kwargs in ({}, {"max_df_ratio": 0.4},
                   {"query_tf": 8.0},
                   {"broadcast_queries": False},
                   {"query_tf": 8.0, "max_df_ratio": 0.4}):
        want = sorted(map(tuple,
                          bm25_topk_join(qdf, docs, k=4,
                                         **kwargs).collect()))
        got = sorted(map(tuple,
                         bm25_search_batch(spark, qdf, idir, k=4,
                                           n_buckets=8,
                                           **kwargs).collect()))
        assert got == want, kwargs

    # parity survives compaction, and the scan still prunes
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    got2 = sorted(map(tuple,
                      bm25_search_batch(spark, qdf, idir, k=4,
                                        n_buckets=8).collect()))
    assert got2 == sorted(map(tuple,
                              bm25_topk_join(qdf, docs, k=4).collect()))
    plan = bm25_search_batch(spark, qdf, idir, k=4, n_buckets=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket#\d+ I[Nn]", plan)
    assert re.search(r"DataFilters: \[[^\]]*term#\d+ IN", plan)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bm25_search_batch_over_bm25f_index(spark, tmp_path):
    """The batched stored path composes with BM25F: a single-query
    batch over a field-weighted index equals the per-query
    bm25_search (same weighted postings, same df-from-probed-terms
    convention), so the cross-feature matrix has no silent hole."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_search_batch,
    )

    idir = str(tmp_path / "bsbf")
    bm25_index_batch(spark.createDataFrame(FDOCS, F_SCHEMA), 0, idir,
                     n_buckets=8, field_weights=F_WEIGHTS)
    single = {(r.doc_id, r.n_terms_hit, r.score)
              for r in bm25_search(spark, idir, ["cat", "dog"], k=6,
                                   n_buckets=8).collect()}
    qdf = spark.createDataFrame([(0, "cat dog")],
                                "query_id long, text string")
    batched = {(r.doc_id, r.n_terms_hit, r.score)
               for r in bm25_search_batch(spark, qdf, idir, k=6,
                                          n_buckets=8).collect()}
    assert batched == single and len(single) > 0


def test_snippets_windows_and_edges(spark):
    """Snippet windows clamp at both document edges, count every hit,
    cap emission at max_snippets (earliest first), lowercase like the
    tokenizer that matched, and skip NULL/empty/non-matching docs."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        snippets,
    )

    docs = spark.createDataFrame(
        [(0, "the CAT sat on the mat while a cat napped by the cat"),
         (1, "cat"),
         (2, "no hits here"),
         (3, None),
         (4, "")],
        D_SCHEMA)
    got = {r.doc_id: (r.n_matches, r.snips)
           for r in snippets(docs, ["CaT"], width=2,
                             max_snippets=2).collect()}
    # doc 0: hits at offsets 1, 9, 12 — 3 matches, first 2 emitted;
    # the first window clamps at the left edge
    assert got[0] == (3, ["the cat sat on",
                          "while a cat napped by"])
    # doc 1: single-token doc, window clamps to itself
    assert got[1] == (1, ["cat"])
    assert set(got) == {0, 1}

    # width 0 = the bare matched tokens; max_snippets caps emission
    bare = {r.doc_id: r.snips
            for r in snippets(docs, ["cat"], width=0,
                              max_snippets=3).collect()}
    assert bare[0] == ["cat", "cat", "cat"]
    with pytest.raises(ValueError, match="width"):
        snippets(docs, ["cat"], width=-1)
    with pytest.raises(ValueError, match="max_snippets"):
        snippets(docs, ["cat"], max_snippets=0)


# --- round-14 ingest-protocol hardening -------------------------------------


def test_replay_drops_visibility_before_rewriting_postings(
        spark, tmp_path, monkeypatch):
    """A REPLAY of an already-committed batch must drop the batch's
    visibility (delete its stats dir) BEFORE overwriting the posting
    tree — otherwise a search concurrent with the replay can resolve
    the batch as visible while its postings are half-rewritten. Crash
    the replay between the two writes and verify the on-disk state is
    the designed-invisible one (postings present, stats gone), search
    falls back to the other batches, compaction names the batch
    stranded, and a full replay re-commits it."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    idir = str(tmp_path / "replayvis")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    extra = [(20, "cat coda"), (21, "the epilogue")]
    bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 2, idir,
                     n_buckets=8)
    want_full = [tuple(r) for r in
                 bm25_search(spark, idir, ["cat", "the"], k=8,
                             n_buckets=8).collect()]
    want_no_b1 = [tuple(r) for r in
                  bm25_topk(spark.createDataFrame(DOCS[:3] + extra,
                                                  D_SCHEMA),
                            ["cat", "the"], k=8).collect()]

    def boom(*a, **kw):
        raise RuntimeError("crash between postings and stats")

    monkeypatch.setattr(lx, "_commit_stats", boom)
    with pytest.raises(RuntimeError, match="between postings"):
        bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1,
                         idir, n_buckets=8)
    monkeypatch.undo()
    # the crash window left batch 1 INVISIBLE — stats dropped before
    # the posting rewrite began, never visible-but-half-rewritten
    assert not os.path.exists(f"{idir}/stats/batch=1")
    assert os.path.exists(f"{idir}/postings/batch=1")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=8,
                        n_buckets=8).collect()] == want_no_b1
    # the stranded guard refuses to fold past it (committed batch 2
    # puts id 1 inside the fold range), naming the batch
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    with pytest.raises(ValueError, match=r"\[1\].*no committed stats"):
        compact_bm25_index(spark, idir, n_buckets=8)
    # a completed replay re-commits the batch
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=8,
                        n_buckets=8).collect()] == want_full


def test_ingest_refuses_committer_without_success_marker(
        spark, tmp_path, monkeypatch):
    """Readers gate batch visibility on the stats dir's _SUCCESS, so an
    environment whose committer is configured not to write one
    (mapreduce.fileoutputcommitter.marksuccessfuljobs=false) would make
    every committed batch silently invisible — ingest must verify the
    marker landed and fail LOUDLY naming the setting."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    idir = str(tmp_path / "nosuccess")
    real = lx._commit_stats

    def no_marker(stats, path):
        real(stats, path)
        os.remove(f"{path}/_SUCCESS")

    monkeypatch.setattr(lx, "_commit_stats", no_marker)
    with pytest.raises(ValueError, match="marksuccessfuljobs"):
        bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0,
                         idir, n_buckets=8)


def test_legacy_precompaction_state_fails_with_recovery_steps(
        spark, tmp_path):
    """An index left mid-compaction by the PRE-GENERATION compactor
    (params sidecar flagged compacting=true, _compact_tmp_* staging
    trees) must fail every entry point with a TARGETED error naming
    the manual recovery steps — not a generic parameter diff — and
    work again once the flag is cleared."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
        _write_json_sidecar,
    )

    idir = str(tmp_path / "legacyflag")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    params = _read_json_sidecar(spark, f"{idir}/_bm25_params.json")
    _write_json_sidecar(spark, f"{idir}/_bm25_params.json",
                        {**params, "compacting": True})
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    for op in (lambda: bm25_search(spark, idir, ["cat"], n_buckets=8),
               lambda: bm25_index_batch(
                   spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                   n_buckets=8),
               lambda: compact_bm25_index(spark, idir, n_buckets=8)):
        with pytest.raises(ValueError, match="_compact_tmp_"):
            op()
    # clearing the flag restores the index
    _write_json_sidecar(spark, f"{idir}/_bm25_params.json", params)
    assert bm25_search(spark, idir, ["cat"], k=3,
                       n_buckets=8).count() > 0


# --- single-compactor lease --------------------------------------------------


def test_compactor_lease_excludes_second_compactor(spark, tmp_path,
                                                   monkeypatch):
    """Exactly one of two interleaved compactors proceeds: while A's
    lease is live, B refuses loudly; after A's lease EXPIRES, B takes
    over; and if A somehow resumes after losing the lease, its
    pre-flip ownership check aborts WITHOUT committing."""
    import time

    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (
        _read_json_sidecar,
        _write_json_sidecar,
    )

    idir = str(tmp_path / "lease")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    marker = f"{idir}/_bm25_compacting.json"

    # compactor A "running": live lease
    _write_json_sidecar(spark, marker,
                        {"compacting": True, "owner": "compactor-a",
                         "deadline": time.time() + 3600})
    with pytest.raises(ValueError, match="held by owner compactor-a"):
        lx.compact_bm25_index(spark, idir, n_buckets=8)
    # A's marker untouched by the refusal (folding_through preserved)
    assert _read_json_sidecar(spark, marker)["owner"] == "compactor-a"

    # A's lease expires → B takes over and completes the fold
    _write_json_sidecar(spark, marker,
                        {"compacting": True, "owner": "compactor-a",
                         "deadline": time.time() - 1})
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 1
    assert not os.path.exists(marker)
    want = [tuple(r) for r in
            bm25_topk(spark.createDataFrame(DOCS[:3], D_SCHEMA),
                      ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want

    # a fold that LOSES its lease mid-run aborts before the flip
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 4, idir,
                     n_buckets=8)
    real_check = lx.check_lease if hasattr(lx, "check_lease") else None
    from harvesting_extract_to_ttl_service_spark.streaming import (
        generations,
    )

    real = generations.check_lease
    calls = {"n": 0}

    def steal_then_check(spark_, marker_path, owner):
        # call 1 is refresh_lease's check (publishing the snapshot);
        # call 2 is promote_staged's pre-rename check; call 3 guards
        # the manifest write; call 4 is the pre-FLIP ownership check —
        # steal right before it, simulating a takeover between the
        # manifest write and the flip
        calls["n"] += 1
        if calls["n"] == 4:
            _write_json_sidecar(spark_, marker_path,
                                {"compacting": True, "owner": "thief",
                                 "deadline": time.time() + 3600})
        return real(spark_, marker_path, owner)

    monkeypatch.setattr(generations, "check_lease", steal_then_check)
    with pytest.raises(ValueError, match="lease.*was lost"):
        lx.compact_bm25_index(spark, idir, n_buckets=8)
    monkeypatch.undo()
    del real_check
    # no flip happened: the pointer still excludes batch 4's fold
    ptr = _gen_ptr(spark, idir)
    assert ptr["max_folded_batch"] == 0
    # the thief owns the marker now; the loser didn't delete it
    assert _read_json_sidecar(spark, marker)["owner"] == "thief"
    # search still correct (pre-flip view; manifest-complete segment
    # is invisible)
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat", "the"], k=6,
                       n_buckets=8).collect()]
    assert got == [tuple(r) for r in
                   bm25_topk(_docs(spark), ["cat", "the"],
                             k=6).collect()]
    # the thief (or anyone after expiry) resumes the completed fold
    _write_json_sidecar(spark, marker,
                        {"compacting": True, "owner": "thief",
                         "deadline": time.time() - 1})
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 0
    assert _gen_ptr(spark, idir)["max_folded_batch"] == 4


def test_segment_threshold_triggers_tiered_fold(spark, tmp_path):
    """Minor folds accumulate segments; once the count would exceed
    max_segments the fold turns TIERED — the smallest half of the
    segments merge with the batches into one new segment of the SAME
    generation, the large half untouched (no automatic O(index) merge
    anymore); only full=True merges everything into gen+1 and that
    stays available."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "tiered")
    groups = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    for i, g in enumerate(groups):
        bm25_index_batch(spark.createDataFrame(g, D_SCHEMA), i, idir,
                         n_buckets=8)
        assert compact_bm25_index(spark, idir, n_buckets=8,
                                  max_segments=2) == 1
    # folds 1+2 were minor (segments [0], then [0, 1]); fold 3 would
    # make 3 segments > max_segments=2 → TIERED: the smaller of
    # {0, 1} merges with batch 2 into seg 2, generation stays 0
    ptr = _gen_ptr(spark, idir)
    assert ptr["generation"] == 0
    assert ptr["max_folded_batch"] == 2
    assert len(ptr["segments"]) == 2 and 2 in ptr["segments"]
    survivor = [s for s in ptr["segments"] if s != 2][0]
    merged = [s for s in (0, 1) if s != survivor][0]
    assert os.path.exists(f"{idir}/gen=0/postings/seg={survivor}")
    assert os.path.exists(f"{idir}/gen=0/postings/seg=2")
    # the merged source segment is gone after cleanup
    assert not os.path.exists(f"{idir}/gen=0/postings/seg={merged}")
    # the pointer's seg_stats snapshot names every live segment and
    # sums to the corpus totals
    raw = _read_json_sidecar(spark, f"{idir}/_bm25_generation.json")
    snap = raw["seg_stats"]
    assert set(snap) == {str(s) for s in ptr["segments"]}
    assert sum(v[0] for v in snap.values()) == len(DOCS)
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    # full=True is still the everything-merge into the next generation
    assert compact_bm25_index(spark, idir, n_buckets=8, full=True) == 0
    assert _gen_ptr(spark, idir) == {
        "generation": 1, "segments": [0],
        "max_folded_batch": 2, "applied_dels": -1}
    assert not os.path.exists(f"{idir}/gen=0")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


# --- document deletion (tombstones) ------------------------------------------


def test_delete_docs_matches_rebuilt_index(spark, tmp_path):
    """search-after-delete equals an index REBUILT without the docs,
    row for row — tf, df, N and avgdl all corrected; double deletes
    don't subtract twice; unknown ids are no-ops."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_delete_docs,
        bm25_index_stats,
    )

    idir = str(tmp_path / "del")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert bm25_delete_docs(spark, idir, [1, 5], n_buckets=8) == 2
    rdir = str(tmp_path / "rebuilt")
    kept = [d for d in DOCS if d[0] not in (1, 5)]
    bm25_index_batch(spark.createDataFrame(kept, D_SCHEMA), 0, rdir,
                     n_buckets=8)
    for q in (["cat", "the"], ["dog"], ["fish", "swim"]):
        got = [tuple(r) for r in
               bm25_search(spark, idir, q, k=6, n_buckets=8).collect()]
        want = [tuple(r) for r in
                bm25_search(spark, rdir, q, k=6, n_buckets=8).collect()]
        assert got == want, q
    # stats are the logical (corrected) totals
    s = bm25_index_stats(spark, idir)
    sr = bm25_index_stats(spark, rdir)
    assert (s["n_docs"], s["sum_dl"], s["avgdl"]) == (
        sr["n_docs"], sr["sum_dl"], sr["avgdl"])
    assert s["pending_del_batches"] == [0]
    # double delete: already-tombstoned ids skipped, unknown id no-op
    assert bm25_delete_docs(spark, idir, [1, 999], n_buckets=8) == 0
    s2 = bm25_index_stats(spark, idir)
    assert (s2["n_docs"], s2["sum_dl"]) == (s["n_docs"], s["sum_dl"])
    # batched search over the tombstoned index matches the rebuilt one
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_search_batch,
    )

    qdf = spark.createDataFrame([(0, "cat dog"), (1, "the fish")],
                                "query_id long, text string")
    gotb = sorted(map(tuple, bm25_search_batch(
        spark, qdf, idir, k=5, n_buckets=8).collect()))
    wantb = sorted(map(tuple, bm25_search_batch(
        spark, qdf, rdir, k=5, n_buckets=8).collect()))
    assert gotb == wantb


def test_delete_docs_survive_folds_and_replay(spark, tmp_path):
    """Tombstones stay logical through a MINOR fold (still anti-joined,
    stats still corrected), are physically applied by a MAJOR fold
    (del dirs retired, postings dropped, stats folded exactly), and a
    REPLAY of a batch containing a deleted doc does not resurrect
    it."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_delete_docs,
        compact_bm25_index,
    )

    idir = str(tmp_path / "delfold")
    rdir = str(tmp_path / "delref")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    assert bm25_delete_docs(spark, idir, [0], n_buckets=8) == 1
    kept = [d for d in DOCS if d[0] != 0]
    bm25_index_batch(spark.createDataFrame(kept, D_SCHEMA), 0, rdir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_search(spark, rdir, ["cat", "the"], k=6,
                        n_buckets=8).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want

    # MINOR fold of a fresh batch: tombstone stays pending, parity holds
    extra = [(30, "cat extra")]
    bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 5, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(extra, D_SCHEMA), 5, rdir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 1
    assert os.path.exists(f"{idir}/tombstones/del=0")
    want2 = [tuple(r) for r in
             bm25_search(spark, rdir, ["cat", "the"], k=7,
                         n_buckets=8).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=7,
                        n_buckets=8).collect()] == want2

    # MAJOR fold applies the delete physically and retires the del dir
    assert compact_bm25_index(spark, idir, n_buckets=8, full=True) == 0
    assert not os.path.exists(f"{idir}/tombstones/del=0")
    ptr = _gen_ptr(spark, idir)
    assert ptr["applied_dels"] == 0
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=7,
                        n_buckets=8).collect()] == want2
    # doc 0's postings are physically gone from the generation tree
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    view = lx._index_view(spark, idir)
    gen_rows = lx._postings_frames(spark, idir, view)
    assert gen_rows.filter(F.col("id") == 0).count() == 0

    # replay-resurrection: delete a doc in an UNFOLDED batch, replay
    # the batch — the tombstone still hides it
    fresh = [(40, "cat cameo"), (41, "dog solo")]
    bm25_index_batch(spark.createDataFrame(fresh, D_SCHEMA), 9, idir,
                     n_buckets=8)
    assert bm25_delete_docs(spark, idir, [40], n_buckets=8) == 1
    bm25_index_batch(spark.createDataFrame(fresh, D_SCHEMA), 9, idir,
                     n_buckets=8)  # replay rewrites doc 40's postings
    got = {r.doc_id for r in
           bm25_search(spark, idir, ["cat"], k=9, n_buckets=8).collect()}
    assert 40 not in got and 41 not in got  # 41 has no 'cat'
    assert 2 in got


def test_delete_docs_refusals_and_positional(spark, tmp_path):
    """Deletes refuse during a compaction (they would race the fold's
    stats snapshot); deleted docs drop out of phrase and proximity
    search over a positional index exactly like a rebuild."""
    import time

    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_topk,
        proximity_topk,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_delete_docs,
        phrase_search,
        proximity_search,
    )

    docs = [(0, "hash join beats loop join"),
            (1, "hash join hash join wins"),
            (2, "hash only here"),
            (3, "join the hash club")]
    pdir = str(tmp_path / "posdel")
    bm25_index_batch(spark.createDataFrame(docs, D_SCHEMA), 0, pdir,
                     n_buckets=8, positional=True)
    assert bm25_delete_docs(spark, pdir, [1], n_buckets=8) == 1
    kept = spark.createDataFrame([d for d in docs if d[0] != 1],
                                 D_SCHEMA)
    assert [tuple(r) for r in
            phrase_search(spark, pdir, ["hash", "join"], k=5,
                          n_buckets=8).collect()] == \
        [tuple(r) for r in
         phrase_topk(kept, ["hash", "join"], k=5).collect()]
    assert [tuple(r) for r in
            proximity_search(spark, pdir, ["hash", "join"], 3, k=5,
                             n_buckets=8).collect()] == \
        [tuple(r) for r in
         proximity_topk(kept, ["hash", "join"], 3, k=5).collect()]

    # refusal while a fold is marked in progress
    marker = f"{pdir}/_bm25_compacting.json"
    _write_json_sidecar(spark, marker,
                        {"compacting": True, "owner": "x",
                         "deadline": time.time() + 60})
    with pytest.raises(ValueError, match="compacting"):
        bm25_delete_docs(spark, pdir, [2], n_buckets=8)


# --- snippet integration ------------------------------------------------------


def test_snippets_raw_mode_hit_parity(spark):
    """raw=True slices the ORIGINAL casing while matching
    case-insensitively: hit counts and window boundaries equal the
    lowercase mode token for token; only the echoed casing differs."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        snippets,
    )

    docs = spark.createDataFrame(
        [(0, "The CAT sat on the Mat while a Cat napped"),
         (1, "CAT"),
         (2, "no feline here"),
         (3, None)],
        D_SCHEMA)
    low = {r.doc_id: (r.n_matches, r.snips)
           for r in snippets(docs, ["cat"], width=2,
                             max_snippets=2).collect()}
    rawm = {r.doc_id: (r.n_matches, r.snips)
            for r in snippets(docs, ["cat"], width=2, max_snippets=2,
                              raw=True).collect()}
    assert set(low) == set(rawm) == {0, 1}
    for d in low:
        assert low[d][0] == rawm[d][0]
        assert [s.lower() for s in rawm[d][1]] == low[d][1]
    # the raw mode echoes the original casing
    assert rawm[0][1][0] == "The CAT sat on"
    assert rawm[1][1] == ["CAT"]


def test_search_with_snippets_one_plan_one_corpus_scan(spark, tmp_path):
    """search_with_snippets = bm25_search_batch rows + per-result
    snippets in the same plan: scores/ranks identical to the plain
    batched search, every result row carries >=1 match, each row's
    snippets window ITS OWN query's terms, and the document source is
    scanned exactly once (the join-back — no extra corpus scan)."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_search_batch,
        search_with_snippets,
    )

    ddir = str(tmp_path / "docsrc")
    _docs(spark).write.parquet(ddir)
    docs = spark.read.parquet(ddir)
    idir = str(tmp_path / "snipidx")
    bm25_index_batch(docs, 0, idir, n_buckets=8)
    qdf = spark.createDataFrame([(0, "cat"), (1, "dog fish")],
                                "query_id long, text string")

    got = search_with_snippets(spark, qdf, idir, docs, k=5,
                               width=1, n_buckets=8)
    rows = got.collect()
    plain = {(r.query_id, r.doc_id): (r.rank, r.n_terms_hit, r.score)
             for r in bm25_search_batch(spark, qdf, idir, k=5,
                                        n_buckets=8).collect()}
    assert {(r.query_id, r.doc_id): (r.rank, r.n_terms_hit, r.score)
            for r in rows} == plain
    assert all(r.n_matches >= 1 for r in rows)
    # per-query isolation: query 0's snippets window 'cat' hits only
    for r in rows:
        want_terms = {"cat"} if r.query_id == 0 else {"dog", "fish"}
        for s in r.snips:
            assert want_terms & set(s.split()), (r, s)
    # exactly ONE scan of the document source in the executed plan (the
    # doc table's read schema appears in no other scan; plan paths are
    # truncated, so count the schema not the path; AQE re-prints the
    # initial plan below the final one — count the final section only)
    plan = (got._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("struct<doc_id:bigint,text:string>") == 1, plan
    assert "BatchEvalPython" not in plan

    # raw mode: same hits, original casing (doc 5 has 'CAT')
    raw_rows = {(r.query_id, r.doc_id): r.snips
                for r in search_with_snippets(
                    spark, qdf, idir, docs, k=5, width=1,
                    raw=True, n_buckets=8).collect()}
    low_rows = {(r.query_id, r.doc_id): r.snips for r in rows}
    assert set(raw_rows) == set(low_rows)
    for key, snips in raw_rows.items():
        assert [s.lower() for s in snips] == low_rows[key]
    assert any("CAT" in s for snips in raw_rows.values()
               for s in snips)


# --- in-stream auto-compaction ------------------------------------------------


def test_compact_max_batch_bound_keeps_replay_safe(spark, tmp_path):
    """max_batch bounds the fold: batches above it stay unfolded AND
    replayable — the property in-stream auto-compaction relies on (the
    current batch may replay after a restart)."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        compact_bm25_index,
    )

    idir = str(tmp_path / "maxb")
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        bm25_index_batch(spark.createDataFrame(sl, D_SCHEMA), i, idir,
                         n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8,
                              max_batch=1) == 2
    ptr = _gen_ptr(spark, idir)
    assert ptr["max_folded_batch"] == 1
    assert os.path.exists(f"{idir}/postings/batch=2")
    # the bounded-out batch replays fine (it is above the fence)
    bm25_index_batch(spark.createDataFrame(DOCS[4:], D_SCHEMA), 2, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


def test_stream_ingest_with_auto_compaction(spark, tmp_path):
    """A self-maintaining ingest stream: with compact_every=2 and one
    file per micro-batch, folds fire as committed batches accumulate,
    the final index is mostly consolidated (only the tail batches
    unfolded), and search equals the ad-hoc path over everything —
    through the folds, with no manual maintenance call."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_stats,
    )

    sdir = str(tmp_path / "src")
    idir = str(tmp_path / "autoidx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)
    groups = [DOCS[:2], DOCS[2:4], DOCS[4:],
              [(10, "cat finale"), (11, "the end")]]
    for i, g in enumerate(groups):
        with open(f"{sdir}/b{i}.json", "w") as f:
            for di, t in g:
                f.write(json.dumps({"doc_id": di, "text": t}) + "\n")
    st = (spark.readStream.schema(D_SCHEMA)
          .option("maxFilesPerTrigger", 1).json(sdir))
    q = run_bm25_index_stream(st, idir, ckpt, n_buckets=8,
                              compact_every=2)
    q.awaitTermination(180)
    s = bm25_index_stats(spark, idir)
    assert s["generation"] >= 0          # at least one fold fired
    assert s["n_unfolded"] <= 2          # only the tail stayed unfolded
    assert not s["compacting"]
    all_docs = spark.createDataFrame(DOCS + groups[3], D_SCHEMA)
    want = [tuple(r) for r in
            bm25_topk(all_docs, ["cat", "the"], k=8).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=8,
                        n_buckets=8).collect()] == want


# --- dedup→deletion bridge + batched hybrid ----------------------------------


def test_delete_dedup_losers_bridge(spark, tmp_path):
    """connected_components labels → delete_dedup_losers tombstones the
    keep-one losers out of BOTH persisted indexes: searches afterwards
    equal indexes rebuilt from the winners only, and a re-run is a
    no-op."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
        ivf_search,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        delete_dedup_losers,
    )

    docs = [(0, "the cat sat on the mat"),
            (1, "the cat sat on the mat"),   # dup of 0 → loser
            (2, "dogs bark loudly"),
            (3, "dogs bark loudly"),          # dup of 2 → loser
            (4, "fish swim")]
    dim = 4
    vecs = [(i, [1.0 if d == i % dim else 0.2 for d in range(dim)])
            for i, _ in docs]
    ddf = spark.createDataFrame(docs, D_SCHEMA)
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    bdir, vdir = str(tmp_path / "bb"), str(tmp_path / "vv")
    bm25_index_batch(ddf, 0, bdir, n_buckets=8)
    cents = train_ivf_centroids(vdf, k=2, dim=dim)
    ivf_index_batch(vdf, 0, vdir, cents)

    pairs = spark.createDataFrame([(0, 1), (2, 3)],
                                  "id_a long, id_b long")
    labels = connected_components(
        pairs, ddf.select(F.col("doc_id").alias("id")))
    out = delete_dedup_losers(spark, labels, bm25_index_dir=bdir,
                              ivf_index_dir=vdir, n_buckets=8)
    assert out == {"losers": 2, "bm25_deleted": 2, "ivf_deleted": 2}

    winners = [d for d in docs if d[0] not in (1, 3)]
    rb = str(tmp_path / "rb")
    bm25_index_batch(spark.createDataFrame(winners, D_SCHEMA), 0, rb,
                     n_buckets=8)
    assert [tuple(r) for r in
            bm25_search(spark, bdir, ["cat", "dogs"], k=5,
                        n_buckets=8).collect()] == \
        [tuple(r) for r in
         bm25_search(spark, rb, ["cat", "dogs"], k=5,
                     n_buckets=8).collect()]
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_topk,
    )

    kept_vecs = vdf.filter(~F.col("vec_id").isin([1, 3]))
    q = [1.0, 0.2, 0.2, 0.2]
    assert [tuple(r) for r in
            ivf_search(spark, vdir, q, cents, k=3,
                       n_probe=2).collect()] == \
        [tuple(r) for r in
         ivf_topk(kept_vecs, q, cents, k=3, n_probe=2).collect()]
    # idempotent re-run
    assert delete_dedup_losers(spark, labels, bm25_index_dir=bdir,
                               ivf_index_dir=vdir, n_buckets=8) == {
        "losers": 2, "bm25_deleted": 0, "ivf_deleted": 0}


def test_hybrid_search_batch_matches_single(spark, tmp_path):
    """Per query, the batched hybrid over the persisted indexes equals
    hybrid_search with the same parameters — both retriever sides and
    the RRF fold are the pinned single-query paths."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        hybrid_search,
        hybrid_search_batch,
    )

    dim = 8
    rows = [(i, f"cat dog t{i} {'fish' if i % 3 == 0 else 'bird'}",
             [1.0 if d == i % dim else 0.1 * ((i * 7 + d) % 5)
              for d in range(dim)]) for i in range(30)]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], D_SCHEMA)
    vecs = spark.createDataFrame([(i, v) for i, _, v in rows],
                                 "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(vecs, k=4, dim=dim)
    bdir, vdir = str(tmp_path / "hb"), str(tmp_path / "hv")
    bm25_index_batch(docs, 0, bdir, n_buckets=8)
    ivf_index_batch(vecs, 0, vdir, cents)

    queries = [("cat fish", [1.0] + [0.05] * (dim - 1)),
               ("dog bird", [0.1, 1.0] + [0.05] * (dim - 2))]
    qdf = spark.createDataFrame(
        [(qi, t, v) for qi, (t, v) in enumerate(queries)],
        "query_id long, text string, embedding array<double>")
    batched = hybrid_search_batch(
        spark, qdf, bdir, vdir, cents, k=6, n_candidates=8, n_probe=2,
        n_buckets=8)
    got = {qi: sorted((r.doc_id, r.rank, r.n_sources, r.rrf_score)
                      for r in batched.collect() if r.query_id == qi)
           for qi in range(len(queries))}
    for qi, (t, v) in enumerate(queries):
        want = sorted(tuple(r) for r in hybrid_search(
            spark, bdir, vdir, t.split(), v, cents, k=6,
            n_candidates=8, n_probe=2, n_buckets=8).collect())
        assert got[qi] == want, qi


# --- round-15: tiered merges, staged promotes, df-native deletion ------------


def test_tiered_fold_crash_windows_and_parity(spark, tmp_path,
                                              monkeypatch):
    """The crash-window suite for a PARTIAL-SEGMENT-SET (tiered) merge:
    crash before the flip leaves the pointer naming the old segments
    (all intact — search correct); resume finishes the flip WITHOUT
    refolding; the merged source segments are swept only after the
    flip; parity holds throughout."""
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    idir = str(tmp_path / "tieredcrash")
    groups = [DOCS[:2], DOCS[2:4]]
    for i, g in enumerate(groups):
        bm25_index_batch(spark.createDataFrame(g, D_SCHEMA), i, idir,
                         n_buckets=8)
        assert lx.compact_bm25_index(spark, idir, n_buckets=8,
                                     max_segments=2) == 1
    assert _gen_ptr(spark, idir)["segments"] == [0, 1]
    bm25_index_batch(spark.createDataFrame(DOCS[4:], D_SCHEMA), 2, idir,
                     n_buckets=8)
    want = [tuple(r) for r in
            bm25_topk(_docs(spark), ["cat", "the"], k=6).collect()]

    def boom(*a, **kw):
        raise RuntimeError("crash before flip")

    monkeypatch.setattr(lx, "_flip", boom)
    with pytest.raises(RuntimeError, match="crash before flip"):
        lx.compact_bm25_index(spark, idir, n_buckets=8, max_segments=2,
                              lease_seconds=0.0)
    monkeypatch.undo()
    # the tiered manifest is down; the pointer still names the OLD
    # segments, both intact — search is correct NOW
    man = _read_json_sidecar(spark,
                             f"{idir}/gen=0/_manifest_seg=2.json")
    assert man is not None and man["merged_segments"] != []
    assert _gen_ptr(spark, idir)["segments"] == [0, 1]
    assert os.path.exists(f"{idir}/gen=0/postings/seg=0")
    assert os.path.exists(f"{idir}/gen=0/postings/seg=1")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want
    # resume = flip + cleanup only, never a refold
    assert lx.compact_bm25_index(spark, idir, n_buckets=8,
                                 max_segments=2) == 0
    ptr = _gen_ptr(spark, idir)
    assert ptr["generation"] == 0 and 2 in ptr["segments"]
    assert len(ptr["segments"]) == 2
    merged = man["merged_segments"]
    for s in merged:
        assert not os.path.exists(f"{idir}/gen=0/postings/seg={s}")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=6,
                        n_buckets=8).collect()] == want


def test_fold_staging_abort_when_lease_stolen(spark, tmp_path,
                                              monkeypatch):
    """A fold that loses its lease before PROMOTING aborts with the
    final segment directory untouched — its output is stranded in the
    owner-unique staging dir (the zombie-write fix), and the next
    holder's sweep removes it before refolding."""
    import glob
    import time

    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming import (
        generations,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (
        _write_json_sidecar,
    )

    idir = str(tmp_path / "stagesteal")
    bm25_index_batch(_docs(spark), 0, idir, n_buckets=8)
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 1
    bm25_index_batch(spark.createDataFrame(
        [(10, "cat encore")], D_SCHEMA), 3, idir, n_buckets=8)
    want = [tuple(r) for r in
            bm25_topk(spark.createDataFrame(DOCS + [(10, "cat encore")],
                                            D_SCHEMA),
                      ["cat", "the"], k=7).collect()]

    real = generations.check_lease
    calls = {"n": 0}

    def steal_before_promote(spark_, marker_path, owner):
        # call 1 = refresh_lease's check; call 2 = promote_staged's
        # pre-rename check — steal right before it (the zombie whose
        # lease expired during the long segment write)
        calls["n"] += 1
        if calls["n"] == 2:
            _write_json_sidecar(spark_, marker_path,
                                {"compacting": True, "owner": "thief",
                                 "deadline": time.time() + 3600})
        return real(spark_, marker_path, owner)

    monkeypatch.setattr(generations, "check_lease", steal_before_promote)
    with pytest.raises(ValueError, match="lease.*was lost"):
        lx.compact_bm25_index(spark, idir, n_buckets=8)
    monkeypatch.undo()
    # nothing promoted: no final seg=1, no manifest — the attempt sits
    # in the owner-unique staging dir; search unaffected
    assert not os.path.exists(f"{idir}/gen=0/postings/seg=1")
    stages = glob.glob(f"{idir}/gen=0/postings/_stage_seg=1_*")
    assert stages, "staged output should be stranded, not promoted"
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=7,
                        n_buckets=8).collect()] == want
    # the thief's lease expires; the next fold sweeps the stale staging
    # dir and refolds to parity
    _write_json_sidecar(spark, f"{idir}/_bm25_compacting.json",
                        {"compacting": True, "owner": "thief",
                         "deadline": time.time() - 1})
    assert lx.compact_bm25_index(spark, idir, n_buckets=8) == 1
    assert not glob.glob(f"{idir}/gen=0/postings/_stage_seg=*")
    assert os.path.exists(f"{idir}/gen=0/postings/seg=1")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=7,
                        n_buckets=8).collect()] == want


def test_delete_docs_df_matches_list_and_lease_excludes(spark,
                                                        tmp_path):
    """The DataFrame-native delete equals the list form (same
    tombstones, same search-after-delete parity), double df-deletes
    are no-ops, and the maintenance lease excludes concurrent
    deleters/compactors in both directions — closing the del-slot
    race."""
    import time

    from harvesting_extract_to_ttl_service_spark.streaming.generations import (
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_delete_docs_df,
        bm25_index_stats,
    )

    idir = str(tmp_path / "dfdel")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    ids_df = spark.createDataFrame(
        [(1,), (5,), (1,), (9999,)], "id long")  # dup + unknown
    assert bm25_delete_docs_df(spark, idir, ids_df, n_buckets=8) == 2
    rdir = str(tmp_path / "dfdel_rebuilt")
    kept = [d for d in DOCS if d[0] not in (1, 5)]
    bm25_index_batch(spark.createDataFrame(kept, D_SCHEMA), 0, rdir,
                     n_buckets=8)
    for q in (["cat", "the"], ["dog"], ["fish", "swim"]):
        assert [tuple(r) for r in
                bm25_search(spark, idir, q, k=6,
                            n_buckets=8).collect()] == \
            [tuple(r) for r in
             bm25_search(spark, rdir, q, k=6,
                         n_buckets=8).collect()], q
    s, sr = bm25_index_stats(spark, idir), bm25_index_stats(spark, rdir)
    assert (s["n_docs"], s["sum_dl"]) == (sr["n_docs"], sr["sum_dl"])
    # re-deleting the same frame is a no-op (no double subtraction)
    assert bm25_delete_docs_df(spark, idir, ids_df, n_buckets=8) == 0

    # a live maintenance lease excludes a delete (slot race closed)…
    marker = f"{idir}/_bm25_compacting.json"
    _write_json_sidecar(spark, marker,
                        {"deleting": True, "owner": "other-deleter",
                         "deadline": time.time() + 60})
    with pytest.raises(ValueError, match="held by owner other-deleter"):
        bm25_delete_docs_df(spark, idir, ids_df, n_buckets=8)
    # …and ingest refuses while a delete holds the marker (its
    # postings harvest could race a replay's overwrite)
    with pytest.raises(ValueError, match="deleting"):
        bm25_index_batch(spark.createDataFrame([(50, "late")], D_SCHEMA),
                         9, idir, n_buckets=8)
    os.unlink(marker)


def test_big_deletion_set_switches_to_shuffle_anti_join(spark,
                                                        tmp_path):
    """Once the tombstone batches outgrow
    spark.sql.autoBroadcastJoinThreshold the search-side anti-join
    switches from broadcast to a shuffle join (a forced broadcast of a
    hundreds-of-millions-id deletion set would OOM every executor);
    results are identical either way."""
    idir = str(tmp_path / "bigdel")
    docs = [(i, f"cat number {i} sat") for i in range(200)]
    bm25_index_batch(spark.createDataFrame(docs, D_SCHEMA), 0, idir,
                     n_buckets=8)
    ids_df = spark.range(0, 100).select(F.col("id"))
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_delete_docs_df,
    )

    assert bm25_delete_docs_df(spark, idir, ids_df, n_buckets=8) == 100
    want = [tuple(r) for r in
            bm25_search(spark, idir, ["cat"], k=5,
                        n_buckets=8).collect()]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        got_df = bm25_search(spark, idir, ["cat"], k=5, n_buckets=8)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        # the tombstone anti-join is NOT a broadcast join under the
        # tiny threshold
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and all("Broadcast" not in ln for ln in anti), plan
        assert [tuple(r) for r in got_df.collect()] == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and with the normal threshold the small-set case still broadcasts
    plan2 = (bm25_search(spark, idir, ["cat"], k=5, n_buckets=8)
             ._jdf.queryExecution().executedPlan().toString())
    anti2 = [ln for ln in plan2.splitlines() if "LeftAnti" in ln]
    assert anti2 and any("Broadcast" in ln for ln in anti2), plan2


def test_seg_stats_snapshot_serves_stats_without_parquet(spark,
                                                         tmp_path):
    """The pointer's fold-time seg_stats snapshot IS the segment-stats
    source: with every segment's stats parquet physically removed the
    search still scores correctly (only unfolded batches read stats
    from disk); a pre-snapshot pointer (seg_stats stripped) falls back
    to the parquet path."""
    import json as _json

    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_stats,
        compact_bm25_index,
    )

    idir = str(tmp_path / "snapstats")
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 1
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 1
    bm25_index_batch(spark.createDataFrame(
        [(20, "cat encore")], D_SCHEMA), 5, idir, n_buckets=8)
    all_docs = spark.createDataFrame(DOCS + [(20, "cat encore")],
                                     D_SCHEMA)
    want = [tuple(r) for r in
            bm25_topk(all_docs, ["cat", "the"], k=7).collect()]
    # remove BOTH segments' stats parquet: the snapshot must carry it
    import shutil

    for s in (0, 1):
        shutil.rmtree(f"{idir}/gen=0/stats/seg={s}")
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=7,
                        n_buckets=8).collect()] == want
    st = bm25_index_stats(spark, idir)
    assert st["n_docs"] == 7
    # strip seg_stats from the pointer (the pre-snapshot form): the
    # parquet fallback engages — and with the parquet gone it fails
    # LOUDLY, proving the fast path above really served from the
    # snapshot
    pfile = f"{idir}/_bm25_generation.json"
    ptr = _json.loads(open(pfile).read())
    ptr.pop("seg_stats")
    crc = f"{idir}/._bm25_generation.json.crc"
    os.path.exists(crc) and os.unlink(crc)
    with open(pfile, "w") as fh:
        fh.write(_json.dumps(ptr))
    with pytest.raises(Exception):
        bm25_search(spark, idir, ["cat", "the"], k=7,
                    n_buckets=8).collect()


def test_phrase_chain_df_computed_after_tombstone_anti_join(spark,
                                                            tmp_path):
    """The rarest-first chain ordering for phrase/proximity reads df
    from the SAME pruned-postings frame the tombstone anti-join
    already filtered — deleting docs changes the dfs the chain sees
    (stale df would only reorder joins, result-safe, but the pin
    documents the ordering input too)."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        _index_view,
        _read_pruned_postings,
        bm25_delete_docs,
    )

    docs = [(0, "alpha beta"), (1, "alpha beta"), (2, "alpha beta"),
            (3, "alpha only"), (4, "beta solo here"),
            (5, "more beta words")]
    idir = str(tmp_path / "dfchain")
    bm25_index_batch(spark.createDataFrame(docs, D_SCHEMA), 0, idir,
                     n_buckets=8, positional=True)
    # delete docs 0-2: alpha's df goes 4→1 and beta's 5→2 — the chain
    # input must see the POST-delete dfs
    assert bm25_delete_docs(spark, idir, [0, 1, 2], n_buckets=8) == 3
    view = _index_view(spark, idir)
    pp = _read_pruned_postings(spark, idir, ["alpha", "beta"], 8, view)
    dfs = {r["term"]: r["df"] for r in
           pp.groupBy("term").agg(
               F.countDistinct("id").alias("df")).collect()}
    assert dfs == {"alpha": 1, "beta": 2}


def test_stream_auto_compaction_crosses_tiered_threshold(spark,
                                                         tmp_path):
    """In-stream auto-compaction composes with size-tiered merging: a
    stream whose folds cross max_segments repeatedly keeps the
    generation (no automatic full merge), keeps the segment count at
    the cap, and serves the ad-hoc answer at the end — the
    self-maintaining loop never pays O(index)."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_stats,
    )

    sdir = str(tmp_path / "src")
    idir = str(tmp_path / "tieredstream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)
    extra = [(10, "cat encore"), (11, "the end"), (12, "dog final"),
             (13, "fish coda")]
    groups = [DOCS[:2], DOCS[2:4], DOCS[4:],
              extra[:1], extra[1:2], extra[2:3], extra[3:]]
    for i, g in enumerate(groups):
        with open(f"{sdir}/b{i}.json", "w") as f:
            for di, t in g:
                f.write(json.dumps({"doc_id": di, "text": t}) + "\n")
    st = (spark.readStream.schema(D_SCHEMA)
          .option("maxFilesPerTrigger", 1).json(sdir))
    q = run_bm25_index_stream(st, idir, ckpt, n_buckets=8,
                              compact_every=1, max_segments=2)
    q.awaitTermination(240)
    s = bm25_index_stats(spark, idir)
    # 6 in-stream folds (batches 0..5 fold; the final batch stays
    # unfolded by the max_batch bound): several threshold crossings,
    # yet the generation never advanced and the cap held
    assert s["generation"] == 0
    assert s["n_segments"] <= 2
    assert s["n_unfolded"] <= 1
    all_docs = spark.createDataFrame(DOCS + extra, D_SCHEMA)
    want = [tuple(r) for r in
            bm25_topk(all_docs, ["cat", "the"], k=10).collect()]
    assert [tuple(r) for r in
            bm25_search(spark, idir, ["cat", "the"], k=10,
                        n_buckets=8).collect()] == want
