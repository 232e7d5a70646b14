"""Round-16 doc-keyed (id, dl) sidecar for the BM25 index
(streaming/lexical_stream._doclens_frames): deletes harvest doomed docs'
lengths from one tiny doc-keyed tree per batch/segment instead of
scanning every term bucket of the whole index; pre-sidecar indexes fall
back to the postings scan and self-heal as folds rewrite segments."""

import shutil

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (
    _doclens_frames,
    _index_view,
    bm25_delete_docs,
    bm25_index_batch,
    bm25_search,
    compact_bm25_index,
)

DOCS = [(0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat cat cat dog"),
        (3, None),
        (4, ""),
        (5, "fish swim and CAT naps")]
D_SCHEMA = "doc_id long, text string"


def _build(spark, idir):
    bm25_index_batch(spark.createDataFrame(DOCS[:3], D_SCHEMA), 0, idir,
                     n_buckets=8)
    bm25_index_batch(spark.createDataFrame(DOCS[3:], D_SCHEMA), 1, idir,
                     n_buckets=8)


def test_ingest_writes_doclens_matching_postings(spark, tmp_path):
    idir = str(tmp_path / "idx")
    _build(spark, idir)
    view = _index_view(spark, idir)
    dls = _doclens_frames(spark, idir, view)
    assert dls is not None
    got = {(r.id, r.dl) for r in dls.collect()}
    want = {(r.id, r.dl) for r in
            (spark.read.option("basePath", f"{idir}/postings")
             .parquet(f"{idir}/postings/batch=0",
                      f"{idir}/postings/batch=1")
             .groupBy("id").agg(F.first("dl").alias("dl")).collect())}
    assert got == want
    # one row per ingested doc that produced postings (None/empty texts
    # produce no postings, hence no doclens row)
    assert {r[0] for r in got} == {0, 1, 2, 5}


def test_delete_never_touches_postings_when_sidecar_present(
        spark, tmp_path, monkeypatch):
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    idir = str(tmp_path / "idx")
    _build(spark, idir)

    def boom(*a, **k):
        raise AssertionError(
            "delete scanned the postings despite a complete doclens "
            "sidecar — the O(index) harvest is back")

    monkeypatch.setattr(lx, "_postings_frames", boom)
    assert bm25_delete_docs(spark, idir, [1, 5], n_buckets=8) == 2
    monkeypatch.undo()
    tomb = spark.read.parquet(f"{idir}/tombstones/del=0")
    assert {(r.id, r.dl) for r in tomb.collect()} == {(1, 3), (5, 5)}


def test_legacy_index_without_sidecar_falls_back(spark, tmp_path):
    idir = str(tmp_path / "idx")
    _build(spark, idir)
    shutil.rmtree(f"{idir}/doclens")  # simulate a pre-r16 index
    view = _index_view(spark, idir)
    assert _doclens_frames(spark, idir, view) is None
    assert bm25_delete_docs(spark, idir, [1, 5], n_buckets=8) == 2
    tomb = spark.read.parquet(f"{idir}/tombstones/del=0")
    assert {(r.id, r.dl) for r in tomb.collect()} == {(1, 3), (5, 5)}


def test_fold_writes_segment_doclens_and_delete_stays_sidecar_only(
        spark, tmp_path, monkeypatch):
    import harvesting_extract_to_ttl_service_spark.streaming.lexical_stream as lx  # noqa: E501

    idir = str(tmp_path / "idx")
    _build(spark, idir)
    assert compact_bm25_index(spark, idir, n_buckets=8) == 2
    view = _index_view(spark, idir)
    assert view.segments == [0]
    seg = spark.read.parquet(f"{idir}/gen=0/doclens/seg=0")
    assert {(r.id, r.dl) for r in seg.collect()} \
        == {(0, 6), (1, 3), (2, 4), (5, 5)}
    # a fresh batch on top of the folded segment: the union view still
    # has a complete sidecar, so the delete must not touch postings
    bm25_index_batch(
        spark.createDataFrame([(9, "brand new cat doc")], D_SCHEMA),
        2, idir, n_buckets=8)

    def boom(*a, **k):
        raise AssertionError("postings scanned during delete")

    monkeypatch.setattr(lx, "_postings_frames", boom)
    assert bm25_delete_docs(spark, idir, [2, 9], n_buckets=8) == 2
    monkeypatch.undo()
    # search parity after the sidecar-harvested delete: equals an index
    # rebuilt without the deleted docs
    idir2 = str(tmp_path / "idx2")
    keep = [d for d in DOCS if d[0] not in (2, 9)]
    bm25_index_batch(spark.createDataFrame(keep, D_SCHEMA), 0, idir2,
                     n_buckets=8)
    got = [tuple(r) for r in
           bm25_search(spark, idir, ["cat", "dog"], k=5, n_buckets=8).collect()]
    want = [tuple(r) for r in
            bm25_search(spark, idir2, ["cat", "dog"], k=5, n_buckets=8).collect()]
    assert got == want
