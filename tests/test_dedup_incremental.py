"""Incremental batch-vs-index MinHash dedup (operators/dedup.py
`minhash_band_index` / `incremental_minhash_pairs`): equivalence with the
full-corpus recompute, parquet index roundtrip, and the broadcast plan
shape that makes it the 100 TB operating mode."""

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_index,
    minhash_similarity,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "an entirely different sentence about spark shuffles and joins",
        "training data pipelines need deduplication at corpus scale",
        "the quick brown fox jumps over the lazy dog again and AGAIN",
    ]
    rows = [(i, base[i % 4] + (f" tail{i // 4}" if i % 7 == 0 else ""))
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full_pairs_touching_new(docs, threshold):
    full = minhash_similarity(docs, threshold=threshold)
    return {
        (r.id_a, r.id_b, round(r.est_jaccard, 6))
        for r in full.collect()
        if r.id_a % 2 == 0 or r.id_b % 2 == 0
    }


def test_incremental_equals_full_minus_corpus_pairs(docs):
    new = docs.filter(F.col("doc_id") % 2 == 0)
    index = minhash_band_index(docs.filter(F.col("doc_id") % 2 == 1))
    got = {
        (r.id_a, r.id_b, round(r.est_jaccard, 6))
        for r in incremental_minhash_pairs(new, index, threshold=0.5).collect()
    }
    assert got == _full_pairs_touching_new(docs, 0.5)
    assert got  # the fixture is built to produce near-dups


def test_index_roundtrips_through_parquet(docs, tmp_path):
    new = docs.filter(F.col("doc_id") % 2 == 0)
    old = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "minhash_index")
    minhash_band_index(old).write.parquet(path)
    stored = docs.sparkSession.read.parquet(path)
    direct = incremental_minhash_pairs(new, minhash_band_index(old),
                                       threshold=0.5)
    via_disk = incremental_minhash_pairs(new, stored, threshold=0.5)
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, via_disk.collect()))
    # appending the batch's banded table grows the index in place
    # (schema-compatible by construction)
    minhash_band_index(new).write.mode("append").parquet(path)
    n_bands = 8
    assert docs.sparkSession.read.parquet(path).count() == 40 * n_bands


def test_new_side_broadcasts_against_index_scan(docs):
    """The batch (new) side must be the broadcast side of the vs-index
    join — the corpus index streams map-side, nothing corpus-sized
    shuffles."""
    new = docs.filter(F.col("doc_id") % 2 == 0)
    index = minhash_band_index(docs.filter(F.col("doc_id") % 2 == 1))
    plan = (incremental_minhash_pairs(new, index, threshold=0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    no_bcast = (incremental_minhash_pairs(new, index, threshold=0.5,
                                          broadcast_new=False).collect())
    assert sorted(map(tuple, no_bcast)) == sorted(
        map(tuple,
            incremental_minhash_pairs(new, index, threshold=0.5).collect()))


def test_mismatched_index_schema_raises(docs):
    import pytest

    index16 = minhash_band_index(docs.filter(F.col("doc_id") % 2 == 1),
                                 num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="different parameters"):
        incremental_minhash_pairs(docs.filter(F.col("doc_id") % 2 == 0),
                                  index16, num_hashes=32, bands=8)


def test_pairs_invariant_under_shuffle_partitioning(docs):
    """Near-dup results must not depend on the cluster's partition
    sizing: same pairs and estimates at 5 and at the default shuffle
    partition count (re-partitioning changes only WHERE rows meet, and
    every hash in the pipeline is content-derived)."""
    spark = docs.sparkSession
    orig = spark.conf.get("spark.sql.shuffle.partitions")

    def run():
        return sorted(
            (r.id_a, r.id_b, round(r.est_jaccard, 6))
            for r in minhash_similarity(docs, threshold=0.5).collect())

    base = run()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert run() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert base


def test_pin_join_parallelism_non_numeric_conf(spark, monkeypatch):
    """Vendor platforms can set spark.sql.shuffle.partitions to a
    non-numeric sentinel ('auto'): the explicit-count pin must fall back
    to defaultParallelism instead of raising ValueError at plan time."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        _pin_join_parallelism,
    )

    df = spark.range(10)
    orig_get = type(spark.conf).get
    sentinel = object()

    def fake_get(self, key, default=sentinel):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        if default is sentinel:
            return orig_get(self, key)
        return orig_get(self, key, default)

    monkeypatch.setattr(type(spark.conf), "get", fake_get)
    out = _pin_join_parallelism(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
