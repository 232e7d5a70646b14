"""Materialization-mode knob (operators/materialize.py): every mode
yields the same answers — the knob trades fault tolerance for speed, never
semantics (ADVICE r5: the unconditional localCheckpoint cuts offered no
fault-tolerant alternative)."""

import pytest

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_candidates,
)
from harvesting_extract_to_ttl_service_spark.operators.materialize import (
    MATERIALIZE_MODES,
    materialize,
)
from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    lsh_blocked_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, base + f"tail {i % 3}") for i in range(12)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unknown_mode_raises(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="materialize mode"):
        materialize(df, "cache_forever")
    with pytest.raises(ValueError, match="materialize mode"):
        minhash_lsh_candidates(df, materialize_mode="cache_forever").collect()


@pytest.mark.parametrize("mode", MATERIALIZE_MODES)
def test_modes_agree_minhash(spark, tmp_path, mode):
    if mode == "checkpoint":
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = _docs(spark)
    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_candidates(df, materialize_mode=mode).collect()}
    baseline = {(r.id_a, r.id_b) for r in
                minhash_lsh_candidates(df).collect()}
    assert pairs == baseline and pairs  # non-empty: 3 groups of 4 docs


def test_modes_agree_simhash_and_embeddings(spark):
    df = _docs(spark)
    want = {(r.id_a, r.id_b) for r in simhash_candidates(df).collect()}
    got = {(r.id_a, r.id_b) for r in
           simhash_candidates(df, materialize_mode="persist").collect()}
    assert got == want and got

    vecs = spark.createDataFrame(
        [(i, [float(i % 2), 1.0, float(i % 3)]) for i in range(9)],
        "vec_id long, embedding array<float>")
    want = {(r.id_a, r.id_b) for r in
            lsh_blocked_pairs(vecs, threshold=0.8, dim=3,
                              n_planes=2).collect()}
    got = {(r.id_a, r.id_b) for r in
           lsh_blocked_pairs(vecs, threshold=0.8, dim=3, n_planes=2,
                             materialize_mode="persist").collect()}
    assert got == want and got
