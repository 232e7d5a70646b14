"""Banded multi-index Hamming near-dup (operators/dedup.py
hamming_banded_pairs): planted-pair recall vs both the combinatorial
prediction and an exact Python mirror of the bit-sampling plan, the
no-false-positive guarantee, and the image-side wiring."""

import hashlib

import pytest

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    banded_bit_positions,
    banded_hamming_recall,
    hamming_banded_pairs,
)

BITS, RADIUS, L, R = 60, 6, 16, 16


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16) & ((1 << 60) - 1)


def _flip_positions(s: str, k: int) -> list[int]:
    """k distinct deterministic bit positions derived from md5(s)."""
    out, i = [], 0
    while len(out) < k:
        p = _h60(f"{s}|flip{i}") % BITS
        if p not in out:
            out.append(p)
        i += 1
    return out


def _planted(n_pairs: int, hamming: int):
    rows = []
    for i in range(n_pairs):
        base = _h60(f"pair{hamming}_{i}")
        flipped = base
        for p in _flip_positions(f"pair{hamming}_{i}", hamming):
            flipped ^= 1 << p
        rows.append((2 * i, base))
        rows.append((2 * i + 1, flipped))
    return rows


def test_bit_position_plan_is_pinned_forever():
    """The default bit-sampling plan is a FORMAT, not a sample: every
    persisted hamming_banded_index keys fingerprints with it, so the
    derivation must never drift — across Python versions (why it is
    md5-Fisher–Yates, not random.Random.sample) or across refactors
    (why this test pins the concrete lists)."""
    pos = banded_bit_positions(60, 16, 16)
    # structural invariants
    assert len(pos) == 16
    assert all(len(p) == 16 and p == sorted(set(p)) for p in pos)
    assert all(0 <= b < 60 for p in pos for b in p)
    # the exact default plan, pinned value-for-value (first two tables)
    # and by digest (all 16) — a mismatch here means every stored index
    # in the wild just became unreadable: do NOT "fix" the test, revert
    # the derivation.
    assert pos[0] == [7, 10, 12, 13, 15, 17, 20, 36,
                      38, 43, 47, 48, 49, 50, 54, 55]
    assert pos[1] == [6, 7, 10, 16, 17, 19, 22, 25,
                      28, 30, 32, 36, 38, 47, 57, 58]
    digest = hashlib.md5(repr(pos).encode()).hexdigest()
    assert digest == "1111b2a1737e343b6505699c99be3cbb", digest


def test_recall_formula_sanity():
    assert banded_hamming_recall(BITS, 0, L, R) == pytest.approx(1.0)
    # monotone decreasing in hamming
    vals = [banded_hamming_recall(BITS, h, L, R) for h in range(0, 10)]
    assert vals == sorted(vals, reverse=True)
    assert vals[6] > 0.85            # the documented default operating point
    assert vals[3] > 0.97
    # a pair with more diffs than the sample can avoid is unreachable
    assert banded_hamming_recall(8, 5, 4, 4) == 0.0
    with pytest.raises(ValueError, match="bits_per_table"):
        banded_bit_positions(8, 2, 9)


def test_planted_pairs_match_python_mirror_exactly(spark):
    """The emitted pair set equals the mirror's prediction pair-for-pair
    (the bit samples are plan-time constants, so which true pairs are
    FOUND is deterministic), and measured recall sits near the
    combinatorial estimate."""
    n = 150
    rows = _planted(n, RADIUS)
    positions = banded_bit_positions(BITS, L, R)
    want = set()
    for i in range(n):
        diff = rows[2 * i][1] ^ rows[2 * i + 1][1]
        if any(all(not (diff >> p) & 1 for p in pos) for pos in positions):
            want.add((2 * i, 2 * i + 1))
    # sanity on the fixture itself: recall near the formula's prediction
    pred = banded_hamming_recall(BITS, RADIUS, L, R)
    assert len(want) / n == pytest.approx(pred, abs=0.10)

    sh = spark.createDataFrame(rows, "id long, sh long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in hamming_banded_pairs(sh, BITS, RADIUS, L, R).collect()}
    assert set(got) == want
    assert all(h == RADIUS for h in got.values())


def test_exact_duplicates_always_found_and_no_false_positives(spark):
    rows = _planted(80, 0) + [(1000 + i, _h60(f"noise{i}"))
                              for i in range(100)]
    sh = spark.createDataFrame(rows, "id long, sh long")
    got = {(r.id_a, r.id_b) for r in
           hamming_banded_pairs(sh, BITS, RADIUS, L, R).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(80)}
    assert planted <= got                 # h=0 recall is exactly 1.0
    # anything extra must be a genuine ≤RADIUS pair (exact verify):
    by_id = dict(rows)
    for a, b in got - planted:
        assert bin(by_id[a] ^ by_id[b]).count("1") <= RADIUS


def test_radius_above_sample_slack_finds_nothing(spark):
    """Pairs whose distance exceeds max_hamming are never emitted even
    when banding collides (the exact verify is the gate)."""
    rows = _planted(40, RADIUS + 4)
    sh = spark.createDataFrame(rows, "id long, sh long")
    got = hamming_banded_pairs(sh, BITS, RADIUS, L, R).collect()
    assert got == []


def test_image_neardup_banded_method(spark):
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        image_neardup_pairs,
    )

    rows = [(i, bytes([i % 7]) * 32) for i in range(12)]  # dups mod 7
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    banded = {(r.id_a, r.id_b) for r in
              image_neardup_pairs(media, method="banded").collect()}
    complete = {(r.id_a, r.id_b) for r in
                image_neardup_pairs(media, method="pigeonhole").collect()}
    # identical payloads → identical hashes → h=0 → banded finds ALL of
    # them (recall 1.0 at h=0); and banded never exceeds the complete set
    exact_dups = {(i, i + 7) for i in range(5)}
    assert exact_dups <= banded <= complete
    with pytest.raises(ValueError, match="unknown method"):
        image_neardup_pairs(media, method="nope")


def test_incremental_hamming_pairs_matches_full_recompute(spark):
    """Batch-vs-index pairs ∪ the index build's own pairs == one full
    banded run over the union, and the incremental call never emits
    corpus×corpus pairs."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_index,
        incremental_hamming_pairs,
    )

    corpus_rows = _planted(60, RADIUS)                  # ids 0..119
    batch_rows = (
        [(500, corpus_rows[0][1])]                      # exact dup of id 0
        + [(501, corpus_rows[2][1] ^ 0b11)]             # near id 2 (h=2+...)
        + [(510, _h60("fresh1")), (511, _h60("fresh1"))]  # within-batch dup
        + [(520, _h60("alone"))])
    corpus = spark.createDataFrame(corpus_rows, "id long, sh long")
    batch = spark.createDataFrame(batch_rows, "id long, sh long")
    index = hamming_banded_index(corpus, BITS, L, R)

    incr = {(r.id_a, r.id_b) for r in incremental_hamming_pairs(
        batch, index, BITS, RADIUS, L, R).collect()}
    # never corpus×corpus
    assert all(a >= 500 or b >= 500 for a, b in incr)
    # the guaranteed h=0 pairs are present
    assert (0, 500) in incr and (510, 511) in incr
    # equivalence on batch-touching pairs vs one full recompute
    full = {(r.id_a, r.id_b) for r in hamming_banded_pairs(
        corpus.unionByName(batch), BITS, RADIUS, L, R).collect()}
    full_touching_batch = {(a, b) for a, b in full
                           if a >= 500 or b >= 500}
    assert incr == full_touching_batch
    # shuffled-join fallback returns the identical set
    incr_shuffled = {(r.id_a, r.id_b) for r in incremental_hamming_pairs(
        batch, index, BITS, RADIUS, L, R,
        broadcast_new=False).collect()}
    assert incr_shuffled == incr


def test_incremental_hamming_replay_and_schema_guard(spark):
    """A batch replayed after its keys were folded into the index must
    not self-pair (the a.id != b.id guard), and a wrong-schema index is
    refused up front."""
    import pytest as _pytest

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_index,
        incremental_hamming_pairs,
    )

    rows = _planted(20, 0)
    sh = spark.createDataFrame(rows, "id long, sh long")
    index = hamming_banded_index(sh, BITS, L, R)
    # replay: the batch IS already in the index
    got = {(r.id_a, r.id_b) for r in incremental_hamming_pairs(
        sh, index, BITS, RADIUS, L, R).collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(20)}
    with _pytest.raises(ValueError, match="hamming_banded_index schema"):
        incremental_hamming_pairs(sh, sh, BITS, RADIUS, L, R)


def test_simhash_candidates_banded_method(spark):
    """simhash_candidates(method='banded') routes through the banded
    multi-index join: a subset of the complete pigeonhole result over
    the same fingerprints, exact-duplicate texts always found."""
    import pytest as _pytest

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        simhash_candidates,
    )

    a = ("the quick brown fox jumps over the lazy dog and runs along "
         "the river bank before the sun sets behind the green hills")
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, "totally different text about spark jobs "
                             "and shuffle partitions in a big cluster")],
        "doc_id long, text string")
    complete = {(r.id_a, r.id_b) for r in simhash_candidates(
        docs, max_hamming=6, blocks=7).collect()}
    banded = {(r.id_a, r.id_b) for r in simhash_candidates(
        docs, max_hamming=6, method="banded").collect()}
    assert (1, 2) in banded and banded <= complete
    with _pytest.raises(ValueError, match="unknown method"):
        simhash_candidates(docs, method="nope")
