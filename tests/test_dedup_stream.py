"""Streaming incremental dedup (streaming/dedup_stream.py): per-batch
pair emission, index growth, cross-batch duplicate detection, and replay
idempotence of the batch=<id> overwrite layout."""

import pytest

# streaming dedup replay soaks — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import json
import os

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
    dedup_batch,
    run_dedup_stream,
)

SCHEMA = "doc_id long, text string"

T_A = "the quick brown fox jumps over the lazy dog in the quiet park"
T_B = "spark pipelines shuffle data between executors across the busy cluster"
T_C = "a completely unrelated sentence about cooking pasta with fresh basil"


def _write_docs(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_once(spark, stream_dir, index_dir, pairs_dir, ckpt):
    stream = (spark.readStream.schema(SCHEMA)
              .json(stream_dir))
    q = run_dedup_stream(stream, index_dir, pairs_dir, ckpt, threshold=0.5)
    q.awaitTermination(120)


def test_stream_dedups_across_batches(spark, tmp_path):
    stream_dir = str(tmp_path / "docs")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)

    # batch 0: two identical docs + one distinct
    _write_docs(f"{stream_dir}/b0.json", [(1, T_A), (2, T_A), (3, T_B)])
    _run_once(spark, stream_dir, index_dir, pairs_dir, ckpt)

    pairs0 = spark.read.parquet(f"{pairs_dir}/batch=0")
    assert {(r.id_a, r.id_b) for r in pairs0.collect()} == {(1, 2)}
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert set(r.batch for r in idx.select("batch").distinct().collect()) \
        == {0}

    # batch 1 (same checkpoint → next file is batch 1): duplicates a
    # batch-0 doc and itself contains one internal duplicate pair
    _write_docs(f"{stream_dir}/b1.json", [(10, T_A), (11, T_C), (12, T_C)])
    _run_once(spark, stream_dir, index_dir, pairs_dir, ckpt)

    pairs1 = spark.read.parquet(f"{pairs_dir}/batch=1")
    got = {(r.id_a, r.id_b) for r in pairs1.collect()}
    # cross-batch: 10 duplicates 1 and 2 (from the stored index — batch 0
    # was never re-tokenized); within-batch: (11, 12)
    assert got == {(1, 10), (2, 10), (11, 12)}
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert set(r.batch for r in idx.select("batch").distinct().collect()) \
        == {0, 1}
    # index rows: one per (doc, band), 8 bands default
    assert idx.count() == 6 * 8


def test_replayed_batch_is_idempotent(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    b0 = spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA)
    b1 = spark.createDataFrame([(10, T_A), (11, T_C)], SCHEMA)

    dedup_batch(b0, 0, index_dir, pairs_dir)
    dedup_batch(b1, 1, index_dir, pairs_dir)
    first = sorted(map(tuple, spark.read.parquet(
        f"{pairs_dir}/batch=1").collect()))
    n_index = spark.read.parquet(index_dir).count()

    # replay batch 1 (failure before checkpoint commit): partitions are
    # overwritten, not duplicated, and the batch never pairs against its
    # own previous half-write
    dedup_batch(b1, 1, index_dir, pairs_dir)
    again = sorted(map(tuple, spark.read.parquet(
        f"{pairs_dir}/batch=1").collect()))
    assert again == first
    assert {(r.id_a, r.id_b) for r in spark.read.parquet(
        f"{pairs_dir}/batch=1").collect()} == {(1, 10)}
    assert spark.read.parquet(index_dir).count() == n_index


def test_compact_dedup_index_preserves_dedup(spark, tmp_path):
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    dedup_batch(spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA),
                0, index_dir, pairs_dir)
    dedup_batch(spark.createDataFrame([(5, T_C)], SCHEMA),
                1, index_dir, pairs_dir)
    n_rows = spark.read.parquet(index_dir).count()

    assert compact_dedup_index(spark, index_dir) == 2
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert {r.batch for r in idx.select("batch").distinct().collect()} == {-1}
    assert idx.count() == n_rows

    # a later batch dedups against the compacted index identically
    dedup_batch(spark.createDataFrame([(10, T_A)], SCHEMA),
                2, index_dir, pairs_dir)
    got = {(r.id_a, r.id_b) for r in
           spark.read.parquet(f"{pairs_dir}/batch=2").collect()}
    assert got == {(1, 10)}
    # second compaction folds the new batch into the existing -1
    assert compact_dedup_index(spark, index_dir) == 1
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert {r.batch for r in idx.select("batch").distinct().collect()} == {-1}
    assert idx.count() == n_rows + 8  # one more doc x 8 bands


def test_replay_after_compaction_emits_no_self_pairs(spark, tmp_path):
    """A batch replayed AFTER compaction finds its own signatures inside
    ``batch=-1`` (which the current-batch exclusion filter cannot
    remove): the vs-index id-inequality guard must keep the replay
    self-pair-free, and the shared distinct must collapse within-batch
    pairs that now surface from both join branches."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_dedup_index,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    b1 = spark.createDataFrame([(10, T_A), (11, T_C), (12, T_C)], SCHEMA)
    dedup_batch(spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA),
                0, index_dir, pairs_dir)
    dedup_batch(b1, 1, index_dir, pairs_dir)
    assert compact_dedup_index(spark, index_dir) == 2

    dedup_batch(b1, 1, index_dir, pairs_dir)  # replay post-compaction
    rows = spark.read.parquet(f"{pairs_dir}/batch=1").collect()
    assert all(r.id_a != r.id_b for r in rows)
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 10), (11, 12)}
    # no duplicate rows either: (11, 12) collides in both the vs-index
    # (against its compacted copy) and the vs-self branch
    assert len(rows) == 2


def test_index_read_distinguishes_absence_from_failure(spark, tmp_path):
    """'First batch' is decided by listing, not by swallowing the read's
    exception: an index dir that EXISTS with a prior batch partition but
    cannot be read must raise (silently deduping against nothing loses
    cross-batch pairs permanently), while genuine absence returns None."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        _read_index_except,
    )

    # absent dir → first batch
    assert _read_index_except(spark, str(tmp_path / "nope"), 0) is None
    # only the current batch's own (half-written) partition → first batch
    os.makedirs(tmp_path / "own" / "batch=3")
    assert _read_index_except(spark, str(tmp_path / "own"), 3) is None
    # a PRIOR batch partition that exists but is unreadable (no parquet
    # footer anywhere) → must raise, not masquerade as first-batch
    os.makedirs(tmp_path / "bad" / "batch=5")
    with pytest.raises(Exception):
        _read_index_except(spark, str(tmp_path / "bad"), 0)


def test_index_params_sidecar_guards_mismatch(spark, tmp_path):
    import pytest

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    b0 = spark.createDataFrame([(1, T_A)], SCHEMA)
    dedup_batch(b0, 0, index_dir, pairs_dir)
    assert os.path.exists(f"{index_dir}/_lsh_params.json")
    # same params: fine
    dedup_batch(spark.createDataFrame([(2, T_B)], SCHEMA),
                1, index_dir, pairs_dir)
    # different banding: refused before any pair is silently missed
    with pytest.raises(ValueError, match="silently missed"):
        dedup_batch(spark.createDataFrame([(3, T_C)], SCHEMA),
                    2, index_dir, pairs_dir, bands=4)


def _components(spark, components_dir):
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        read_components,
    )

    labels = read_components(spark, components_dir)
    return {(r.id, r.component) for r in labels.collect()}


def test_update_components_incremental_union_find(spark, tmp_path):
    """The stored-label merge is a real incremental union-find: a later
    batch whose pairs BRIDGE two stored components must relabel both to
    the global minimum, writing only the delta, and untouched components
    must keep their labels without being re-propagated."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        update_components,
    )

    cdir = str(tmp_path / "components")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(*ps):
        return spark.createDataFrame(list(ps) or [], "id_a long, id_b long")

    # batch 0: cluster {1,2} and untouched singleton 7
    update_components(ids(1, 2, 7), pairs((1, 2)), cdir, 0)
    assert _components(spark, cdir) == {(1, 1), (2, 1), (7, 7)}

    # batch 1: separate cluster {3,4}
    update_components(ids(3, 4), pairs((3, 4)), cdir, 1)
    assert _components(spark, cdir) == {
        (1, 1), (2, 1), (3, 3), (4, 3), (7, 7)}

    # batch 2: id 5 bridges both stored clusters → one component, min=1;
    # ids 3 and 4 get RELABELED (their delta lands in batch=2, which wins
    # at read time); 7 is untouched and must not be rewritten
    update_components(ids(5), pairs((2, 5), (4, 5)), cdir, 2)
    assert _components(spark, cdir) == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (7, 7)}
    b2 = {(r.id, r.component) for r in
          spark.read.parquet(f"{cdir}/batch=2").collect()}
    assert b2 == {(5, 1), (3, 1), (4, 1)}  # the delta only — 7 absent


def test_components_match_full_recompute(spark, tmp_path):
    """End-to-end: dedup_batch(components_dir=...) over three batches
    produces the same id→component labels as one full connected-
    components recompute over all accumulated pairs (the oracle pattern
    the incremental-dedup surface already uses)."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    cdir = str(tmp_path / "components")

    batches = [
        [(1, T_A), (2, T_B), (3, T_C)],
        [(10, T_A), (11, T_B)],
        [(20, T_A), (21, T_C)],
    ]
    for i, rows in enumerate(batches):
        dedup_batch(spark.createDataFrame(rows, SCHEMA), i, index_dir,
                    pairs_dir, components_dir=cdir)

    all_ids = spark.createDataFrame(
        [(d,) for rows in batches for d, _ in rows], "id long")
    all_pairs = spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
    full = {(r.id, r.component) for r in connected_components(
        all_pairs.select("id_a", "id_b"), all_ids).collect()}
    assert _components(spark, cdir) == full
    assert full == {(1, 1), (10, 1), (20, 1),
                    (2, 2), (11, 2),
                    (3, 3), (21, 3)}


def test_components_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch merges against the PRE-batch component
    state (its own partition is excluded from the read), so the rewrite
    is byte-equivalent — labels identical before and after the replay."""
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    cdir = str(tmp_path / "components")
    b0 = spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA)
    b1 = spark.createDataFrame([(10, T_A), (11, T_C)], SCHEMA)

    dedup_batch(b0, 0, index_dir, pairs_dir, components_dir=cdir)
    dedup_batch(b1, 1, index_dir, pairs_dir, components_dir=cdir)
    first = _components(spark, cdir)
    assert first == {(1, 1), (2, 2), (10, 1), (11, 11)}

    dedup_batch(b1, 1, index_dir, pairs_dir, components_dir=cdir)
    assert _components(spark, cdir) == first
    b1_rows = {(r.id, r.component) for r in
               spark.read.parquet(f"{cdir}/batch=1").collect()}
    assert b1_rows == {(10, 1), (11, 11)}  # the delta, not the world


def test_compact_components_then_merge(spark, tmp_path):
    """Compaction folds the label deltas into one resolved batch=-1
    partition; later batches keep merging against it (and win the
    per-id resolution), and a batch replayed after compaction rewrites
    only its own redundant delta."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_components,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    cdir = str(tmp_path / "components")
    b0 = spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA)
    b1 = spark.createDataFrame([(10, T_A)], SCHEMA)

    dedup_batch(b0, 0, index_dir, pairs_dir, components_dir=cdir)
    dedup_batch(b1, 1, index_dir, pairs_dir, components_dir=cdir)
    before = _components(spark, cdir)

    assert compact_components(spark, cdir) == 2
    raw = spark.read.option("basePath", cdir).parquet(cdir)
    assert {r.batch for r in raw.select("batch").distinct().collect()} \
        == {-1}
    assert raw.count() == 3  # one resolved row per id
    assert _components(spark, cdir) == before

    # a new batch after compaction merges against the compacted state
    dedup_batch(spark.createDataFrame([(20, T_B)], SCHEMA), 2, index_dir,
                pairs_dir, components_dir=cdir)
    assert _components(spark, cdir) == before | {(20, 2)}
    # replay batch 1 post-compaction: harmless, labels unchanged
    dedup_batch(b1, 1, index_dir, pairs_dir, components_dir=cdir)
    assert _components(spark, cdir) == before | {(20, 2)}


# --- embedding (semantic) streaming dedup ---------------------------------

V_SCHEMA = "vec_id long, embedding array<double>"
DIM = 4


def _vecs(spark, rows):
    return spark.createDataFrame(rows, V_SCHEMA)


def test_embedding_stream_matches_batch_pairs(spark, tmp_path):
    """Accumulated per-batch pairs equal one lsh_blocked_pairs run over
    the union (sign buckets are deterministic), including cross-batch
    pairs found against the stored index; components accumulate the
    keep-one labels."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        lsh_blocked_pairs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        embedding_dedup_batch,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    cdir = str(tmp_path / "components")
    batches = [
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        [(10, [0.99, 0.1, 0.0, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])],
        [(20, [1.0, 0.0, 0.0, 0.0]), (21, [0.0, -1.0, 0.0, 0.0])],
    ]
    for i, rows in enumerate(batches):
        embedding_dedup_batch(_vecs(spark, rows), i, index_dir, pairs_dir,
                              DIM, n_planes=2, threshold=0.9,
                              components_dir=cdir)

    got = {(r.id_a, r.id_b, r.cos_sim) for r in
           spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
           .drop("batch").collect()}
    full = {(r.id_a, r.id_b, r.cos_sim) for r in lsh_blocked_pairs(
        _vecs(spark, [r for rows in batches for r in rows]),
        threshold=0.9, dim=DIM, n_planes=2).collect()}
    assert got == full
    # the planted near-dups: 20 duplicates 1 exactly (cos 1.0, found
    # against the stored index), 10 is a near-dup of 1
    assert (1, 20, 1.0) in got
    assert any(a == 1 and b == 10 for a, b, _ in got)
    # keep-one labels stable across the stream
    assert {(r.id, r.component) for r in __import__(
        "harvesting_extract_to_ttl_service_spark.streaming.dedup_stream",
        fromlist=["read_components"]).read_components(spark, cdir)
        .filter("id in (1, 10, 20)").collect()} \
        == {(1, 1), (10, 1), (20, 1)}


def test_embedding_stream_replay_and_sidecar(spark, tmp_path):
    """Replay idempotence of the batch=<id> overwrite layout, and the
    _ann_params.json sidecar refusing a plane-count mismatch."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        embedding_dedup_batch,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    b0 = _vecs(spark, [(1, [1.0, 0.0, 0.0, 0.0])])
    b1 = _vecs(spark, [(10, [1.0, 0.0, 0.0, 0.0])])
    embedding_dedup_batch(b0, 0, index_dir, pairs_dir, DIM, n_planes=2)
    embedding_dedup_batch(b1, 1, index_dir, pairs_dir, DIM, n_planes=2)
    first = sorted(map(tuple, spark.read.parquet(
        f"{pairs_dir}/batch=1").collect()))
    assert {(r.id_a, r.id_b) for r in spark.read.parquet(
        f"{pairs_dir}/batch=1").collect()} == {(1, 10)}

    embedding_dedup_batch(b1, 1, index_dir, pairs_dir, DIM, n_planes=2)
    assert sorted(map(tuple, spark.read.parquet(
        f"{pairs_dir}/batch=1").collect())) == first
    assert spark.read.parquet(index_dir).count() == 2

    with pytest.raises(ValueError, match="silently missed"):
        embedding_dedup_batch(b1, 2, index_dir, pairs_dir, DIM, n_planes=4)


def test_empty_micro_batches_are_harmless(spark, tmp_path):
    """Production streams fire empty micro-batches (trigger with no new
    files): an empty FIRST batch, an empty batch after real data, and
    the component merge must all no-op cleanly rather than crash or
    corrupt state."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        read_components,
    )

    empty = spark.createDataFrame([], SCHEMA)
    i, p, c = (str(tmp_path / d) for d in ("i", "p", "c"))
    dedup_batch(empty, 0, i, p, components_dir=c)
    dedup_batch(spark.createDataFrame([(1, T_A)], SCHEMA), 1, i, p,
                components_dir=c)
    dedup_batch(empty, 2, i, p, components_dir=c)
    assert {(r.id, r.component) for r in
            read_components(spark, c).collect()} == {(1, 1)}
    assert spark.read.option("basePath", p).parquet(p).count() == 0


def test_component_merge_never_shuffles_store(spark, tmp_path):
    """The 100 TB contract of the incremental component merge: the stored
    label table is only ever probed by BROADCAST joins — every
    ``Exchange hashpartitioning(id)`` in the frontier plan sits ABOVE a
    broadcast join (shuffles frontier-sized matched rows), and no path
    from a shuffle or broadcast exchange reaches the store scan without
    crossing a BroadcastHashJoin first. A Window-style resolution of the
    full store would violate this (Catalyst cannot push a join below a
    Window), re-shuffling the corpus-sized table every micro-batch."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        _touched_frontier,
        read_state_except,
        update_components,
    )

    cdir = str(tmp_path / "components")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(*ps):
        return spark.createDataFrame(list(ps) or [], "id_a long, id_b long")

    update_components(ids(1, 2, 7), pairs((1, 2)), cdir, 0)
    update_components(ids(3, 4), pairs((3, 4)), cdir, 1)

    def kids(n):
        s = n.children()
        return [s.apply(i) for i in range(s.size())]

    def is_store_scan(n):
        # the only parquet scan in this plan IS the components store
        # (endpoints is a local relation) — structural, immune to the
        # path truncation in plan strings
        return "FileSourceScan" in n.getClass().getSimpleName()

    def exposed_store_scan(n):
        """True if n's subtree reaches the components-store parquet scan
        without crossing a BroadcastHashJoin (which caps the row count
        at the broadcast side's match volume)."""
        name = n.getClass().getSimpleName()
        if "BroadcastHashJoin" in name:
            return False
        if n.children().size() == 0:
            return is_store_scan(n)
        return any(exposed_store_scan(c) for c in kids(n))

    def count_nodes(n, pred):
        return pred(n) + sum(count_nodes(c, pred) for c in kids(n))

    def violations(n):
        name = n.getClass().getSimpleName()
        head = n.toString().splitlines()[0]
        out = []
        if ("Exchange" in name and "hashpartitioning" in head
                and exposed_store_scan(n)):
            out.append(head)
        for c in kids(n):
            out.extend(violations(c))
        return out

    raw = read_state_except(spark, cdir, 2)
    endpoints = spark.createDataFrame([(2,), (4,), (5,)], "id long")
    frontier = _touched_frontier(raw, endpoints)

    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = frontier._jdf.queryExecution().executedPlan()
        # sanity: the plan does probe the store, with broadcast joins
        assert count_nodes(plan, is_store_scan) >= 3
        assert count_nodes(
            plan, lambda n: "BroadcastHashJoin"
            in n.getClass().getSimpleName()) >= 3
        assert violations(plan) == [], plan.toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    # and the restricted plan still computes the right frontier: 5 is
    # unknown, 2 and 4 pull in their full clusters, 7 stays untouched
    assert {(r.id, r.component) for r in frontier.collect()} \
        == {(1, 1), (2, 1), (3, 3), (4, 3)}


def test_update_components_writes_every_batch_id(spark, tmp_path):
    """Consumer contract (corpus_stream keep-one reads the batch's
    partition ALONE): every id of the batch gets a row in
    components/batch=<id>, even when its label already exists unchanged
    in the store — the replay-after-compaction case, where a changed-only
    delta would silently drop the batch's representatives."""
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_components,
        update_components,
    )

    cdir = str(tmp_path / "components")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(*ps):
        return spark.createDataFrame(list(ps) or [], "id_a long, id_b long")

    update_components(ids(1, 2), pairs((1, 2)), cdir, 0)
    update_components(ids(10, 11), pairs((1, 10)), cdir, 1)
    assert compact_components(spark, cdir) == 2
    # replay batch 1 post-compaction: its ids' labels are unchanged in
    # batch=-1, but the batch partition must still cover them
    update_components(ids(10, 11), pairs((1, 10)), cdir, 1)
    b1 = {(r.id, r.component) for r in
          spark.read.parquet(f"{cdir}/batch=1").collect()}
    assert b1 == {(10, 1), (11, 11)}
    assert _components(spark, cdir) == {(1, 1), (2, 1), (10, 1), (11, 11)}


def test_embedding_multiprobe_recovers_boundary_pairs(spark, tmp_path):
    """The sign-LSH recall loss, surgically reproduced: two
    near-identical vectors straddling ONE hyperplane land in buckets one
    sign flip apart — invisible to the single-bucket join, recovered by
    probe_bits=1 in both the batch operator and the streaming twin
    (whose accumulated pairs equal the batch run at the same
    probe_bits). The sidecar pins probe_bits for the index's lifetime."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _hyperplanes,
        lsh_blocked_pairs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        embedding_dedup_batch,
    )

    p0, p1 = _hyperplanes(DIM, 2)
    d00 = sum(a * a for a in p0)
    d10 = sum(a * b for a, b in zip(p1, p0))
    t = [b - d10 / d00 * a for a, b in zip(p0, p1)]  # t ⊥ p0
    eps = 1e-3
    n0 = d00 ** 0.5
    v1 = [x + eps * a / n0 for x, a in zip(t, p0)]  # just above plane 0
    v2 = [x - eps * a / n0 for x, a in zip(t, p0)]  # just below plane 0

    union = _vecs(spark, [(1, v1), (2, v2)])
    assert lsh_blocked_pairs(union, 0.99, DIM, n_planes=2).count() == 0
    mp = lsh_blocked_pairs(union, 0.99, DIM, n_planes=2,
                           probe_bits=1).collect()
    assert [(r.id_a, r.id_b) for r in mp] == [(1, 2)]
    assert mp[0].cos_sim >= 0.999

    # streaming twin: the pair is found CROSS-BATCH against the stored
    # index via the batch side's Hamming-ball probe
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    embedding_dedup_batch(_vecs(spark, [(1, v1)]), 0, index_dir,
                          pairs_dir, DIM, n_planes=2, threshold=0.99,
                          probe_bits=1)
    embedding_dedup_batch(_vecs(spark, [(2, v2)]), 1, index_dir,
                          pairs_dir, DIM, n_planes=2, threshold=0.99,
                          probe_bits=1)
    got = {(r.id_a, r.id_b, r.cos_sim) for r in
           spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
           .drop("batch").collect()}
    assert got == {(r.id_a, r.id_b, r.cos_sim) for r in mp}

    # a mid-stream probe_bits change would make pair recall
    # batch-dependent: the sidecar refuses it
    with pytest.raises(ValueError, match="silently missed"):
        embedding_dedup_batch(_vecs(spark, [(3, v1)]), 2, index_dir,
                              pairs_dir, DIM, n_planes=2, threshold=0.99)


def _h60s(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16) & ((1 << 60) - 1)


def test_hamming_stream_matches_batch_pairs(spark, tmp_path):
    """Accumulated hamming_dedup_batch pairs over a 3-batch split equal
    one hamming_banded_pairs run over the union (keys are plan-time
    constants), and the shared component table drives keep-one."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_pairs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        hamming_dedup_batch,
        read_components,
    )

    base = _h60s("imgA")
    rows = [
        [(1, base), (2, _h60s("imgB"))],
        [(10, base), (11, _h60s("imgC"))],          # exact dup of 1
        [(20, base ^ 0b101), (21, _h60s("imgD"))],  # h=2 from 1/10
    ]
    idir, pdir, cdir = (str(tmp_path / d) for d in
                        ("index", "pairs", "comp"))
    for i, batch in enumerate(rows):
        hamming_dedup_batch(
            spark.createDataFrame(batch, "id long, sh long"), i, idir,
            pdir, components_dir=cdir)
    got = {(r.id_a, r.id_b, r.hamming) for r in
           spark.read.parquet(pdir).collect()}
    union = spark.createDataFrame([r for b in rows for r in b],
                                  "id long, sh long")
    want = {(r.id_a, r.id_b, r.hamming) for r in
            hamming_banded_pairs(union).collect()}
    assert got == want
    assert (1, 10, 0) in got and (1, 20, 2) in got and (10, 20, 2) in got
    comps = {r.id: r.component for r in
             read_components(spark, cdir).collect()}
    assert comps[1] == comps[10] == comps[20] == 1
    # keep-one: min id per component survives
    keep = {i for i, c in comps.items() if c == i}
    assert keep == {1, 2, 11, 21}


def test_hamming_stream_replay_sidecar_and_compaction(spark, tmp_path):
    """Replayed batches rewrite their partitions byte-identically, a
    parameter change refuses against the sidecar, and replay AFTER
    compact_dedup_index stays self-pair-free."""
    import pytest

    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_dedup_index,
        hamming_dedup_batch,
    )

    rows = [[(1, _h60s("x")), (2, _h60s("x"))],
            [(10, _h60s("x")), (11, _h60s("y"))]]
    idir, pdir = str(tmp_path / "index"), str(tmp_path / "pairs")
    dfs = [spark.createDataFrame(b, "id long, sh long") for b in rows]
    for i, df in enumerate(dfs):
        hamming_dedup_batch(df, i, idir, pdir)
    before = {(r.id_a, r.id_b) for r in spark.read.parquet(pdir).collect()}
    assert before == {(1, 2), (1, 10), (2, 10)}

    # replay batch 1 → identical pairs
    hamming_dedup_batch(dfs[1], 1, idir, pdir)
    assert {(r.id_a, r.id_b) for r in
            spark.read.parquet(pdir).collect()} == before

    # parameter drift refuses against the sidecar
    with pytest.raises(ValueError, match="built with"):
        hamming_dedup_batch(dfs[1], 2, idir, pdir, bits_per_table=14)

    # the sidecar pins the CONCRETE position lists, not just the seed:
    # a store whose sidecar lacks them (or carries different lists —
    # e.g. keys cut by a drifted derivation) refuses instead of
    # silently missing every cross-batch pair
    import json

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        banded_bit_positions,
    )

    sidecar = tmp_path / "index" / "_mih_params.json"
    crc = tmp_path / "index" / "._mih_params.json.crc"
    have = json.loads(sidecar.read_text())
    assert have["positions"] == banded_bit_positions(60, 16, 16)
    assert have["bit_plan"] == "md5-fisher-yates"
    legacy = {k: v for k, v in have.items()
              if k not in ("positions", "bit_plan")}
    crc.unlink(missing_ok=True)   # direct rewrite invalidates hadoop crc
    sidecar.write_text(json.dumps(legacy))
    # a pre-upgrade (Random.sample-era) sidecar fails with an error
    # NAMING the derivation change, not a generic parameter diff
    with pytest.raises(ValueError, match="md5-Fisher-Yates"):
        hamming_dedup_batch(dfs[1], 2, idir, pdir)
    # an r11-era sidecar (positions present, bit_plan tag predating)
    # keeps working — the tag is backfilled, behavior-identical
    r11 = {k: v for k, v in have.items() if k != "bit_plan"}
    sidecar.write_text(json.dumps(r11))
    hamming_dedup_batch(dfs[1], 1, idir, pdir)
    sidecar.write_text(json.dumps(have))

    # compact, then replay: the a.id != b.id guard keeps it harmless
    assert compact_dedup_index(spark, idir) == 2
    hamming_dedup_batch(dfs[1], 1, idir, pdir)
    assert {(r.id_a, r.id_b) for r in
            spark.read.parquet(pdir).collect()} == before
