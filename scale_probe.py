"""Builder-side scale probe for the near-dup pair generators.

The fixtures stop at sf0.1, but the pair volume of banded/blocked joins is
the quantity that decides 100 TB viability: candidate pairs grow
quadratically in HOT BUCKET size, not corpus size, so the probe replicates
the sf0.1 documents table Nx (each replica re-salted so replicas do not
collide with each other — corpus growth without artificial cross-replica
dup inflation, the shape of a sharded crawl) and measures how band/block
collision counts, final pair counts, and wall time actually curve.

Usage: python scale_probe.py [replicas ...]   (default: 1 2 5 10)
       python scale_probe.py stream [n [compact_at]]
           streaming-corpus-funnel probe: n replicas arrive as n
           micro-batches (+ one recrawl batch duplicating batch 0);
           measures PER-BATCH wall as the persistent state grows — the
           flat curve that makes streaming/corpus_stream.py the 100 TB
           operating mode. With compact_at=k, compact_corpus_state runs
           IN THE LOOP after batch k (state file census before/after,
           post-compaction batch wall, replay-after-compaction
           idempotence check).
       python scale_probe.py ann [n_replicas [n_queries]]
           batched-kNN probe: corpus = embeddings replicated N× in a
           stored cell-partitioned IVF index; measures ivf_search_batch
           (all queries, one job) against the per-query ivf_search loop
           — the job-amortization win of the kNN join.
       python scale_probe.py finalize [replicas ...]
           finalize-artifact probe: seeded-epoch-shuffled training-shard
           write over N replicas — the quiesce-time job; expected linear.
       python scale_probe.py possize [n]
           positional-vs-flat BM25 index sizing: both modes indexed at
           an n-times corpus, compacted with the byte-based auto-sizer;
           reports MB, width ratio, folded file counts
       python scale_probe.py phrasej [n]
           rarest-first phrase-chain probe: first-join intermediate
           rows under phrase order vs df order on a corpus with a
           common lead word and a rare tail word
       python scale_probe.py span [replicas ...]
           shared-span probe: common_span_pairs (positional-shingle
           equi-join + diagonal islands) over N re-salted replicas with
           the document-frequency cap on — pair volume and wall should
           curve ~linearly in corpus size once max_df bounds per-hash
           fan-out.
       python scale_probe.py mih [replicas ...]
           banded multi-index hashing probe: candidate collisions and
           verified pairs for hamming_banded_pairs (16 tables x 16-bit
           sampled keys) vs the complete radius-6 pigeonhole join over
           the same simhash table — the subquadratic-vs-quadratic curve
           that makes the banded path the corpus-wide image/simhash
           near-dup tool.
       python scale_probe.py imih [replicas ...]
           incremental-Hamming probe: banded multi-index built once per
           corpus size, one exact-recrawl batch probed against it vs
           the full banded recompute — flat-vs-linear, the
           incremental_hamming_pairs justification.
       python scale_probe.py incr [replicas ...]
           incremental-dedup probe: corpus = N replicas with a parquet
           LSH index built ONCE; batch = one fresh replica duplicating
           replica 0 (a recrawl). Measures batch-vs-index incremental
           dedup wall time against the full-corpus recompute as the
           corpus grows — the flat-vs-linear curve that justifies
           `incremental_minhash_pairs` at 100 TB.
Writes nothing outside /tmp; results are recorded in SCALE.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark import get_spark
from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    _banded_pairs,
    minhash_similarity,
    simhash_candidates,
    simhash_table,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load

SF_DIR = "/root/testdata/sf0.1"


def _replica(base, r: int):
    """Replica r of the documents table: ids offset by r*10^7, every
    token suffixed per replica (see replicate_documents)."""
    return base.select(
        (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
        (F.regexp_replace("text", r"(\S+)", f"$1x{r}")
         if r else F.col("text")).alias("text"),
    )


def replicate_documents(spark, n: int):
    """n copies of documents; replica r's doc_ids are offset by r*10^7 and
    EVERY token gets a per-replica suffix (the same rewrite within a
    replica preserves its internal dup structure exactly, while making
    every cross-replica shingle hash distinct — a one-token salt would
    leave simhashes nearly identical across replicas and fabricate a
    quadratic blowup). Pair volume should then scale ~linearly in n; a
    superlinear curve means hot buckets, not corpus size, are driving."""
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [_replica(base, r) for r in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe(spark, docs, label: str) -> dict:
    docs = docs.localCheckpoint(eager=True)  # materialize: probe the joins
    n_docs = docs.count()
    res = {"label": label, "docs": n_docs}

    t0 = time.time()
    cand = _banded_pairs(docs, "text", "doc_id", 32, 8, 3)
    res["minhash_band_collisions"] = cand.count()
    res["minhash_collision_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res["minhash_pairs"] = minhash_similarity(docs, threshold=0.3).count()
    res["minhash_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sh = simhash_table(docs, bits=60)
    blocked = sh.select("id", F.posexplode(F.array(*[
        F.shiftright("sh", o).bitwiseAND((1 << s) - 1)
        for o, s in zip([0, 9, 18, 27, 35, 43, 51], [9, 9, 9, 8, 8, 8, 9])
    ])).alias("blk", "blk_val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    res["simhash_block_collisions"] = a.join(
        b, (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.blk_val") == F.col("b.blk_val"))
        & (F.col("a.id") < F.col("b.id"))).count()
    res["simhash_collision_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res["simhash_pairs"] = simhash_candidates(
        docs, bits=60, max_hamming=6, blocks=7).count()
    res["simhash_s"] = round(time.time() - t0, 1)
    return res


def probe_spans(spark, n: int) -> dict:
    """Shared-span detection over n replicas (each internally identical
    to sf0.1 documents, cross-replica shingles distinct by the re-salt):
    with max_df capping per-hash fan-out, matches come only from
    within-replica repeats, so pair volume and wall should both scale
    ~linearly in n."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    docs = replicate_documents(spark, n).localCheckpoint(eager=True)
    n_docs = docs.count()
    t0 = time.time()
    cnt = common_span_pairs(docs, window=8, min_span=12, max_df=20).count()
    return {"label": f"{n}x", "docs": n_docs, "span_pairs": cnt,
            "span_s": round(time.time() - t0, 1)}


def probe_mih(spark, n: int) -> dict:
    """Banded multi-index hashing vs the pigeonhole bit-block join over
    the SAME 60-bit simhash table (n re-salted replicas): candidate
    collision volume and verified-pair wall for each. The pigeonhole
    join's radius-6 blocks are ~8.5 bits wide (2^8.5 buckets → measured
    quadratic collisions); the banded tables are 16 bits wide (2^16
    buckets → the same intrinsic n²-random term at a ~180× smaller
    constant, at the cost of ≈0.91 recall at h=6,
    operators/dedup.banded_hamming_recall). Measured: SCALE.md round-10
    table (71× fewer candidates at 10×, flat wall, linear true pairs)."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        banded_bit_positions,
        hamming_banded_pairs,
    )

    docs = replicate_documents(spark, n).localCheckpoint(eager=True)
    sh = simhash_table(docs, bits=60).localCheckpoint(eager=True)
    res = {"label": f"{n}x", "docs": sh.count()}

    # pigeonhole: radius-6 complete blocking (7 blocks over 60 bits)
    t0 = time.time()
    blocked = sh.select("id", F.posexplode(F.array(*[
        F.shiftright("sh", o).bitwiseAND((1 << s) - 1)
        for o, s in zip([0, 9, 18, 27, 35, 43, 51], [9, 9, 9, 8, 8, 8, 9])
    ])).alias("blk", "blk_val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    res["pigeon_coll"] = a.join(
        b, (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.blk_val") == F.col("b.blk_val"))
        & (F.col("a.id") < F.col("b.id"))).count()
    res["pigeon_s"] = round(time.time() - t0, 1)

    # banded MIH: 16 tables × 16-bit sampled keys, same radius
    t0 = time.time()
    keys = []
    for pos in banded_bit_positions(60, 16, 16):
        key = F.lit(0).cast("long")
        for i, p in enumerate(pos):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright("sh", p).bitwiseAND(1), i))
        keys.append(key)
    tabled = sh.select("id", F.posexplode(F.array(*keys))
                       .alias("tbl", "key"))
    a, b = tabled.alias("a"), tabled.alias("b")
    res["banded_coll"] = a.join(
        b, (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.id") < F.col("b.id"))).count()
    res["banded_coll_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res["banded_pairs"] = hamming_banded_pairs(
        sh, 60, max_hamming=6, n_tables=16, bits_per_table=16).count()
    res["banded_s"] = round(time.time() - t0, 1)
    return res


def probe_incremental_hamming(spark, n: int, tmp: str) -> dict:
    """The Hamming twin of the incremental probe: corpus = n replicas'
    simhash table stored ONCE as a banded multi-index parquet; batch =
    one exact-recrawl replica of replica 0. Measures the batch-vs-index
    probe against the full banded recompute as the corpus grows — the
    flat-vs-linear curve that justifies incremental_hamming_pairs for
    perceptual-hash dedup at 100 TB."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_index,
        hamming_banded_pairs,
        incremental_hamming_pairs,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    batch_docs = base.select(
        (F.col("doc_id") + F.lit(n * 10_000_000)).alias("doc_id"),
        F.col("text")).localCheckpoint(eager=True)
    corpus_sh = simhash_table(corpus, bits=60).localCheckpoint(eager=True)
    batch_sh = simhash_table(batch_docs, bits=60) \
        .localCheckpoint(eager=True)

    res = {"label": f"{n}x", "corpus_docs": corpus_sh.count(),
           "batch_docs": batch_sh.count()}
    idx_path = f"{tmp}/mih_index_{n}x"
    t0 = time.time()
    hamming_banded_index(corpus_sh).write.mode("overwrite") \
        .parquet(idx_path)
    res["index_build_s"] = round(time.time() - t0, 1)

    index = spark.read.parquet(idx_path)
    t0 = time.time()
    res["incr_pairs"] = incremental_hamming_pairs(
        batch_sh, index, max_hamming=6).count()
    res["incr_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res["full_pairs"] = hamming_banded_pairs(
        corpus_sh.unionByName(batch_sh), max_hamming=6).count()
    res["full_s"] = round(time.time() - t0, 1)
    return res


def probe_incremental(spark, n: int, tmp: str) -> dict:
    """Corpus = n replicas; batch = one fresh replica whose texts
    duplicate replica 0 (ids offset — an exact-recrawl batch, the
    worst-case match volume). The corpus index is built ONCE and read
    back from parquet — its build time is amortized across every future
    batch, so the incremental number is join-probe cost only."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_index,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    batch = base.select(
        (F.col("doc_id") + F.lit(n * 10_000_000)).alias("doc_id"),
        F.col("text")).localCheckpoint(eager=True)

    res = {"label": f"{n}x", "corpus_docs": corpus.count(),
           "batch_docs": batch.count()}
    idx_path = f"{tmp}/index_{n}x"
    t0 = time.time()
    minhash_band_index(corpus).write.mode("overwrite").parquet(idx_path)
    res["index_build_s"] = round(time.time() - t0, 1)

    index = spark.read.parquet(idx_path)
    t0 = time.time()
    res["incr_pairs"] = incremental_minhash_pairs(
        batch, index, threshold=0.3).count()
    res["incr_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res["full_pairs"] = minhash_similarity(
        corpus.unionByName(batch), threshold=0.3).count()
    res["full_s"] = round(time.time() - t0, 1)
    return res


def probe_funnel(spark, n: int) -> dict:
    """Wall-clock of the COMPOSED corpus funnel (build_training_corpus:
    quality filter → exact dedup → MinHash near-dup keep-one → decontam →
    no sampling cap) at an N× corpus. The stages are probed individually
    elsewhere; this measures the composition — dominated by the near-dup
    clustering (pair join + connected-components rounds)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )

    docs = (replicate_documents(spark, n)
            .withColumn("lang", F.lit("en"))
            .localCheckpoint(eager=True))
    bench = (load(spark, SF_DIR, "documents")
             .filter(F.col("doc_id") >= 4900).select("doc_id", "text"))
    res = {"label": f"{n}x", "docs": docs.count()}
    t0 = time.time()
    out = build_training_corpus(docs, benchmark=bench, min_quality=0.4,
                                near_dup_threshold=0.5)
    res["survivors"] = out.count()
    res["funnel_s"] = round(time.time() - t0, 1)
    return res


def _state_file_census(cdir: str) -> dict[str, tuple[int, int]]:
    """(partition dirs, parquet part files) per state table — the
    listing+open cost the per-batch state SCAN pays, which compaction
    exists to bound."""
    import os

    out = {}
    for name in ("fingerprints", "index", "components", "idwatermark"):
        root = f"{cdir}/{name}"
        if not os.path.isdir(root):
            continue
        parts = [d for d in os.listdir(root) if d.startswith("batch=")]
        files = sum(
            1 for d in parts for f in os.listdir(f"{root}/{d}")
            if f.endswith(".parquet"))
        out[name] = (len(parts), files)
    return out


def probe_corpus_stream(spark, n: int, tmp: str,
                        compact_at: int | None = None) -> list[dict]:
    """Per-batch wall of the STREAMING corpus funnel
    (streaming/corpus_stream.corpus_batch) as the persistent state
    accumulates: the corpus arrives as n micro-batches of one replica
    each, plus a FINAL recrawl batch that exactly duplicates replica 0
    (worst-case cross-batch match volume against the oldest state).

    The 100 TB claim under test: batch k's wall must NOT grow with k —
    each batch's cross-batch work is a keyed probe of parquet state
    (fingerprints, LSH index, components), never a corpus rescan — while
    re-running the batch funnel at each delivery would cost O(corpus) per
    delivery. A flat curve here is what makes the streaming funnel the
    correct operating mode for a continuously-fed corpus.

    ``compact_at=k`` additionally runs ``compact_corpus_state``
    IN THE LOOP after batch k — measuring (a) the compaction wall itself,
    (b) the state partition/file census before and after (the listing+
    open term the compaction bounds), (c) whether the post-compaction
    per-batch wall drops, and (d) replay idempotence: batch k is replayed
    against the compacted state at the end and the survivor count must
    be unchanged."""
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        compact_corpus_state,
        corpus_batch,
        read_corpus,
    )

    cdir = f"{tmp}/corpus_stream_{n}x"
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = []
    batches = [(i, _replica(base, i)) for i in range(n)]
    # recrawl batch: replica 0's texts under fresh ids
    batches.append((n, _replica(base, 0).select(
        (F.col("doc_id") + F.lit(n * 10_000_000)).alias("doc_id"),
        "text")))
    replay = None
    for i, batch in batches:
        batch = batch.localCheckpoint(eager=True)
        t0 = time.time()
        corpus_batch(batch, i, cdir, min_quality=0.4,
                     near_dup_threshold=0.5)
        rows.append({"batch": i, "docs": batch.count(),
                     "wall_s": round(time.time() - t0, 1),
                     "recrawl": i == n})
        if compact_at is not None and i == compact_at:
            replay = batch  # keep for the replay-after-compaction check
            before = _state_file_census(cdir)
            t0 = time.time()
            compact_corpus_state(spark, cdir)
            after = _state_file_census(cdir)
            rows.append({
                "batch": f"compact@{i}", "docs": None,
                "wall_s": round(time.time() - t0, 1), "recrawl": False,
                "note": "state parts/files " + " ".join(
                    f"{k}:{b[0]}/{b[1]}->{a[0]}/{a[1]}"
                    for (k, b), (_, a) in zip(sorted(before.items()),
                                              sorted(after.items())))})
    survivors = read_corpus(spark, cdir).count()
    rows.append({"batch": "total", "docs": None,
                 "wall_s": round(sum(r["wall_s"] for r in rows), 1),
                 "recrawl": False, "survivors": survivors})
    if replay is not None:
        t0 = time.time()
        corpus_batch(replay, compact_at, cdir, min_quality=0.4,
                     near_dup_threshold=0.5)
        again = read_corpus(spark, cdir).count()
        rows.append({"batch": f"replay@{compact_at}", "docs": None,
                     "wall_s": round(time.time() - t0, 1),
                     "recrawl": False,
                     "note": ("idempotent" if again == survivors else
                              f"SURVIVORS CHANGED {survivors}->{again}")})
    return rows


def probe_finalize(spark, n: int, tmp: str) -> dict:
    """Finalize-artifact probe: write a seeded-epoch-shuffled training
    shard set over N replicas of sf0.1 documents and measure the wall.
    Expected shape: LINEAR in corpus size — the job is one scan (tokens +
    shuffle key are column expressions), one repartition on shard, one
    within-partition window+sort, one write; a superlinear curve would
    mean the window or the write is not staying per-shard."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        write_training_shards,
    )

    docs = replicate_documents(spark, n)
    out = f"{tmp}/shards_{n}"
    t0 = time.time()
    write_training_shards(docs, out, n_shards=32, budget_tokens=2048,
                          shuffle_epoch=0)
    wall = round(time.time() - t0, 1)
    rows = spark.read.parquet(out).count()
    return {"label": f"{n}x", "docs": rows, "wall_s": wall}


def probe_ann(spark, n: int, n_queries: int, tmp: str) -> dict:
    """Corpus = sf0.1 embeddings replicated n× (ids offset; vectors
    perturbed per replica by a deterministic per-dim rotation so
    replicas spread over cells), indexed ONCE into the stored
    cell-partitioned IVF layout. Measures the batched kNN join
    (ivf_search_batch: one job for all queries) against the per-query
    ivf_search loop (one driver-ranked job each) at the same k/n_probe —
    the per-query fixed cost (plan + scan setup) is what the batched
    join amortizes."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
        ivf_search,
        ivf_search_batch,
    )

    base = load(spark, SF_DIR, "embeddings")
    dim = len(base.select("embedding").head()[0])
    parts = [base.select(
        (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.lit(0.01 * r) * F.cos(i + F.lit(r)))
        .alias("embedding")) for r in range(n)]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.localCheckpoint(eager=True)
    res = {"corpus": corpus.count(), "queries": n_queries}

    cents = train_ivf_centroids(base, k=16, dim=dim)
    idir = f"{tmp}/ivf_{n}x"
    t0 = time.time()
    ivf_index_batch(corpus, 0, idir, cents)
    res["index_s"] = round(time.time() - t0, 1)

    qrows = base.orderBy("vec_id").limit(n_queries).collect()
    queries = spark.createDataFrame(
        [(r.vec_id, list(r.embedding)) for r in qrows],
        "query_id long, embedding array<double>")
    t0 = time.time()
    res["batched_rows"] = ivf_search_batch(
        spark, idir, queries, cents, k=10, n_probe=2).count()
    res["batched_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    loop_rows = 0
    for r in qrows:
        loop_rows += len(ivf_search(spark, idir, list(r.embedding), cents,
                                    k=10, n_probe=2).collect())
    res["loop_rows"] = loop_rows
    res["loop_s"] = round(time.time() - t0, 1)

    # int8 twin: same corpus, quantized index — measures the build cost
    # delta, the on-disk compression, and the searched-bytes win of the
    # integer scoring path
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        quantize_vec_int8,
        quantized_cosine_topk,  # noqa: F401 — parity twin, probed via search
    )

    qdir = f"{tmp}/ivfq_{n}x"
    t0 = time.time()
    ivf_index_batch(corpus, 0, qdir, cents, quantize=True)
    res["q_index_s"] = round(time.time() - t0, 1)

    def _du(path):
        import os

        total = 0
        for root, _, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
        return total

    res["index_mb"] = round(_du(idir) / 1e6, 1)
    res["q_index_mb"] = round(_du(qdir) / 1e6, 1)

    t0 = time.time()
    qloop_rows = 0
    for r in qrows:
        qloop_rows += len(ivf_search(spark, qdir, list(r.embedding),
                                     cents, k=10, n_probe=2,
                                     quantized=True).collect())
    res["q_loop_rows"] = qloop_rows
    res["q_loop_s"] = round(time.time() - t0, 1)
    return res


def probe_pq(spark, n: int, n_queries: int, tmp: str) -> dict:
    """PQ compression economics at n× the sf0.1 embeddings (same
    replication as probe_ann): index bytes float vs int8 vs PQ(m=8),
    per-query ADC search wall vs the float/int8 loops, and the
    brute-force PQ scan vs exact cosine — the scan-size-vs-recall trade
    the 100 TB corpus actually buys."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_topk,
        pq_adc_topk,
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
        ivf_search,
    )

    base = load(spark, SF_DIR, "embeddings")
    dim = len(base.select("embedding").head()[0])
    parts = [base.select(
        (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.lit(0.01 * r) * F.cos(i + F.lit(r)))
        .alias("embedding")) for r in range(n)]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.localCheckpoint(eager=True)
    res = {"corpus": corpus.count(), "queries": n_queries}

    cents = train_ivf_centroids(base, k=16, dim=dim)
    t0 = time.time()
    books = train_pq_codebooks(base, m=8, ksub=64, dim=dim, max_iter=5)
    res["train_s"] = round(time.time() - t0, 1)

    def _du(path):
        import os

        total = 0
        for root, _, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
        return total

    dirs = {}
    for mode, kw in [("float", {}), ("int8", {"quantize": True}),
                     ("pq", {"pq_codebooks": books})]:
        d = f"{tmp}/pq_{mode}_{n}x"
        t0 = time.time()
        ivf_index_batch(corpus, 0, d, cents, **kw)
        res[f"{mode}_build_s"] = round(time.time() - t0, 1)
        res[f"{mode}_mb"] = round(_du(d) / 1e6, 1)
        dirs[mode] = d

    qrows = base.orderBy("vec_id").limit(n_queries).collect()
    for mode, kw in [("float", {}), ("int8", {"quantized": True}),
                     ("pq", {"pq_codebooks": books})]:
        t0 = time.time()
        rows = 0
        for r in qrows:
            rows += len(ivf_search(spark, dirs[mode], list(r.embedding),
                                   cents, k=10, n_probe=2,
                                   **kw).collect())
        res[f"{mode}_loop_s"] = round(time.time() - t0, 1)
        res[f"{mode}_loop_rows"] = rows

    # brute force over the whole corpus: exact cosine vs full-scan ADC
    q0 = list(qrows[0].embedding)
    t0 = time.time()
    cosine_topk(corpus, q0, k=10).collect()
    res["brute_exact_s"] = round(time.time() - t0, 1)
    enc = pq_encode(corpus, books).localCheckpoint(eager=True)
    t0 = time.time()
    pq_adc_topk(enc, q0, books, k=10).collect()
    res["brute_adc_s"] = round(time.time() - t0, 1)
    return res


def probe_pqres(spark, n: int, n_queries: int, tmp: str) -> dict:
    """Residual-PQ (IVFADC) vs raw-PQ recall at the SAME m over a
    CLUSTERED corpus — the shape real embeddings have and the setting
    where residual encoding pays (on the near-random sf embeddings the
    two tie; the fixture-scale pin lives in tests/test_ann_recall.py).
    Corpus: n×5,000 md5-deterministic points around 64 anchors (the
    coarse quantizer gets one cell per anchor), everything generated
    IN-PLAN — no driver loop. Measures index build walls (identical
    bytes by construction — same m), the probed ADC search loop, and
    recall@10 vs per-query exact cosine."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_topk,
        ivf_residuals,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
        ivf_search,
    )

    dim, n_anchor, m, ksub = 64, 64, 8, 16

    def _hf(key, salt):
        return hash_fraction(key, salt)

    anchor = (F.col("vec_id") % n_anchor).cast("string")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (2.0 * _hf(F.concat(anchor, F.lit(":"),
                                      i.cast("string")), "anch") - 1.0)
        + 0.15 * (2.0 * _hf(F.concat(F.col("vec_id").cast("string"),
                                     F.lit(":"), i.cast("string")),
                            "jit") - 1.0))
    corpus = (spark.range(n * 5000)
              .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
              .localCheckpoint(eager=True))
    res = {"corpus": corpus.count(), "queries": n_queries}

    sample = corpus.filter(F.col("vec_id") < 5000)
    t0 = time.time()
    cents = train_ivf_centroids(sample, k=n_anchor, dim=dim, max_iter=4)
    res["cent_train_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    raw_books = train_pq_codebooks(sample, m, ksub, dim, max_iter=3)
    res["raw_train_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res_books = train_pq_codebooks(
        ivf_residuals(sample, cents), m, ksub, dim,
        vec_col="residual", max_iter=3)
    res["res_train_s"] = round(time.time() - t0, 1)

    dirs = {}
    for mode, books, kw in [("raw", raw_books, {}),
                            ("res", res_books, {"pq_residual": True})]:
        d = f"{tmp}/pqres_{mode}_{n}x"
        t0 = time.time()
        ivf_index_batch(corpus, 0, d, cents, pq_codebooks=books, **kw)
        res[f"{mode}_build_s"] = round(time.time() - t0, 1)
        dirs[mode] = d

    qrows = corpus.orderBy("vec_id").limit(n_queries).collect()
    truths = {}
    t0 = time.time()
    for r in qrows:
        truths[r.vec_id] = {
            x.vec_id for x in cosine_topk(
                corpus.filter(F.col("vec_id") != r.vec_id),
                list(r.embedding), k=10).collect()}
    res["exact_loop_s"] = round(time.time() - t0, 1)
    for mode, books, kw in [("raw", raw_books, {}),
                            ("res", res_books, {"pq_residual": True})]:
        t0 = time.time()
        hit = 0
        for r in qrows:
            got = [x.vec_id for x in ivf_search(
                spark, dirs[mode], list(r.embedding), cents, k=11,
                n_probe=4, pq_codebooks=books, **kw).collect()
                if x.vec_id != r.vec_id][:10]
            hit += len(set(got) & truths[r.vec_id])
        res[f"{mode}_loop_s"] = round(time.time() - t0, 1)
        res[f"{mode}_recall"] = round(hit / (10 * len(qrows)), 3)
    return res


def probe_demb(spark, n: int) -> dict:
    """Model-backed document embeddings at n× the sf0.1 documents:
    wall should stay linear — the shuffle moves distinct-token partials
    (Zipf-bounded), the model table broadcasts, one groupBy(doc)."""
    import os

    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
        parse_vec_model,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "lid_mini.vec")
    vecs = parse_vec_model(spark, path, dim=5)
    # id-offset-only replication (no token suffix): doc_embedding is a
    # per-document projection + Zipf-bounded partials, so identical
    # texts across replicas measure the real shape — and the model must
    # still COVER the replicas (the dedup probes' suffix would make
    # every replica OOV)
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [base.select(
        (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
        "text") for r in range(n)]
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    t0 = time.time()
    out = doc_embedding(docs, vecs, dim=5)
    cnt = out.count()
    covered = out.filter(F.col("embedding").isNotNull()).count()
    return {"label": f"{n}x", "docs": cnt, "covered": covered,
            "wall_s": round(time.time() - t0, 1)}


def probe_bm25(spark, n: int, n_queries: int, tmp: str) -> dict:
    """Lexical-search probe: documents replicated n× (per-replica token
    suffix → vocabulary grows n×, each replica keeps its internal df
    structure — the sharded-crawl shape), postings indexed ONCE into
    the bucket-partitioned store. The claim under test: ad-hoc
    bm25_topk re-derives the posting table per query, so its per-query
    wall grows with the corpus; bm25_search over the PERSISTED index
    reads only the probed buckets (partition pruning + term pushdown),
    so its per-query wall should stay ~flat as n grows; the batched
    join amortizes job overhead across all queries in one plan."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_join,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_batch,
        bm25_search,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    res = {"docs": corpus.count(), "queries": n_queries}

    # query terms: replica-0 vocabulary pairs, cycled deterministically
    base_vocab = sorted({w for r in
                         load(spark, SF_DIR, "documents")
                         .select("text").limit(200).collect()
                         for w in (r.text or "").lower().split()})
    qtexts = [f"{base_vocab[i % len(base_vocab)]} "
              f"{base_vocab[(i * 7 + 3) % len(base_vocab)]}"
              for i in range(n_queries)]

    idir = f"{tmp}/bm25_{n}x"
    t0 = time.time()
    bm25_index_batch(corpus, 0, idir, n_buckets=64)
    res["index_s"] = round(time.time() - t0, 1)

    import os as _os
    res["index_mb"] = round(sum(
        _os.path.getsize(_os.path.join(root, f))
        for root, _, files in _os.walk(idir) for f in files) / 1e6, 1)

    # one untimed query per path first: the first plan in a session pays
    # whole-stage codegen compilation, which would land entirely on the
    # path that happens to run first
    bm25_topk(corpus, qtexts[0].split(), k=10).collect()
    t0 = time.time()
    rows = 0
    for qt in qtexts:
        rows += len(bm25_topk(corpus, qt.split(), k=10).collect())
    res["adhoc_rows"] = rows
    res["adhoc_s"] = round(time.time() - t0, 1)

    bm25_search(spark, idir, qtexts[0].split(), k=10,
                n_buckets=64).collect()
    t0 = time.time()
    rows = 0
    for qt in qtexts:
        rows += len(bm25_search(spark, idir, qt.split(), k=10,
                                n_buckets=64).collect())
    res["stored_rows"] = rows
    res["stored_s"] = round(time.time() - t0, 1)

    queries = spark.createDataFrame(
        list(enumerate(qtexts)), "query_id long, text string")
    t0 = time.time()
    res["batched_rows"] = bm25_topk_join(queries, corpus, k=10).count()
    res["batched_s"] = round(time.time() - t0, 1)

    # the at-scale query shape: ONE plan over the persisted index —
    # batched-join economics AND the index's directory pruning, with
    # no per-query posting rebuild
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_search_batch,
    )

    t0 = time.time()
    res["stored_batched_rows"] = bm25_search_batch(
        spark, queries, idir, k=10, n_buckets=64).count()
    res["stored_batched_s"] = round(time.time() - t0, 1)
    return res


def probe_possize(spark, n: int, tmp: str) -> dict:
    """Positional-vs-flat index sizing probe (round 13): the same n×
    corpus indexed both ways, compacted with the byte-based
    auto-sizing — reports index MB, the width ratio, and the folded
    file counts (the auto-sizer gives the wider positional tree
    proportionally more splits once buckets exceed the 128 MB
    target; at fixture scale both land on one file per bucket)."""
    import os as _os

    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_batch,
        compact_bm25_index,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    res = {"docs": corpus.count()}

    def _mb(path):
        return round(sum(
            _os.path.getsize(_os.path.join(root, f))
            for root, _, files in _os.walk(path) for f in files) / 1e6, 2)

    def _files(path):
        return sum(1 for root, _, files in _os.walk(path)
                   for f in files if f.endswith(".parquet"))

    for mode, positional in (("flat", False), ("pos", True)):
        idir = f"{tmp}/possize_{mode}_{n}x"
        t0 = time.time()
        # two batches so the fold has real work
        bm25_index_batch(corpus.filter("doc_id % 2 = 0"), 0, idir,
                         n_buckets=64, positional=positional)
        bm25_index_batch(corpus.filter("doc_id % 2 = 1"), 1, idir,
                         n_buckets=64, positional=positional)
        res[f"{mode}_build_s"] = round(time.time() - t0, 1)
        res[f"{mode}_mb_raw"] = _mb(idir)
        t0 = time.time()
        compact_bm25_index(spark, idir, n_buckets=64)
        res[f"{mode}_compact_s"] = round(time.time() - t0, 1)
        res[f"{mode}_mb"] = _mb(idir)
        res[f"{mode}_files"] = _files(f"{idir}/gen=0/postings")
    res["width_ratio"] = round(res["pos_mb"] / res["flat_mb"], 2)
    return res


def probe_foldbytes(spark, n: int, tmp: str) -> dict:
    """Tiered-compaction write-amplification probe (round 14): a large
    base corpus is fully folded once, then three SMALL batches arrive
    and each is minor-folded. The claim under test: a minor fold's
    write (the new segment) tracks the BATCH bytes, not the index
    bytes — the pre-segment fold rewrote the whole consolidated tree
    every run, O(index). Reports per-fold batch MB vs fold-output MB
    vs total index MB across the 3 consecutive folds, plus the full
    fold's cost for contrast."""
    import os as _os

    from pyspark.sql import functions as _F

    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_batch,
        compact_bm25_index,
    )

    def _mb(path):
        if not _os.path.isdir(path):
            return 0.0
        return round(sum(
            _os.path.getsize(_os.path.join(root, f))
            for root, _, files in _os.walk(path) for f in files) / 1e6, 2)

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    idir = f"{tmp}/foldbytes_{n}x"
    bm25_index_batch(corpus, 0, idir, n_buckets=64)
    t0 = time.time()
    compact_bm25_index(spark, idir, n_buckets=64)
    res = {"docs": corpus.count(),
           "base_fold_s": round(time.time() - t0, 1),
           "base_index_mb": _mb(f"{idir}/gen=0")}
    maxid = corpus.agg(_F.max("doc_id")).first()[0]
    folds = []
    for i in range(1, 4):
        batch = corpus.filter(_F.col("doc_id") % 53 == 0).select(
            (_F.col("doc_id") + i * (maxid + 1)).alias("doc_id"),
            "text")
        bm25_index_batch(batch, i, idir, n_buckets=64)
        batch_mb = _mb(f"{idir}/postings/batch={i}")
        t0 = time.time()
        compact_bm25_index(spark, idir, n_buckets=64, max_segments=16)
        folds.append({
            "batch_mb": batch_mb,
            "fold_s": round(time.time() - t0, 1),
            "fold_mb": _mb(f"{idir}/gen=0/postings/seg={i}"),
            "index_mb": _mb(f"{idir}/gen=0")})
    res["folds"] = folds
    # contrast: the pre-segment behavior — one FULL fold of the same
    # index rewrites everything
    t0 = time.time()
    compact_bm25_index(spark, idir, n_buckets=64, full=True)
    res["full_fold_s"] = round(time.time() - t0, 1)
    res["full_fold_mb"] = _mb(f"{idir}/gen=1")
    return res


def probe_tieredbytes(spark, n: int, tmp: str) -> dict:
    """Size-tiered merge probe (round 15): equal-size batches stream
    into a BM25 index with ``max_segments=4`` — every fold past the
    threshold is a TIERED merge of the smallest half of the segments,
    never the whole index. The claim under test: fold cost at each
    threshold crossing stays bounded (tracks the small tier) while
    the index keeps growing — the pre-tiered behavior merged
    EVERYTHING into the next generation at every crossing, O(index).
    Reports per-fold new-segment MB vs total index MB vs segment
    count across ≥3 crossings."""
    import os as _os

    from pyspark.sql import functions as _F

    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        _pointer,
        bm25_index_batch,
        compact_bm25_index,
    )

    def _mb(path):
        if not _os.path.isdir(path):
            return 0.0
        return round(sum(
            _os.path.getsize(_os.path.join(root, f))
            for root, _, files in _os.walk(path) for f in files) / 1e6, 2)

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    idir = f"{tmp}/tieredbytes_{n}x"
    n_slices = 12
    folds = []
    for i in range(n_slices):
        batch = corpus.filter(_F.col("doc_id") % n_slices == i).select(
            (_F.col("doc_id") * n_slices + i).alias("doc_id"), "text")
        bm25_index_batch(batch, i, idir, n_buckets=64)
        before = set((_pointer(spark, idir)[1]) or [])
        t0 = time.time()
        compact_bm25_index(spark, idir, n_buckets=64, max_segments=4)
        _g, segs, _f, _a, _s = _pointer(spark, idir)
        new_seg = max(set(segs) - before) if set(segs) - before else None
        folds.append({
            "fold": i,
            "tiered": len(before) + 1 > 4,
            "fold_s": round(time.time() - t0, 1),
            "fold_mb": (_mb(f"{idir}/gen=0/postings/seg={new_seg}")
                        if new_seg is not None else 0.0),
            "index_mb": _mb(f"{idir}/gen=0"),
            "n_segments": len(segs)})
    return {"docs": corpus.count(), "folds": folds}


def probe_statsnap(spark, n: int, tmp: str) -> dict:
    """Pointer stats-snapshot probe (round 15): per-search fixed cost
    of the stored BM25 path on a many-segment index, WITH the
    pointer's per-segment (n_docs, sum_dl) snapshot vs the
    pre-snapshot pointer form (seg_stats stripped → stats parquet
    read per segment per search). The snapshot removes one small
    parquet scan per segment from every query's critical path."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        bm25_index_batch,
        bm25_search,
        compact_bm25_index,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    idir = f"{tmp}/statsnap_{n}x"
    for i in range(8):
        batch = corpus.filter(_F.col("doc_id") % 8 == i).select(
            (_F.col("doc_id") * 8 + i).alias("doc_id"), "text")
        bm25_index_batch(batch, i, idir, n_buckets=64)
        compact_bm25_index(spark, idir, n_buckets=64, max_segments=16)

    queries = [["government", "data"], ["policy", "report"],
               ["public", "record"], ["health", "service"],
               ["school", "budget"]]

    def run_all():
        t0 = time.time()
        for q in queries:
            bm25_search(spark, idir, q, k=10, n_buckets=64).collect()
        return round((time.time() - t0) / len(queries), 3)

    run_all()  # warm
    with_snap = run_all()
    pfile = f"{idir}/_bm25_generation.json"
    ptr = _json.loads(open(pfile).read())
    ptr.pop("seg_stats")
    crc = f"{idir}/._bm25_generation.json.crc"
    _os.path.exists(crc) and _os.unlink(crc)
    with open(pfile, "w") as fh:
        fh.write(_json.dumps(ptr))
    run_all()  # warm
    without = run_all()
    return {"docs": corpus.count(), "segments": 8,
            "per_query_s_with_snapshot": with_snap,
            "per_query_s_without": without,
            "saved_s": round(without - with_snap, 3)}


def probe_phrasej(spark, n: int, tmp: str) -> dict:
    """Rarest-first phrase-chain probe (round 13): a corpus where the
    phrase's FIRST word is everywhere and its LAST word is rare.
    Measures the first join's intermediate row count under phrase
    order vs df order (result rows are identical — the tests pin
    that); the drop is the amount of join work the reorder deletes."""
    from pyspark.sql import functions as _F

    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        clean_phrase,
        positional_postings,
    )

    corpus = replicate_documents(spark, n).localCheckpoint(eager=True)
    # every doc gains the common lead-in; a ~0.5% slice gains the full
    # rare-tailed phrase
    docs = corpus.select(
        "doc_id",
        _F.when(_F.col("doc_id") % 199 == 0,
                _F.concat_ws(" ", _F.lit("the common zebraword"),
                             _F.col("text")))
        .otherwise(_F.concat_ws(" ", _F.lit("the common filler"),
                                _F.col("text"))).alias("text"))
    words = clean_phrase(["the", "common", "zebraword"])
    pp = (positional_postings(docs)
          .filter(_F.col("term").isin(sorted(set(words))))
          .localCheckpoint(eager=True))

    def first_join_rows(chain):
        (i0, w0), (i1, w1) = chain[0], chain[1]
        base = (pp.filter(_F.col("term") == w0)
                .select("id", _F.transform(
                    "positions", lambda x: x - i0).alias("acc")))
        nxt = (pp.filter(_F.col("term") == w1)
               .select("id", _F.transform(
                   "positions", lambda x: x - i1).alias("_p")))
        return base.join(nxt, "id").count()

    t0 = time.time()
    rows_phrase = first_join_rows([(0, "the"), (1, "common")])
    t_phrase = round(time.time() - t0, 1)
    t0 = time.time()
    rows_rare = first_join_rows([(2, "zebraword"), (0, "the")])
    t_rare = round(time.time() - t0, 1)
    return {"docs": docs.count(),
            "first_join_rows_phrase_order": rows_phrase,
            "first_join_rows_rarest_first": rows_rare,
            "drop_ratio": round(rows_phrase / max(rows_rare, 1), 1),
            "phrase_order_s": t_phrase, "rarest_first_s": t_rare}


def main():
    args = sys.argv[1:]
    incremental = bool(args) and args[0] == "incr"
    imih = bool(args) and args[0] == "imih"
    mih = bool(args) and args[0] == "mih"
    span = bool(args) and args[0] == "span"
    funnel = bool(args) and args[0] == "funnel"
    stream = bool(args) and args[0] == "stream"
    ann = bool(args) and args[0] == "ann"
    bm25 = bool(args) and args[0] == "bm25"
    pq = bool(args) and args[0] == "pq"
    pqres = bool(args) and args[0] == "pqres"
    demb = bool(args) and args[0] == "demb"
    finalize = bool(args) and args[0] == "finalize"
    possize = bool(args) and args[0] == "possize"
    phrasej = bool(args) and args[0] == "phrasej"
    foldbytes = bool(args) and args[0] == "foldbytes"
    tieredbytes = bool(args) and args[0] == "tieredbytes"
    statsnap = bool(args) and args[0] == "statsnap"
    if incremental or funnel or stream or ann or finalize or span \
            or mih or imih or pq or pqres or demb or bm25 \
            or possize or phrasej or foldbytes or tieredbytes \
            or statsnap:
        args = args[1:]
    explicit = [int(x) for x in args]
    replicas = explicit or [1, 2, 5, 10]
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    spark = get_spark("scale-probe")
    try:
        if ann:
            n = explicit[0] if explicit else 10
            n_queries = explicit[1] if len(explicit) > 1 else 100
            r = probe_ann(spark, n, n_queries, tmp)
            print(f"corpus={r['corpus']} queries={r['queries']} "
                  f"index_s={r['index_s']} "
                  f"batched_s={r['batched_s']} ({r['batched_rows']} rows) "
                  f"loop_s={r['loop_s']} ({r['loop_rows']} rows)")
            print(f"float index {r['index_mb']} MB | int8 index "
                  f"{r['q_index_mb']} MB (build {r['q_index_s']}s) | "
                  f"int8 loop_s={r['q_loop_s']} ({r['q_loop_rows']} rows)")
            return
        if possize:
            n = explicit[0] if explicit else 5
            r = probe_possize(spark, n, tmp)
            print(f"docs={r['docs']}")
            for mode in ("flat", "pos"):
                print(f"{mode:>4}: build_s={r[f'{mode}_build_s']} "
                      f"raw_mb={r[f'{mode}_mb_raw']} "
                      f"compact_s={r[f'{mode}_compact_s']} "
                      f"mb={r[f'{mode}_mb']} "
                      f"files={r[f'{mode}_files']}")
            print(f"positional/flat width ratio: {r['width_ratio']}")
            return
        if foldbytes:
            n = explicit[0] if explicit else 10
            r = probe_foldbytes(spark, n, tmp)
            print(f"docs={r['docs']} base_fold_s={r['base_fold_s']} "
                  f"base_index_mb={r['base_index_mb']}")
            for i, f in enumerate(r["folds"], 1):
                print(f"minor fold {i}: batch_mb={f['batch_mb']} "
                      f"fold_mb={f['fold_mb']} fold_s={f['fold_s']} "
                      f"index_mb={f['index_mb']}")
            print(f"full fold (contrast): mb={r['full_fold_mb']} "
                  f"s={r['full_fold_s']}")
            return
        if statsnap:
            n = explicit[0] if explicit else 10
            r = probe_statsnap(spark, n, tmp)
            print(f"docs={r['docs']} segments={r['segments']} | "
                  f"per-query with snapshot "
                  f"{r['per_query_s_with_snapshot']}s vs without "
                  f"{r['per_query_s_without']}s "
                  f"(saved {r['saved_s']}s/query)")
            return
        if tieredbytes:
            n = explicit[0] if explicit else 10
            r = probe_tieredbytes(spark, n, tmp)
            print(f"docs={r['docs']} (12 equal batches, max_segments=4)")
            for f in r["folds"]:
                kind = "TIERED" if f["tiered"] else "minor "
                print(f"fold {f['fold']:>2} {kind}: "
                      f"fold_mb={f['fold_mb']} fold_s={f['fold_s']} "
                      f"index_mb={f['index_mb']} "
                      f"segs={f['n_segments']}")
            return
        if phrasej:
            n = explicit[0] if explicit else 5
            r = probe_phrasej(spark, n, tmp)
            print(f"docs={r['docs']} | first-join rows: phrase order "
                  f"{r['first_join_rows_phrase_order']} vs rarest "
                  f"first {r['first_join_rows_rarest_first']} "
                  f"(drop {r['drop_ratio']}x) | "
                  f"{r['phrase_order_s']}s vs {r['rarest_first_s']}s")
            return
        if bm25:
            n = explicit[0] if explicit else 5
            n_queries = explicit[1] if len(explicit) > 1 else 20
            r = probe_bm25(spark, n, n_queries, tmp)
            print(f"docs={r['docs']} queries={r['queries']} "
                  f"index_s={r['index_s']} index_mb={r['index_mb']}")
            print(f"adhoc_s={r['adhoc_s']} ({r['adhoc_rows']} rows) | "
                  f"stored_s={r['stored_s']} ({r['stored_rows']} rows) | "
                  f"batched_s={r['batched_s']} "
                  f"({r['batched_rows']} rows) | "
                  f"stored_batched_s={r['stored_batched_s']} "
                  f"({r['stored_batched_rows']} rows)")
            return
        if pq:
            n = explicit[0] if explicit else 10
            n_queries = explicit[1] if len(explicit) > 1 else 50
            r = probe_pq(spark, n, n_queries, tmp)
            print(f"corpus={r['corpus']} queries={r['queries']} "
                  f"codebook_train_s={r['train_s']}")
            for mode in ("float", "int8", "pq"):
                print(f"{mode:>5}: build_s={r[f'{mode}_build_s']} "
                      f"index_mb={r[f'{mode}_mb']} "
                      f"loop_s={r[f'{mode}_loop_s']} "
                      f"({r[f'{mode}_loop_rows']} rows)")
            print(f"brute exact_s={r['brute_exact_s']} "
                  f"brute adc_s={r['brute_adc_s']}")
            return
        if pqres:
            n = explicit[0] if explicit else 2
            n_queries = explicit[1] if len(explicit) > 1 else 30
            r = probe_pqres(spark, n, n_queries, tmp)
            print(f"corpus={r['corpus']} queries={r['queries']} "
                  f"cent_train_s={r['cent_train_s']} "
                  f"raw_train_s={r['raw_train_s']} "
                  f"res_train_s={r['res_train_s']} "
                  f"exact_loop_s={r['exact_loop_s']}")
            for mode in ("raw", "res"):
                print(f"{mode:>4}: build_s={r[f'{mode}_build_s']} "
                      f"loop_s={r[f'{mode}_loop_s']} "
                      f"recall@10={r[f'{mode}_recall']}")
            return
        if demb:
            print(f"{'scale':>6} {'docs':>8} {'covered':>8} {'wall_s':>7}")
            for n in replicas:
                r = probe_demb(spark, n)
                print(f"{r['label']:>6} {r['docs']:>8} "
                      f"{r['covered']:>8} {r['wall_s']:>7}")
            return
        if finalize:
            print(f"{'scale':>6} {'docs':>8} {'wall_s':>7}")
            for n in replicas:
                r = probe_finalize(spark, n, tmp)
                print(f"{r['label']:>6} {r['docs']:>8} {r['wall_s']:>7}")
            return
        if stream:
            # stream [n [compact_at]]: optional compaction-in-the-loop.
            # Bare `stream` keeps the documented default n=10; only
            # EXPLICIT args carry (n, compact_at).
            n = explicit[0] if explicit else 10
            compact_at = explicit[1] if len(explicit) > 1 else None
            print(f"{'batch':>10} {'docs':>7} {'wall_s':>7}  note")
            for r in probe_corpus_stream(spark, n, tmp, compact_at):
                note = r.get("note") or (
                    "recrawl of batch 0" if r.get("recrawl") else (
                        f"survivors={r['survivors']}" if "survivors" in r
                        else ""))
                print(f"{str(r['batch']):>10} {str(r['docs'] or ''):>7} "
                      f"{r['wall_s']:>7} {note}")
            return
        if funnel:
            print(f"{'scale':>6} {'docs':>7} {'survivors':>10} "
                  f"{'funnel_s':>9}")
            for n in replicas:
                r = probe_funnel(spark, n)
                print(f"{r['label']:>6} {r['docs']:>7} "
                      f"{r['survivors']:>10} {r['funnel_s']:>9}")
            return
        if span:
            print(f"{'scale':>6} {'docs':>8} {'span_pairs':>11} "
                  f"{'span_s':>7}")
            for n in replicas:
                r = probe_spans(spark, n)
                print(f"{r['label']:>6} {r['docs']:>8} "
                      f"{r['span_pairs']:>11} {r['span_s']:>7}")
            return
        if mih:
            print(f"{'scale':>6} {'docs':>8} {'pigeon_coll':>12} "
                  f"{'pigeon_s':>9} {'banded_coll':>12} "
                  f"{'banded_pairs':>13} {'banded_s':>9}")
            for n in replicas:
                r = probe_mih(spark, n)
                print(f"{r['label']:>6} {r['docs']:>8} "
                      f"{r['pigeon_coll']:>12} {r['pigeon_s']:>9} "
                      f"{r['banded_coll']:>12} {r['banded_pairs']:>13} "
                      f"{r['banded_s']:>9}")
            return
        if imih:
            print(f"{'scale':>6} {'corpus':>8} {'batch':>6} {'build_s':>8} "
                  f"{'incr_pairs':>11} {'incr_s':>7} {'full_pairs':>11} "
                  f"{'full_s':>7}")
            for n in replicas:
                r = probe_incremental_hamming(spark, n, tmp)
                print(f"{r['label']:>6} {r['corpus_docs']:>8} "
                      f"{r['batch_docs']:>6} {r['index_build_s']:>8} "
                      f"{r['incr_pairs']:>11} {r['incr_s']:>7} "
                      f"{r['full_pairs']:>11} {r['full_s']:>7}")
            return
        if incremental:
            print(f"{'scale':>6} {'corpus':>8} {'batch':>6} {'build_s':>8} "
                  f"{'incr_pairs':>11} {'incr_s':>7} {'full_pairs':>11} "
                  f"{'full_s':>7}")
            for n in replicas:
                r = probe_incremental(spark, n, tmp)
                print(f"{r['label']:>6} {r['corpus_docs']:>8} "
                      f"{r['batch_docs']:>6} {r['index_build_s']:>8} "
                      f"{r['incr_pairs']:>11} {r['incr_s']:>7} "
                      f"{r['full_pairs']:>11} {r['full_s']:>7}")
            return
        print(f"{'scale':>6} {'docs':>7} {'mh_coll':>9} {'mh_pairs':>9} "
              f"{'mh_s':>6} {'sh_coll':>9} {'sh_pairs':>9} {'sh_s':>6}")
        for n in replicas:
            r = probe(spark, replicate_documents(spark, n), f"{n}x")
            print(f"{r['label']:>6} {r['docs']:>7} "
                  f"{r['minhash_band_collisions']:>9} "
                  f"{r['minhash_pairs']:>9} {r['minhash_s']:>6} "
                  f"{r['simhash_block_collisions']:>9} "
                  f"{r['simhash_pairs']:>9} {r['simhash_s']:>6}")
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
