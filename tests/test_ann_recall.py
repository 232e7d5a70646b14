"""Measured recall of the approximate ANN paths against the exact
baseline (operators/similarity.py) — the accuracy half of the
recall/latency trade the docstrings describe. Ground truth is an
independent pure-Python exact top-k; recall@10 is averaged over a panel
of query vectors drawn from the corpus itself (self-queries excluded
from both sides).

Measured on the sf0.01 embeddings fixture (500 random-ish 16-dim vecs,
10-query panel, 2026-08-14) — weak cluster structure, so absolute
sign-LSH recall decays fast with plane count; the PROPERTIES the
operators sell are what the floors pin:

    n_planes   single-bucket   multi-probe(1)
        2          0.33            0.79
        4          0.10            0.42
        6          0.04            0.17
        8          0.01            0.11
    IVF (4 cells): n_probe=1 0.55, n_probe=2 0.81; exact: 1.00

i.e. multi-probe recovers 2-4× recall at every plane count, and IVF's
n_probe knob is monotone. Floors sit under the measured values so the
test pins behavior without overfitting the fixture.

int8 rows (2026-08-15, k=K+1 self-excluded protocol — see
test_quantized_paths_recall_panel): quantized brute force 1.00;
quantized IVF = float IVF exactly (0.41 / 0.67 at n_probe 1 / 2) with
identical per-cell candidate counts — per-vector symmetric int8 costs
zero measured recall at 16 dims."""

import pytest

# recall-statistics panels (monotone-knob and codebook-quality soaks, ~6 min)
# — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import math

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
    lsh_ann_topk_multiprobe,
    train_ivf_centroids,
)

K = 10
N_QUERIES = 10
N_PLANES = 2


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding").collect())
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


def _exact_topk(corpus, qid, k=K):
    q = corpus[qid]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return (sum(a * b for a, b in zip(q, v))
                / (qn * math.sqrt(sum(x * x for x in v))))

    scored = sorted(((cos(v), -i, i) for i, v in corpus.items() if i != qid),
                    reverse=True)
    return {i for _, _, i in scored[:k]}


def _recall(spark, sf_dir, corpus, fn):
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    total = 0.0
    qids = sorted(corpus)[:N_QUERIES]
    for qid in qids:
        truth = _exact_topk(corpus, qid)
        got = {r.vec_id
               for r in fn(emb.filter(F.col("vec_id") != qid),
                           corpus[qid]).collect()}
        total += len(got & truth) / K
    return total / len(qids)


def test_exact_baseline_matches_python_mirror(spark, sf_dir, corpus):
    r = _recall(spark, sf_dir, corpus,
                lambda df, q: cosine_topk(df, q, k=K))
    assert r == 1.0


def test_single_bucket_lsh_recall(spark, sf_dir, corpus):
    r = _recall(spark, sf_dir, corpus,
                lambda df, q: lsh_ann_topk(df, q, k=K, n_planes=N_PLANES))
    assert 0.15 <= r < 1.0  # real recall loss, real utility


def test_multiprobe_recovers_boundary_recall(spark, sf_dir, corpus):
    r1 = _recall(spark, sf_dir, corpus,
                 lambda df, q: lsh_ann_topk(df, q, k=K, n_planes=N_PLANES))
    rm = _recall(spark, sf_dir, corpus,
                 lambda df, q: lsh_ann_topk_multiprobe(
                     df, q, k=K, n_planes=N_PLANES, probe_bits=1))
    assert rm > r1  # probing the Hamming ball recovers boundary misses
    assert rm >= 0.55


def test_ivf_probe_count_is_monotone_recall_knob(spark, sf_dir, corpus):
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    dim = len(next(iter(corpus.values())))
    cents = train_ivf_centroids(emb, 4, dim, max_iter=5)
    r1 = _recall(spark, sf_dir, corpus,
                 lambda df, q: ivf_topk(df, q, cents, k=K, n_probe=1))
    r2 = _recall(spark, sf_dir, corpus,
                 lambda df, q: ivf_topk(df, q, cents, k=K, n_probe=2))
    assert r2 > r1
    assert r2 >= 0.6


def test_quantized_paths_recall_panel(spark, sf_dir, corpus, tmp_path):
    """int8 rows of the recall panel (measured 2026-08-15, same fixture
    and 10-query panel):

        quantized brute force          1.00   (float exact: 1.00)
        quantized IVF n_probe=1        0.41   (float IVF:   0.41)
        quantized IVF n_probe=2        0.67   (float IVF:   0.67)

    i.e. per-vector symmetric int8 costs ZERO measured recall at 16
    dims — the scales cancel out of cosine and the integer scoring is
    exact — and the candidate sets are IDENTICAL by construction
    (assignment runs on the float input at build time, pinned below by
    the per-cell row-count equality). Floors sit under the measured
    values; the float-vs-quant recall DELTA is pinned to < 0.05 so a
    quantization regression cannot hide inside a loose floor."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        quantize_int8,
        quantize_vec_int8,
        quantized_cosine_topk,
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_index_batch,
        ivf_search,
    )

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    qids = sorted(corpus)[:N_QUERIES]
    dim = len(corpus[qids[0]])

    # int8 brute force vs float exact truth
    qdf = quantize_int8(emb).select("vec_id", "codes")
    total = 0.0
    for qid in qids:
        qc, _ = quantize_vec_int8(corpus[qid])
        got = {r.vec_id for r in quantized_cosine_topk(
            qdf.filter(F.col("vec_id") != qid), qc, k=K).collect()}
        total += len(got & _exact_topk(corpus, qid)) / K
    assert total / len(qids) >= 0.9   # measured 1.0

    # int8 IVF vs float IVF over stored indexes with the SAME centroids
    cents = train_ivf_centroids(emb, 4, dim, max_iter=5)
    recalls = {}
    cell_counts = {}
    for quant in (False, True):
        d = str(tmp_path / ("q" if quant else "f"))
        ivf_index_batch(emb, 0, d, cents, quantize=quant)
        idx = spark.read.option("basePath", d).parquet(d)
        cell_counts[quant] = {
            r.ivf_cell: r.n for r in
            idx.groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()}
        for n_probe in (1, 2):
            total = 0.0
            for qid in qids:
                res = ivf_search(spark, d, corpus[qid], cents, k=K + 1,
                                 n_probe=n_probe, quantized=quant).collect()
                got = [r.vec_id for r in res if r.vec_id != qid][:K]
                total += len(set(got) & _exact_topk(corpus, qid)) / K
            recalls[(quant, n_probe)] = total / len(qids)

    # identical candidate volume: assignment ran on the float input
    assert cell_counts[True] == cell_counts[False]
    # floors under the measured values
    assert recalls[(True, 1)] >= 0.35    # measured 0.41
    assert recalls[(True, 2)] >= 0.55    # measured 0.67
    assert recalls[(True, 2)] > recalls[(True, 1)]   # knob still monotone
    # quantization may not silently cost recall vs the float path
    for n_probe in (1, 2):
        assert abs(recalls[(True, n_probe)]
                   - recalls[(False, n_probe)]) < 0.05


def _mirror_pq(corpus, books, ids):
    """Plain-Python restatement of pq_encode: argmin component-ordered
    L2 folds, ties to the smallest code, reconstruction norm from the
    codebook norms."""
    m, sub = len(books), len(books[0][0])
    out = {}
    for i in ids:
        v = corpus[i]
        codes = []
        for b in range(m):
            xb = v[b * sub:(b + 1) * sub]
            best = None
            for j, c in enumerate(books[b]):
                acc = 0.0
                for x, y in zip(xb, c):
                    acc += (x - y) * (x - y)
                if best is None or acc < best[0]:
                    best = (acc, j)
            codes.append(best[1])
        p2 = 0.0
        for b in range(m):
            acc = 0.0
            for x in books[b][codes[b]]:
                acc += x * x
            p2 += acc
        out[i] = (codes, round(math.sqrt(p2), 6))
    return out


def test_pq_encode_and_adc_match_python_mirror(spark, sf_dir, corpus):
    """PQ codes, reconstruction norms, and ADC cosine scores all equal
    the mirror; the ADC ranking equals the mirror's ranking of the
    reconstructions (the ONLY approximation is quantization error)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    m, ksub = 4, 16
    dim = len(corpus[0])
    sub = dim // m
    seeds = [corpus[i] for i in range(ksub)]
    books = [[s[b * sub:(b + 1) * sub] for s in seeds] for b in range(m)]
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") >= ksub))
    enc = {r.vec_id: (list(r.codes), r.pnorm)
           for r in pq_encode(emb, books).collect()}
    ids = sorted(i for i in corpus if i >= ksub)
    want = _mirror_pq(corpus, books, ids)
    for i in ids:
        assert enc[i][0] == want[i][0], i
        assert enc[i][1] == pytest.approx(want[i][1]), i

    q = corpus[0]
    qn = math.sqrt(sum(x * x for x in q))
    lut = [[sum(q[b * sub + i] * c[i] for i in range(sub))
            for c in books[b]] for b in range(m)]
    scored = sorted(
        ((round(sum(lut[b][want[i][0][b]] for b in range(m))
                / (want[i][1] * qn), 6), -i, i)
         for i in ids if want[i][1] > 0), reverse=True)
    want_top = [(i, s) for s, _, i in scored[:K]]
    got_top = [(r.vec_id, r.cos_sim) for r in
               pq_adc_topk(pq_encode(emb, books), q, books, k=K).collect()]
    assert [i for i, _ in got_top] == [i for i, _ in want_top]
    for (_, gs), (_, ws) in zip(got_top, want_top):
        assert gs == pytest.approx(ws)


def test_pq_trained_codebooks_beat_seed_codebooks(spark, sf_dir, corpus):
    """train_pq_codebooks converges (drift-bounded Lloyd per block) and
    the trained codebooks reconstruct with LOWER total squared error
    than the raw seed slices — training does its job — while ADC recall
    vs exact top-k stays usable."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    m, ksub = 4, 16
    dim = len(corpus[0])
    sub = dim // m
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    trained = train_pq_codebooks(emb, m, ksub, dim, max_iter=5)
    assert len(trained) == m
    assert all(len(b) == ksub and all(len(c) == sub for c in b)
               for b in trained)
    seeds = [corpus[i] for i in range(ksub)]
    seed_books = [[s[b * sub:(b + 1) * sub] for s in seeds]
                  for b in range(m)]

    def total_sqerr(books):
        ids = sorted(corpus)
        enc = _mirror_pq(corpus, books, ids)
        err = 0.0
        for i in ids:
            codes, _ = enc[i]
            for b in range(m):
                c = books[b][codes[b]]
                xb = corpus[i][b * sub:(b + 1) * sub]
                err += sum((x - y) ** 2 for x, y in zip(xb, c))
        return err

    assert total_sqerr(trained) < total_sqerr(seed_books)

    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, 3, ksub, dim)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(pq_encode(emb, trained), corpus[0][:8], trained)


def test_pq_block_count_is_monotone_recall_knob(spark, sf_dir, corpus):
    """m (bytes per vector) trades recall for compression exactly like
    n_probe trades recall for scan width: mean recall@10 over the first
    queries rises monotonically with m on the same trained pipeline.
    (The synthetic fixture's near-random vectors make PQ recall low in
    absolute terms — the measured 2026-08-15 curve is 0.16 → 0.26 →
    0.44 for m = 4 → 8 → 16 — but the KNOB, and the deterministic
    training behind it, is what this pins.)"""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    dim = len(corpus[0])
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    recalls = []
    for m in (4, 16):
        books = train_pq_codebooks(emb, m, 16, dim, max_iter=3)
        total = 0.0
        qids = sorted(corpus)[:5]
        for qid in qids:
            truth = _exact_topk(corpus, qid)
            got = {r.vec_id for r in pq_adc_topk(
                pq_encode(emb.filter(F.col("vec_id") != qid), books),
                corpus[qid], books, k=K).collect()}
            total += len(got & truth) / K
        recalls.append(total / len(qids))
    assert recalls[0] < recalls[1], recalls
    assert recalls[1] >= 0.3, recalls


def test_residual_pq_beats_raw_pq_on_clustered_vectors(spark):
    """The classic IVFADC claim (Jégou et al. 2011), measured: on
    CLUSTERED vectors — the shape real embeddings have; the coarse
    quantizer absorbs between-cluster variance — residual PQ at the
    same m reconstructs with lower total squared error AND higher
    recall@10 than raw PQ. The panel is md5-derived (12 anchors, 300
    points = anchor + bounded jitter), so every number here is exactly
    reproducible: measured 2026-08-15, recall raw 0.55 → residual
    0.61. (On the near-random embeddings fixture the two tie — no
    between-cluster variance to absorb — which is why this pin runs on
    a clustered panel.)"""
    import hashlib

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_residuals,
        pq_adc_topk,
        pq_adc_topk_residual,
        pq_encode,
        pq_encode_residual,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    def h(s, i):
        return int.from_bytes(
            hashlib.md5(f"{s}:{i}".encode()).digest()[:4], "big") / 2**32

    dim, n_anchor, n_pts = 32, 12, 300
    anchors = [[2.0 * h(f"a{a}", i) - 1.0 for i in range(dim)]
               for a in range(n_anchor)]
    pts = {}
    for p in range(n_pts):
        a = anchors[p % n_anchor]
        pts[p] = [a[i] + 0.15 * (2.0 * h(f"j{p}", i) - 1.0)
                  for i in range(dim)]
    emb = spark.createDataFrame(sorted(pts.items()),
                                "vec_id long, embedding array<double>")

    m, ksub, kcells = 4, 16, 12
    sub = dim // m
    cents = train_ivf_centroids(emb, kcells, dim, max_iter=5)
    raw_books = train_pq_codebooks(emb, m, ksub, dim, max_iter=3)
    res_books = train_pq_codebooks(
        ivf_residuals(emb, cents), m, ksub, dim,
        vec_col="residual", max_iter=3)

    # python mirrors (assignment = argmax cosine, first centroid wins;
    # codes = argmin L2, smallest j wins — both the operators' rules)
    def cell_of(v):
        best, best_s = 0, None
        for i, c in enumerate(cents):
            s = (sum(x * y for x, y in zip(v, c))
                 / math.sqrt(sum(x * x for x in c)))
            if best_s is None or s > best_s:
                best, best_s = i, s
        return best

    def code_of(v, book):
        return min(range(len(book)),
                   key=lambda j: (sum((x - y) ** 2 for x, y in
                                      zip(v, book[j])), j))

    def sqerr(books, residual):
        err = 0.0
        for v in pts.values():
            base = cents[cell_of(v)] if residual else [0.0] * dim
            t = [x - b for x, b in zip(v, base)]
            for b in range(m):
                tb = t[b * sub:(b + 1) * sub]
                c = books[b][code_of(tb, books[b])]
                err += sum((x - y) ** 2 for x, y in zip(tb, c))
        return err

    assert sqerr(res_books, True) < sqerr(raw_books, False)

    raw_codes = pq_encode(emb, raw_books).cache()
    res_codes = pq_encode_residual(
        ivf_residuals(emb, cents, materialize_mode="none")
        .drop("residual"), res_books, cents).cache()
    qids = sorted(pts)[:10]
    r_raw = r_res = 0.0
    for qid in qids:
        truth = _exact_topk(pts, qid)
        r_raw += len({r.vec_id for r in pq_adc_topk(
            raw_codes.filter(F.col("vec_id") != qid), pts[qid],
            raw_books, k=K).collect()} & truth) / K
        r_res += len({r.vec_id for r in pq_adc_topk_residual(
            res_codes.filter(F.col("vec_id") != qid), pts[qid],
            res_books, cents, k=K).collect()} & truth) / K
    assert r_res / len(qids) > r_raw / len(qids), (r_res, r_raw)
    assert r_res / len(qids) >= 0.55   # measured 0.61
