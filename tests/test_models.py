"""Trained-model import (functions/models.py): fastText-style .vec
parsing, hashing-trick weight folding (collision policy: token-sorted
sum), binary + multi-class inference parity with a pure-Python mirror,
and the model-backed lang_id upgrade."""

import hashlib
import math
import os
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.functions.models import (
    hash_vec_weights,
    hash_vec_weights_binary,
    hashed_multiclass_score,
    lang_id_model,
    parse_vec_model,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "lid_mini.vec")
LABELS = ["de", "en", "es", "fr", "zh"]


def _hash_fraction(key: str, salt: str) -> float:
    h = int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)
    return h / 2 ** 32


def _bucket(token: str, n_buckets: int, salt: str = "clf") -> int:
    return int(_hash_fraction(token, salt) * n_buckets)


def _read_fixture():
    rows = {}
    with open(FIXTURE) as f:
        header = f.readline().split()
        for line in f:
            parts = line.split()
            rows[parts[0]] = [float(v) for v in parts[1:]]
    return int(header[0]), int(header[1]), rows


def test_parse_vec_model_reads_fixture(spark):
    n, dim, want = _read_fixture()
    got = {r.token: list(r.vec)
           for r in parse_vec_model(spark, FIXTURE, dim=dim).collect()}
    assert len(got) == n == len(want)
    assert got == pytest.approx(want)


def test_parse_vec_model_enforces_dim(spark, tmp_path):
    p = str(tmp_path / "bad.vec")
    with open(p, "w") as f:
        f.write("2 3\nok 0.1 0.2 0.3\nshort 0.1 0.2\n")
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException,
                       match="malformed row for token"):
        parse_vec_model(spark, p, dim=3).collect()
    # without the dim contract the malformed row passes through raw
    assert parse_vec_model(spark, p).count() == 2


def test_parse_vec_model_numeric_token_row_is_data(spark, tmp_path):
    """A data row whose token is numeric AND whose weights are
    integer-formatted (a quantized export's '2020 1 0 0 0 0') is NOT a
    header: only the two-field '<n> <dim>' shape (or, with dim known,
    an all-integer row of the wrong arity) is dropped."""
    p = str(tmp_path / "quant.vec")
    with open(p, "w") as f:
        f.write("3 5\n2020 1 0 0 0 0\nok 0.1 0.2 0.3 0.4 0.5\n"
                "7 2 2 2 2 2\n")
    got = {r.token: list(r.vec)
           for r in parse_vec_model(spark, p, dim=5).collect()}
    assert got["2020"] == [1.0, 0.0, 0.0, 0.0, 0.0]
    assert got["7"] == [2.0] * 5
    assert set(got) == {"2020", "ok", "7"}
    # and without dim: header is strictly the 2-field shape
    assert parse_vec_model(spark, p).count() == 3


def test_hash_vec_weights_collision_sum_mirror(spark):
    """The loaded (bucket, label, weight) table equals the Python
    mirror's per-bucket token-sorted weight sums — with n_buckets far
    below the vocabulary so collisions actually happen."""
    n, dim, vecs = _read_fixture()
    nb = 16  # 79 tokens into 16 buckets → collisions guaranteed
    want = defaultdict(float)
    for t in sorted(vecs):
        for i, lb in enumerate(LABELS):
            want[(_bucket(t, nb), lb)] += vecs[t][i]
    want = {k: round(v, 6) for k, v in want.items()}
    got = {(r.bucket, r.label): r.weight
           for r in hash_vec_weights(
               parse_vec_model(spark, FIXTURE, dim=dim),
               LABELS, n_buckets=nb).collect()}
    assert got == pytest.approx(want)
    with pytest.raises(ValueError, match="duplicate labels"):
        hash_vec_weights(parse_vec_model(spark, FIXTURE), ["a", "a"])


def test_hash_vec_weights_binary_feeds_linear_scorer(spark, tmp_path):
    """A dim=1 export folds into hashed_linear_score's (bucket, weight)
    table and the score matches a Python mirror of the whole chain."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hashed_linear_score,
    )

    model = {"good": 1.5, "fine": 0.5, "bad": -2.0, "awful": -1.0}
    p = str(tmp_path / "quality.vec")
    with open(p, "w") as f:
        f.write(f"{len(model)} 1\n")
        for t, w in sorted(model.items()):
            f.write(f"{t} {w}\n")
    nb, bias = 8, -0.1
    vecs = parse_vec_model(spark, p, dim=1)
    weights = hash_vec_weights_binary(vecs, n_buckets=nb)
    docs = spark.createDataFrame(
        [(1, "good good fine unknown"), (2, "bad awful"), (3, "")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.clf_score)
           for r in hashed_linear_score(docs, weights, n_buckets=nb,
                                        bias=bias).collect()}

    folded = defaultdict(float)
    for t in sorted(model):
        folded[_bucket(t, nb)] += model[t]
    folded = {b: round(w, 6) for b, w in folded.items()}
    for doc_id, text in [(1, "good good fine unknown"), (2, "bad awful")]:
        toks = text.split()
        cnt = Counter(_bucket(t, nb) for t in toks)
        dot = sum(c * folded.get(b, 0.0) for b, c in cnt.items()) / len(toks)
        want = round(1 / (1 + math.exp(-(bias + dot))), 6)
        assert got[doc_id] == (len(toks), pytest.approx(want)), doc_id
    assert got[3] == (0, pytest.approx(round(
        1 / (1 + math.exp(-bias)), 6)))

    # a multi-class file must be refused by the binary fold
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="not a single-output"):
        hash_vec_weights_binary(
            parse_vec_model(spark, FIXTURE), n_buckets=nb).collect()


def _mirror_multiclass(texts, vecs, labels, nb, biases, salt="clf",
                       featurize=None):
    folded = defaultdict(float)
    for t in sorted(vecs):
        for i, lb in enumerate(labels):
            folded[(_bucket(t, nb, salt), lb)] += vecs[t][i]
    folded = {k: round(v, 6) for k, v in folded.items()}
    out = {}
    for doc_id, text in texts:
        toks = text.lower().split()
        if featurize is not None:
            toks = [f for w in toks for f in featurize(w)]
        if not toks:
            out[doc_id] = (0, "und", None)
            continue
        cnt = Counter(_bucket(t, nb, salt) for t in toks)
        logits = {}
        for i, lb in enumerate(labels):
            dot = sum(c * folded.get((b, lb), 0.0)
                      for b, c in cnt.items()) / len(toks)
            logits[lb] = round((biases[i] if biases else 0.0) + dot, 6)
        pred = min(logits, key=lambda lb: (-logits[lb], lb))
        out[doc_id] = (len(toks), pred, logits[pred])
    return out


def test_multiclass_score_matches_python_mirror(spark):
    n, dim, vecs = _read_fixture()
    nb = 32
    biases = [0.05, -0.02, 0.0, 0.01, -0.3]
    texts = [
        (1, "der hund ist nicht ein tier mit fell"),
        (2, "the cat and the dog is that it for with"),
        (3, "le chat est dans la maison pour une nuit"),
        (4, "table row batch merge window data query"),  # corpus words
        (5, ""),                                          # token-less
        (6, "zzz qqq www"),                               # all unseen
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    weights = hash_vec_weights(parse_vec_model(spark, FIXTURE, dim=dim),
                               LABELS, n_buckets=nb)
    got = {r.doc_id: (r.n_tokens, r.pred, r.pred_logit)
           for r in hashed_multiclass_score(
               docs, weights, LABELS, biases=biases,
               n_buckets=nb).collect()}
    want = _mirror_multiclass(texts, vecs, LABELS, nb, biases)
    for doc_id in want:
        g, w = got[doc_id], want[doc_id]
        assert g[:2] == w[:2], (doc_id, g, w)
        if w[2] is None:
            assert g[2] is None
        else:
            assert g[2] == pytest.approx(w[2])
    # the marker-heavy docs land on their languages
    assert got[1][1] == "de" and got[2][1] == "en" and got[3][1] == "fr"
    with pytest.raises(ValueError, match="biases"):
        hashed_multiclass_score(docs, weights, LABELS, biases=[0.0])


SUB_FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                           "lid_mini_sub.vec")


def _read_sub_fixture():
    rows = {}
    with open(SUB_FIXTURE) as f:
        f.readline()
        for line in f:
            parts = line.split()
            rows[parts[0]] = [float(x) for x in parts[1:]]
    return rows


def test_subword_features_and_scorer_match_mirror(spark):
    """char_ngrams=(min,max): the feature set is word + boundary-marked
    n-grams, all hashed into the shared bucket space — Spark scorer vs
    a plain-Python restatement, and UNSEEN words still land on their
    language via their n-grams (the point of subwords)."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        subword_features,
    )

    # the feature generator alone, against hand-derived slices
    feats = spark.createDataFrame([("schnell",), ("x",)], "t string") \
        .select(subword_features(F.col("t"), 3, 4).alias("f")).collect()
    wrapped = "<schnell>"
    want = (["schnell"]
            + [wrapped[i:i + 3] for i in range(len(wrapped) - 2)]
            + [wrapped[i:i + 4] for i in range(len(wrapped) - 3)])
    assert feats[0].f == want
    assert feats[1].f == ["x", "<x>"]  # 3-grams of '<x>'; no 4-gram

    vecs = _read_sub_fixture()
    nb = 64
    texts = [
        (1, "schneller schnitt der die"),    # de: sch/ch> grams + words
        (2, "thinking things the"),          # en: <th/ing/ng>
        (3, "beaux chateaux le"),            # fr: eau/ux>
        (4, "zhang zhao"),                   # zh: <zh/ang/ao>
        (5, "unseen wording"),               # en via ing/ng> only
        (6, ""),
    ]

    def featurize(w):
        ww = f"<{w}>"
        return [w] + [ww[i:i + 3] for i in range(len(ww) - 2)]

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    weights = hash_vec_weights(parse_vec_model(spark, SUB_FIXTURE, dim=5),
                               LABELS, n_buckets=nb)
    got = {r.doc_id: (r.n_tokens, r.pred, r.pred_logit)
           for r in hashed_multiclass_score(
               docs, weights, LABELS, n_buckets=nb,
               char_ngrams=(3, 3)).collect()}
    want = _mirror_multiclass(texts, vecs, LABELS, nb, None,
                              featurize=featurize)
    for doc_id in want:
        g, w = got[doc_id], want[doc_id]
        assert g[:2] == w[:2], (doc_id, g, w)
        if w[2] is None:
            assert g[2] is None
        else:
            assert g[2] == pytest.approx(w[2])
    assert got[1][1] == "de" and got[2][1] == "en"
    assert got[3][1] == "fr" and got[4][1] == "zh"
    assert got[5][1] == "en"        # no word hit — subwords carried it
    with pytest.raises(ValueError, match="char_ngrams"):
        hashed_multiclass_score(docs, weights, LABELS, n_buckets=nb,
                                char_ngrams=(3, 2))


def test_funnel_lid_model_gate_with_subwords(spark):
    """The lid_model dict threads char_ngrams through filter_documents:
    docs whose words are unseen still gate onto their n-grams'
    language."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        filter_documents,
    )

    weights = hash_vec_weights(parse_vec_model(spark, SUB_FIXTURE, dim=5),
                               LABELS, n_buckets=64)
    docs = spark.createDataFrame(
        [(1, "schwimmen schreiben dich"),      # de by subwords only
         (2, "thinking wording singing")],     # en by subwords only
        "doc_id long, text string")
    got = {r.doc_id for r in filter_documents(
        docs, min_quality=0.0, langs=["de"],
        lid_model={"weights": weights, "labels": LABELS,
                   "n_buckets": 64, "char_ngrams": (3, 3)}).collect()}
    assert got == {1}


def test_lang_id_model_output_convention(spark):
    n, dim, _ = _read_fixture()
    weights = hash_vec_weights(parse_vec_model(spark, FIXTURE, dim=dim),
                               LABELS, n_buckets=64)
    docs = spark.createDataFrame(
        [(1, "die der das und ist"), (2, "")],
        "doc_id long, text string")
    out = lang_id_model(docs, weights, LABELS, n_buckets=64)
    assert out.columns == ["doc_id", "text", "n_tokens", "lang_pred",
                           "lang_logit"]
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].lang_pred == "de" and got[1].lang_logit > 1.0
    assert got[2].lang_pred == "und" and got[2].lang_logit is None


def _lid_fixture(spark):
    dim = 5
    weights = hash_vec_weights(parse_vec_model(spark, FIXTURE, dim=dim),
                               LABELS, n_buckets=64)
    return {"weights": weights, "labels": LABELS, "n_buckets": 64}


def test_funnel_lid_model_gate(spark):
    """filter_documents(lid_model=...) decides the language allowlist by
    the trained model's argmax instead of the marker heuristic — and
    refuses a model without an allowlist to gate."""
    import pytest as _pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        filter_documents,
    )

    de = ("der die das und ist nicht ein mit " * 4).strip()
    en = ("the and of to in is that it for with " * 4).strip()
    fr = ("le la les et est pas un une dans pour " * 4).strip()
    docs = spark.createDataFrame([(1, de), (2, en), (3, fr)],
                                 "doc_id long, text string")
    lid = _lid_fixture(spark)
    got = {r.doc_id for r in filter_documents(
        docs, min_quality=0.0, langs=["de", "fr"],
        lid_model=lid).collect()}
    assert got == {1, 3}
    with _pytest.raises(ValueError, match="lid_model without langs"):
        filter_documents(docs, min_quality=0.0, lid_model=lid)
    with _pytest.raises(ValueError, match="missing keys"):
        filter_documents(docs, min_quality=0.0, langs=["de"],
                         lid_model={"weights": lid["weights"]})


def test_funnel_quality_model_gate(spark, tmp_path):
    """filter_documents(quality_model=...) gates on the loaded binary
    classifier's score — docs the model dislikes drop even when the
    heuristic floor passes them."""
    import pytest as _pytest

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        filter_documents,
    )

    p = str(tmp_path / "quality.vec")
    with open(p, "w") as f:
        f.write("2 1\ngood 3.0\nbad -3.0\n")
    weights = hash_vec_weights_binary(parse_vec_model(spark, p, dim=1),
                                      n_buckets=32)
    docs = spark.createDataFrame(
        [(1, "good good good text here"), (2, "bad bad bad text here")],
        "doc_id long, text string")
    got = {r.doc_id for r in filter_documents(
        docs, min_quality=0.0,
        quality_model={"weights": weights, "min_score": 0.5,
                       "n_buckets": 32}).collect()}
    assert got == {1}
    with _pytest.raises(ValueError, match="missing keys.*min_score"):
        filter_documents(docs, min_quality=0.0,
                         quality_model={"weights": weights})


def test_funnel_model_gates_thread_salt(spark, tmp_path):
    """The model dicts accept the loader's salt and thread it to the
    scorer — weights loaded under a non-default salt must still gate
    (a salt mismatch makes every bucket lookup miss silently, leaving
    bias-only scores: doc 2 would survive the quality gate and the LID
    gate would stop separating languages)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        filter_documents,
    )

    # quality gate under salt='q2': with the salt threaded, doc 2 drops
    p = str(tmp_path / "quality.vec")
    with open(p, "w") as f:
        f.write("2 1\ngood 3.0\nbad -3.0\n")
    qw = hash_vec_weights_binary(parse_vec_model(spark, p, dim=1),
                                 n_buckets=32, salt="q2")
    docs = spark.createDataFrame(
        [(1, "good good good text here"), (2, "bad bad bad text here")],
        "doc_id long, text string")
    got = {r.doc_id for r in filter_documents(
        docs, min_quality=0.0,
        quality_model={"weights": qw, "min_score": 0.5,
                       "n_buckets": 32, "salt": "q2"}).collect()}
    assert got == {1}
    # LID gate under salt='lid2': argmax still separates de from fr
    lw = hash_vec_weights(parse_vec_model(spark, FIXTURE, dim=5),
                          LABELS, n_buckets=64, salt="lid2")
    de = ("der die das und ist nicht ein mit " * 4).strip()
    fr = ("le la les et est pas un une dans pour " * 4).strip()
    ldocs = spark.createDataFrame([(1, de), (2, fr)],
                                  "doc_id long, text string")
    got = {r.doc_id for r in filter_documents(
        ldocs, min_quality=0.0, langs=["de"],
        lid_model={"weights": lw, "labels": LABELS, "n_buckets": 64,
                   "salt": "lid2"}).collect()}
    assert got == {1}


def test_stream_model_gates_match_batch_funnel(spark, tmp_path):
    """The frozen-model gates are pure per-document functions, so the
    streaming funnel with lid_model + quality_model ships exactly the
    batch funnel's survivor set."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        build_training_corpus,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        corpus_batch,
        read_corpus,
    )

    p = str(tmp_path / "quality.vec")
    with open(p, "w") as f:
        f.write("2 1\ngut 3.0\nschlecht -3.0\n")
    qweights = hash_vec_weights_binary(parse_vec_model(spark, p, dim=1),
                                       n_buckets=32)
    de_good = ("der die das und ist nicht ein mit gut gut " * 3).strip()
    de_bad = ("der die das und ist nicht ein mit schlecht schlecht "
              * 3).strip()
    en_good = ("the and of to in is that it for with gut gut " * 3).strip()
    batches = [[(1, de_good), (2, de_bad)], [(10, en_good), (11, de_good)]]
    kw = dict(min_quality=0.0, langs=["de"], near_dup_threshold=None,
              lid_model=_lid_fixture(spark),
              quality_model={"weights": qweights, "min_score": 0.5,
                             "n_buckets": 32})
    cdir = str(tmp_path / "corpus")
    for i, rows in enumerate(batches):
        corpus_batch(spark.createDataFrame(rows,
                                           "doc_id long, text string"),
                     i, cdir, **kw)
    got = {(r.doc_id, r.text) for r in read_corpus(spark, cdir).collect()}
    all_docs = spark.createDataFrame([r for b in batches for r in b],
                                     "doc_id long, text string")
    want = {(r.doc_id, r.text)
            for r in build_training_corpus(all_docs, **kw).collect()}
    assert got == want
    # doc 1 passes both gates; 2 fails quality; 10 fails LID; 11 is an
    # exact dup of 1's text → deduped
    assert {d for d, _ in got} == {1}


def _mirror_doc_embedding(text, model, weights=None, dim=5):
    """Plain-Python restatement of doc_embedding's spec: covered-token
    weighted mean over token-sorted rows, component-ordered L2 norm."""
    from collections import Counter

    cnt = Counter((text or "").lower().split())
    rows = sorted((t, c) for t, c in cnt.items() if t in model)
    if not rows:
        return sum(cnt.values()), 0, None
    den = 0.0
    dots = [0.0] * dim
    nm = 0
    for t, c in rows:
        w = c * (weights.get(t, 1.0) if weights else 1.0)
        den += w
        nm += c
        for j in range(dim):
            dots[j] += w * model[t][j]
    mean = [d / den for d in dots]
    nrm = math.sqrt(sum(x * x for x in mean))
    if nrm > 0:
        mean = [x / nrm for x in mean]
    return sum(cnt.values()), nm, [round(x, 6) for x in mean]


def test_doc_embedding_matches_python_mirror(spark):
    """Model-backed document embedding: tf and SIF-weighted means both
    equal the plain-Python restatement value-for-value; uncovered /
    empty / NULL docs take the explicit NULL lane."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
        sif_token_weights,
    )

    _, _, model = _read_fixture()
    texts = [(1, "die der die und zzz"), (2, "the the of en999"),
             (3, "zzz qqq"), (4, ""), (5, None),
             (6, "le la le la le est")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    vecs = parse_vec_model(spark, FIXTURE, dim=5)

    got = {r.doc_id: r for r in doc_embedding(docs, vecs, 5).collect()}
    for doc_id, text in texts:
        n, nm, emb = _mirror_doc_embedding(text, model)
        assert got[doc_id].n_tokens == n, doc_id
        assert got[doc_id].n_model_tokens == nm, doc_id
        if emb is None:
            assert got[doc_id].embedding is None, doc_id
        else:
            assert got[doc_id].embedding == pytest.approx(emb), doc_id

    # SIF weights: recompute the mirror with a/(a+p) multipliers
    sif = sif_token_weights(docs)
    wmap = {r.token: r.weight for r in sif.collect()}
    total = sum(len((t or "").lower().split()) for _, t in texts)
    for t, w in wmap.items():
        inst = sum((txt or "").lower().split().count(t)
                   for _, txt in texts)
        assert w == pytest.approx(round(1e-3 / (1e-3 + inst / total), 6))
    gots = {r.doc_id: r for r in
            doc_embedding(docs, vecs, 5, token_weights=sif).collect()}
    for doc_id, text in texts:
        n, nm, emb = _mirror_doc_embedding(text, model, wmap)
        assert gots[doc_id].n_model_tokens == nm
        if emb is None:
            assert gots[doc_id].embedding is None
        else:
            assert gots[doc_id].embedding == pytest.approx(emb), doc_id


def test_doc_embedding_feeds_ann_stack(spark):
    """The trained-vector embedding is a drop-in for the hashed baseline:
    text → doc_embedding → k-means → cluster-blocked near-dup finds the
    planted same-language pair and nothing across languages."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
    )
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
        train_ivf_centroids,
    )

    de = "die der und die das ist nicht der die und"
    docs = spark.createDataFrame(
        [(1, de), (2, de + " ein"),                    # near-identical de
         (3, "the of the and a to the of is the"),     # en
         (4, "le la les le est une le la du le")],     # fr
        "doc_id long, text string")
    vecs = parse_vec_model(spark, FIXTURE, dim=5)
    emb = doc_embedding(docs, vecs, 5).filter(
        F.col("embedding").isNotNull())
    cents = train_ivf_centroids(emb, k=2, dim=5, id_col="doc_id")
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in cluster_neardup_pairs(
        emb, cents, threshold=0.95, id_col="doc_id",
        n_probe=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_multiclass_scorer_matches_mirror_property(spark):
    """Hypothesis sweep: over random small models (2-4 classes, tiny
    vocab, random weights/biases) and random documents (in-vocab and
    OOV words, empty docs), the Spark argmax head and the pure-Python
    mirror agree on (n_tokens, pred, logit) for every document."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["aa", "bb", "cc", "dd", "ee"]
    word = st.sampled_from(vocab + ["oov1", "oov2"])
    weight = st.integers(-300, 300).map(lambda v: v / 100.0)

    @given(
        n_classes=st.integers(2, 4),
        model=st.dictionaries(st.sampled_from(vocab),
                              st.lists(weight, min_size=4, max_size=4),
                              min_size=1),
        biases=st.lists(weight, min_size=4, max_size=4),
        docs=st.lists(st.lists(word, max_size=8), min_size=1,
                      max_size=5),
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(n_classes, model, biases, docs):
        labels = [f"c{i}" for i in range(n_classes)]
        nb = 8  # tiny bucket space → collisions exercised every example
        vecs = {t: v[:n_classes] for t, v in model.items()}
        wdf = hash_vec_weights(
            spark.createDataFrame(
                [(t, v) for t, v in sorted(vecs.items())],
                "token string, vec array<double>"),
            labels, n_buckets=nb)
        texts = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        got = {r.doc_id: (r.n_tokens, r.pred, r.pred_logit)
               for r in hashed_multiclass_score(
                   spark.createDataFrame(texts, "doc_id long, text string"),
                   wdf, labels, biases=biases[:n_classes],
                   n_buckets=nb).collect()}
        want = _mirror_multiclass(texts, vecs, labels, nb,
                                  biases[:n_classes])
        for doc_id, w in want.items():
            g = got[doc_id]
            assert g[:2] == w[:2], (doc_id, g, w, vecs)
            if w[2] is None:
                assert g[2] is None
            else:
                assert g[2] == pytest.approx(w[2])

    check()


def _mirror_subword_vec(word, model, min_n, max_n, dim=5):
    """Mirror of the synthesized-OOV vector: gram-sorted component mean
    of the model-covered boundary-marked n-grams (plus the word itself,
    which is absent by construction), rounded to 6 dp."""
    feats = [word]
    wrapped = f"<{word}>"
    for n in range(min_n, max_n + 1):
        feats.extend(wrapped[i:i + n]
                     for i in range(len(wrapped) - n + 1))
    rows = sorted((g, tuple(model[g])) for g in feats if g in model)
    if not rows:
        return None
    comps = []
    for j in range(dim):
        acc = 0.0
        for _, v in rows:
            acc += v[j]
        comps.append(round(acc / len(rows), 6))
    return comps


def test_doc_embedding_subword_oov_and_broadcast_optout(spark, tmp_path):
    """fastText's actual OOV convention: with char_ngrams on, an unseen
    word embeds as the mean of its model-covered n-gram vectors — the
    mirror reproduces every value, the unseen word lands near its
    language's seen words, and broadcast_model=False plans a shuffle
    join with identical results (no BroadcastExchange on the model side
    once the hint is gone and auto-broadcast is off)."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
    )

    model = {
        "hund": [1.0, 0.0, 0.1, 0.0, 0.0],
        "katze": [0.9, 0.1, 0.1, 0.0, 0.0],
        "dog": [0.0, 1.0, 0.0, 0.1, 0.0],
        "cat": [0.1, 0.9, 0.0, 0.1, 0.0],
        # 3-grams of '<schnell>' — German-leaning vectors
        "<sc": [0.8, 0.2, 0.1, 0.0, 0.0],
        "sch": [0.85, 0.15, 0.1, 0.0, 0.0],
        "chn": [0.9, 0.1, 0.1, 0.0, 0.0],
        "hne": [0.8, 0.2, 0.1, 0.0, 0.0],
        "nel": [0.75, 0.25, 0.1, 0.0, 0.0],
        "ell": [0.8, 0.2, 0.1, 0.0, 0.0],
        "ll>": [0.85, 0.15, 0.1, 0.0, 0.0],
    }
    p = str(tmp_path / "toy.vec")
    with open(p, "w") as f:
        f.write(f"{len(model)} 5\n")
        for t, v in model.items():
            f.write(t + " " + " ".join(map(str, v)) + "\n")
    vecs = parse_vec_model(spark, p, dim=5)
    texts = [(1, "hund katze"), (2, "dog cat"),
             (3, "schnell hund"),          # unseen word + covered word
             (4, "schnell"),               # purely synthesized doc
             (5, "xyzzy"), (6, None)]      # no coverage → NULL lane
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding as de,
    )

    got = {r.doc_id: r for r in
           de(docs, vecs, 5, char_ngrams=(3, 3)).collect()}
    # mirror: synthesized tokens behave as model entries
    ext = dict(model)
    ext["schnell"] = _mirror_subword_vec("schnell", model, 3, 3)
    assert ext["schnell"] is not None
    for doc_id, text in texts:
        n, ncov, emb = _mirror_doc_embedding(text, ext)
        nm_direct = sum(c for t, c in
                        Counter((text or "").lower().split()).items()
                        if t in model)
        assert got[doc_id].n_tokens == n, doc_id
        assert got[doc_id].n_model_tokens == nm_direct, doc_id
        assert got[doc_id].n_subword_tokens == ncov - nm_direct, doc_id
        if emb is None:
            assert got[doc_id].embedding is None, doc_id
        else:
            assert got[doc_id].embedding == pytest.approx(emb), doc_id

    # the unseen word lands near its language: cosine to the German
    # doc beats cosine to the English doc by a wide margin
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(y * y for y in b)))

    synth_doc = list(got[4].embedding)
    assert cos(synth_doc, list(got[1].embedding)) > 0.98  # measured .987
    assert cos(synth_doc, list(got[1].embedding)) \
        > cos(synth_doc, list(got[2].embedding)) + 0.3

    # broadcast opt-out: identical rows, and with auto-broadcast off the
    # model side plans a shuffle join (the hint is the only forcer)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = de(docs, vecs, 5, char_ngrams=(3, 3))
        unhinted = de(docs, vecs, 5, char_ngrams=(3, 3),
                      broadcast_model=False)
        assert sorted(map(tuple, unhinted.collect())) \
            == sorted(map(tuple, hinted.collect()))
        assert "BroadcastExchange" in \
            hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in \
            unhinted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    with pytest.raises(ValueError, match="char_ngrams"):
        de(docs, vecs, 5, char_ngrams=(3, 2))


def test_multiclass_broadcast_optout_identical(spark):
    """hashed_multiclass_score(broadcast_model=False): same predictions
    and logits through a shuffle join on the bucket."""
    _, _, model = _read_fixture()
    weights = hash_vec_weights(
        parse_vec_model(spark, FIXTURE, dim=5), LABELS, n_buckets=64)
    docs = spark.createDataFrame(
        [(1, "die der und"), (2, "the of a"), (3, None)],
        "doc_id long, text string")
    a = hashed_multiclass_score(docs, weights, LABELS, n_buckets=64)
    b = hashed_multiclass_score(docs, weights, LABELS, n_buckets=64,
                                broadcast_model=False)
    assert sorted(map(tuple, a.collect())) \
        == sorted(map(tuple, b.collect()))
