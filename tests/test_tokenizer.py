"""True-BPE tokenizer import (functions/tokenizer.py): merges-file
loading, the greedy lowest-rank-first encode loop against hand-derived
sequences, and the Arrow-batched count operator."""

import os

import pytest

from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
    bpe_encode_word,
    bpe_token_count,
    load_bpe_merges,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "bpe_mini_merges.txt")


def test_load_merges_and_encode_hand_derived(spark):
    merges = load_bpe_merges(spark, FIXTURE)
    assert merges[0] == ("e", "</w>") and len(merges) == 10
    ranks = {p: i for i, p in enumerate(merges)}
    # full-word merges
    assert bpe_encode_word("the", ranks) == ["the</w>"]
    assert bpe_encode_word("data", ranks) == ["data</w>"]
    # partial coverage: 'thing' → th + ing</w> ... with 'th' applied
    # first (rank 1 < rank 7 'i n'), then in, ing, ing</w>
    assert bpe_encode_word("thing", ranks) == ["th", "ing</w>"]
    # no applicable merge: characters + the end marker survive
    assert bpe_encode_word("zed", ranks) == ["z", "e", "d", "</w>"]
    assert bpe_encode_word("", ranks) == ["</w>"]


def test_load_merges_rejects_malformed(spark, tmp_path):
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("a b\none two three\n")
    with pytest.raises(ValueError, match="malformed merge line"):
        load_bpe_merges(spark, p)


def test_bpe_token_count_operator(spark):
    merges = load_bpe_merges(spark, FIXTURE)
    docs = spark.createDataFrame([
        (1, "the data"),            # 1 + 1
        (2, "thing the thing"),     # 2 + 1 + 2
        (3, "zed"),                 # 4
        (4, None),                  # NULL lane: 0
        (5, ""),                    # no words: 0
        (6, "THE"),                 # cased: no merges hit → 4
    ], "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_count(docs, merges).collect()}
    assert got == {1: 2, 2: 5, 3: 4, 4: 0, 5: 0, 6: 4}
    # lowercase folds doc 6 onto the trained-case vocabulary
    low = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_count(docs, merges,
                                    lowercase=True).collect()}
    assert low[6] == 1 and low[1] == 2
    # emit_tokens carries the actual sequences (off by default)
    toks = {r.doc_id: r.bpe_tokens for r in
            bpe_token_count(docs, merges, emit_tokens=True).collect()}
    assert toks[1] == ["the</w>", "data</w>"]
    assert toks[2] == ["th", "ing</w>", "the</w>", "th", "ing</w>"]
    assert toks[4] is None
    assert "bpe_tokens" not in bpe_token_count(docs, merges).columns
    with pytest.raises(ValueError, match="duplicate merge"):
        bpe_token_count(docs, merges + [merges[0]])


def test_bpe_count_matches_per_word_kernel_on_fixture(spark, sf_dir):
    """Operator vs the shared kernel applied word-by-word in plain
    Python over real fixture documents — catches batching/memo bugs."""
    merges = load_bpe_merges(spark, FIXTURE)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").filter("doc_id < 50"))
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_count(docs, merges).collect()}
    for r in docs.collect():
        want = sum(len(bpe_encode_word(w, ranks)) for w in r.text.split())
        assert got[r.doc_id] == want, r.doc_id


def test_budget_stages_accept_trained_tokenizer_counts(spark):
    """count_col threads BPE counts through packing and temperature
    budgeting: the packed offsets/chunks equal the same operators run
    over a text whose whitespace count equals the BPE count — i.e. the
    unit swap is complete, not partial."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        pack_chunks,
        temperature_mixture,
    )

    merges = load_bpe_merges(spark, FIXTURE)
    docs = spark.createDataFrame([
        (1, "the data", "en"),          # 2 bpe tokens (4 ws tokens? 2 ws)
        (2, "thing the thing", "en"),   # 5 bpe tokens (3 ws)
        (3, "zed", "de"),               # 4 bpe tokens (1 ws)
    ], "doc_id long, text string, lang string")
    counted = bpe_token_count(docs, merges)

    packed = {r.doc_id: (r.n_tokens, r.start_offset, r.chunk)
              for r in pack_chunks(
                  counted, budget_tokens=6, shard_col="lang",
                  count_col="n_bpe_tokens").collect()}
    # en shard: doc1 starts at 0 (2 toks), doc2 at 2 (5 toks) → chunk 0
    assert packed[1] == (2, 0, 0)
    assert packed[2] == (5, 2, 0)
    assert packed[3] == (4, 0, 0)

    mix = {r.lang: (r.n_docs, r.n_tokens) for r in temperature_mixture(
        counted, budget_tokens=100,
        count_col="n_bpe_tokens").collect()}
    assert mix["en"] == (2, 7) and mix["de"] == (1, 4)


def test_finalize_corpus_in_trained_tokenizer_units(spark, tmp_path):
    """finalize_corpus(bpe_merges=...) budgets the whole quiesce job in
    the trained unit: packed n_tokens equal BPE counts (not whitespace),
    the artifact carries n_bpe_tokens, and the manifest agrees."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        check_shard_manifest,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        corpus_batch,
        finalize_corpus,
    )

    merges = load_bpe_merges(spark, FIXTURE)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [(1, "the data zed"), (2, "thing zed thing")]
    cdir, out = str(tmp_path / "corpus"), str(tmp_path / "final")
    corpus_batch(spark.createDataFrame(rows, "doc_id long, text string"),
                 0, cdir, min_quality=0.0, near_dup_threshold=None)
    finalize_corpus(spark, cdir, out, n_shards=1, budget_tokens=16,
                    bpe_merges=merges)
    art = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    for doc_id, text in rows:
        want = sum(len(bpe_encode_word(w, ranks)) for w in text.split())
        assert art[doc_id].n_tokens == want          # packed in BPE units
        assert art[doc_id].n_bpe_tokens == want      # audit column ships
        assert want != len(text.split())             # units actually differ
    m = check_shard_manifest(spark, out)
    assert m["shards"]["0"]["n_tokens"] == sum(
        r.n_tokens for r in art.values())


def test_finalize_corpus_emits_token_id_artifact(spark, tmp_path):
    """finalize_corpus(emit_token_ids=True): the streamed corpus
    quiesces straight into the id-array trainable artifact — text
    dropped, exact id sequences in loader order, vocab sidecar and
    manifest intact; and the flag refuses without a tokenizer."""
    import pytest as _pytest

    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_vocab,
    )
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        check_shard_manifest,
        read_token_id_shard,
        read_token_id_vocab,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.corpus_stream import (
        corpus_batch,
        finalize_corpus,
    )

    merges = load_bpe_merges(spark, FIXTURE)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)
    rows = [(1, "the data zed"), (2, "thing zed thing"),
            (3, "data the in")]
    cdir, out = str(tmp_path / "corpus"), str(tmp_path / "final")
    corpus_batch(spark.createDataFrame(rows, "doc_id long, text string"),
                 0, cdir, min_quality=0.0, near_dup_threshold=None)
    finalize_corpus(spark, cdir, out, n_shards=1, budget_tokens=16,
                    bpe_merges=merges, emit_token_ids=True)
    assert "text" not in spark.read.parquet(out).columns
    assert read_token_id_vocab(spark, out) == vocab
    check_shard_manifest(spark, out)
    back = read_token_id_shard(spark, out, 0).collect()
    assert [r.doc_id for r in back] == [1, 2, 3]
    for r in back:
        text = dict(rows)[r.doc_id]
        want = [vocab.get(s, 0) for w in text.split()
                for s in bpe_encode_word(w, ranks)]
        assert list(r.bpe_ids) == want, r.doc_id
        assert r.n_tokens == len(want)
    with _pytest.raises(ValueError, match="requires bpe_merges"):
        finalize_corpus(spark, cdir, out, emit_token_ids=True)

    # eos mode: the finalized artifact carries the separator per doc,
    # counted in the budget, with the shifted vocab in the sidecar
    out2 = str(tmp_path / "final_eos")
    finalize_corpus(spark, cdir, out2, n_shards=1, budget_tokens=16,
                    bpe_merges=merges, emit_token_ids=True,
                    eos_token="<eos>")
    vocab2 = bpe_vocab(merges, specials=("<unk>", "<eos>"))
    assert read_token_id_vocab(spark, out2) == vocab2
    m2 = check_shard_manifest(spark, out2)
    assert m2["eos_token"] == "<eos>" and m2["eos_id"] == 1
    back2 = read_token_id_shard(spark, out2, 0).collect()
    for r in back2:
        text = dict(rows)[r.doc_id]
        want = [vocab2.get(s, 0) for w in text.split()
                for s in bpe_encode_word(w, ranks)] + [1]
        assert list(r.bpe_ids) == want, r.doc_id
        assert r.n_tokens == len(want)
    with _pytest.raises(ValueError, match="requires emit_token_ids"):
        finalize_corpus(spark, cdir, out2, bpe_merges=merges,
                        eos_token="<eos>")


def test_bpe_vocab_and_id_emission(spark):
    """The derived vocab is a pure function of the merges (specials
    first, then sorted trained symbols), and emit_ids maps every
    emitted symbol through it — OOV symbols to the first special, NULL
    text to a NULL array."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_vocab,
        bpe_vocab_table,
    )

    merges = load_bpe_merges(spark, FIXTURE)
    vocab = bpe_vocab(merges)
    # specials lead; symbols are exactly {lefts, rights, products, </w>}
    assert vocab["<unk>"] == 0
    want_syms = {"</w>"}
    for left, right in merges:
        want_syms.update((left, right, left + right))
    assert set(vocab) == {"<unk>"} | want_syms
    assert sorted(vocab.values()) == list(range(len(vocab)))
    assert [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])] \
        == ["<unk>"] + sorted(want_syms)
    # the table form round-trips the dict
    tbl = {r.token: r.token_id
           for r in bpe_vocab_table(spark, merges).collect()}
    assert tbl == vocab
    with pytest.raises(ValueError, match="duplicate specials"):
        bpe_vocab(merges, specials=("<u>", "<u>"))
    with pytest.raises(ValueError, match="collide"):
        bpe_vocab(merges, specials=("th",))

    docs = spark.createDataFrame(
        [(1, "the data"), (2, "zed"), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.bpe_ids for r in
           bpe_token_count(docs, merges, emit_ids=True,
                           vocab=vocab).collect()}
    assert got[1] == [vocab["the</w>"], vocab["data</w>"]]
    # 'z' is untrained → <unk>; 'e', 'd', '</w>' are trained symbols
    assert got[2] == [0, vocab["e"], vocab["d"], vocab["</w>"]]
    assert got[3] is None

    # OOV id follows vocab[unk_token], never the minimum id: a vocab
    # where <unk> does NOT hold the smallest id still routes OOV to it
    # (r11 advisor — min(vocab.values()) would hit <pad> here)
    shifted = bpe_vocab(merges, specials=("<pad>", "<unk>"))
    assert shifted["<unk>"] == 1
    got2 = {r.doc_id: r.bpe_ids for r in
            bpe_token_count(docs, merges, emit_ids=True,
                            vocab=shifted).collect()}
    assert got2[2][0] == 1
    # a vocab without the OOV token refuses loudly...
    no_unk = bpe_vocab(merges, specials=("<s>",))
    with pytest.raises(ValueError, match="unk_token"):
        bpe_token_count(docs, merges, emit_ids=True, vocab=no_unk)
    # ...unless the caller names its OOV token explicitly
    got3 = {r.doc_id: r.bpe_ids for r in
            bpe_token_count(docs, merges, emit_ids=True, vocab=no_unk,
                            unk_token="<s>").collect()}
    assert got3[2][0] == no_unk["<s>"]


def test_write_and_read_token_id_shards(spark, tmp_path):
    """End-to-end trainable artifact: write_token_id_shards encodes,
    packs in trained units, and persists id arrays + manifest + vocab
    sidecar; reading each shard back in loader order reproduces the
    exact concatenated id stream of a plain-Python mirror."""
    from collections import defaultdict

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        check_shard_manifest,
        read_token_id_shard,
        read_token_id_vocab,
        write_token_id_shards,
    )
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_vocab,
    )
    import hashlib

    merges = load_bpe_merges(spark, FIXTURE)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)
    rows = [(i, f"the data thing zed doc{i} " * (i % 4 + 1))
            for i in range(24)] + [(24, ""), (25, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idshards")
    manifest = write_token_id_shards(docs, merges, out, n_shards=3,
                                     budget_tokens=32)
    assert read_token_id_vocab(spark, out) == vocab
    check_shard_manifest(spark, out)

    # python mirror: shard via the same md5 expression, concat in id
    # order, budget in BPE units
    def shard_of(doc_id):
        h = hashlib.md5(f"{doc_id}:shard".encode()).hexdigest()[:8]
        return int(h, 16) % 3

    def ids_of(text):
        if not text:
            return []
        return [vocab.get(s, 0) for w in text.split()
                for s in bpe_encode_word(w, ranks)]

    streams = defaultdict(list)
    offsets = {}
    for doc_id, text in sorted(rows):
        k = shard_of(doc_id)
        offsets[doc_id] = len(streams[k])
        streams[k].extend(ids_of(text))

    assert manifest["n_shards"] == 3
    for k in range(3):
        back = read_token_id_shard(spark, out, k).collect()
        flat = [i for r in back for i in (r.bpe_ids or [])]
        assert flat == streams[k], k
        for r in back:
            assert r.start_offset == offsets[r.doc_id]
            assert r.chunk == r.start_offset // 32
            assert r.n_tokens == len(ids_of(dict(rows)[r.doc_id]))
        assert manifest["shards"][str(k)]["n_tokens"] == len(streams[k])
    # the artifact ships ids, not text
    assert "text" not in spark.read.parquet(out).columns


def test_bpe_kernel_matches_sequential_formulation_property():
    """Hypothesis sweep: the greedy lowest-rank-first kernel equals the
    ORIGINAL sequential formulation (apply each merge in priority order
    to every occurrence before moving to the next) — the standard BPE
    equivalence, which holds for WELL-FORMED merge tables (every
    merge's constituents are base symbols or products of EARLIER
    merges, the invariant BPE training guarantees by construction; an
    arbitrary pair list can violate it, e.g. a rank-0 merge consuming a
    token only a rank-1 merge produces, and then the two formulations
    legitimately diverge). The generator therefore builds tables the
    way training does — each merge drawn from the current symbol set —
    so a subtle kernel bug (wrong tie-break, missed re-scan) cannot
    hide behind the hand-picked fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        END_OF_WORD,
    )

    alphabet = ["a", "b", "c"]

    def build_merges(picks):
        symbols = list(alphabet) + [END_OF_WORD]
        merges = []
        for i, j in picks:
            left = symbols[i % len(symbols)]
            right = symbols[j % len(symbols)]
            if (left, right) in merges:
                continue
            merges.append((left, right))
            symbols.append(left + right)
        return merges

    def sequential(word, merges):
        symbols = list(word) + [END_OF_WORD]
        for left, right in merges:
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == left and symbols[i + 1] == right:
                    symbols[i:i + 2] = [left + right]
                    if i > 0:
                        i -= 1  # a new pair may form with the left neighbor
                else:
                    i += 1
        return symbols

    idx = st.tuples(st.integers(0, 40), st.integers(0, 40))

    @given(picks=st.lists(idx, max_size=12),
           words=st.lists(st.text(alphabet=alphabet, max_size=8),
                          min_size=1, max_size=6))
    @settings(max_examples=300, deadline=None)
    def check(picks, words):
        merges = build_merges(picks)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in words:
            assert bpe_encode_word(w, ranks) == sequential(w, merges), \
                (w, merges)

    check()


def test_token_id_shards_with_eos_separator(spark, tmp_path):
    """Document-separator mode: the writer reserves <eos> in the vocab,
    appends its id per document (counted in the budget), records the
    convention in the manifest, and the loader-order stream cuts into
    floor(offset/budget) windows that never span a document boundary
    without the separator marking the seam."""
    from collections import defaultdict

    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_vocab,
    )
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        check_shard_manifest,
        read_token_id_shard,
        read_token_id_vocab,
        write_token_id_shards,
    )
    import hashlib

    merges = load_bpe_merges(spark, FIXTURE)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges, specials=("<unk>", "<eos>"))
    assert vocab["<unk>"] == 0 and vocab["<eos>"] == 1
    eos = vocab["<eos>"]
    rows = [(i, f"the data thing zed doc{i} " * (i % 4 + 1))
            for i in range(24)] + [(24, ""), (25, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "eosshards")
    budget = 32
    manifest = write_token_id_shards(docs, merges, out, n_shards=3,
                                     budget_tokens=budget,
                                     eos_token="<eos>")
    assert manifest["eos_token"] == "<eos>" and manifest["eos_id"] == eos
    assert read_token_id_vocab(spark, out) == vocab
    check_shard_manifest(spark, out)

    def shard_of(doc_id):
        h = hashlib.md5(f"{doc_id}:shard".encode()).hexdigest()[:8]
        return int(h, 16) % 3

    def ids_of(text):
        base = ([] if not text else
                [vocab.get(s, 0) for w in text.split()
                 for s in bpe_encode_word(w, ranks)])
        return base + [eos]    # every doc closes, even empty/NULL ones

    streams = defaultdict(list)
    bounds = defaultdict(list)          # stream positions of doc ends
    for doc_id, text in sorted(rows):
        k = shard_of(doc_id)
        streams[k].extend(ids_of(text))
        bounds[k].append(len(streams[k]) - 1)

    for k in range(3):
        back = read_token_id_shard(spark, out, k).collect()
        flat = [i for r in back for i in r.bpe_ids]
        assert flat == streams[k], k
        # every document's ids end with the separator, counted in
        # n_tokens and hence in the packing coordinates
        off = 0
        for r in back:
            assert r.bpe_ids[-1] == eos
            assert r.n_tokens == len(r.bpe_ids)
            assert r.start_offset == off
            assert r.chunk == r.start_offset // budget
            off += r.n_tokens
        # no window spans a document boundary without a separator:
        # between any two consecutive docs the stream carries eos at
        # the first doc's last position, whatever window cuts around it
        for pos in bounds[k]:
            assert streams[k][pos] == eos

    # a caller-supplied vocab missing the separator refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="eos_token"):
        write_token_id_shards(docs, merges, str(tmp_path / "bad"),
                              n_shards=2, budget_tokens=budget,
                              vocab=bpe_vocab(merges),
                              eos_token="<eos>")


def _mirror_train(corpus, n_merges, min_pair=2):
    """Reference-style BPE trainer (Sennrich get_stats/merge_vocab over
    a word-frequency dict) with the operator's pinned tiebreak — the
    independent implementation train_bpe_merges must reproduce."""
    from collections import Counter

    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        END_OF_WORD,
    )

    words = Counter(w for line in corpus for w in line.lower().split())
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (p1, p2), n = min(stats.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair:
            break
        merges.append((p1, p2))
        new = {}
        for syms, c in vocab.items():
            out, carry = [], None
            for s in syms:
                if carry is None:
                    carry = s
                elif carry == p1 and s == p2:
                    out.append(p1 + p2)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_train_bpe_merges_matches_reference_mirror(spark):
    """The distributed trainer reproduces the sequential reference
    algorithm merge for merge (same priorities, same tiebreaks) —
    including merges of already-merged symbols and the </w> marker."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_encode_word,
        train_bpe_merges,
    )

    corpus = ["the cat sat on the mat", "the dog and the cat",
              "that hat is the cat hat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    got = train_bpe_merges(docs, 12)
    assert got == _mirror_train(corpus, 12)
    # the trained table drives the EXISTING encoder: the corpus's most
    # frequent word compresses to one token
    ranks = {p: i for i, p in enumerate(got)}
    assert bpe_encode_word("the", ranks) == ["the</w>"]
    assert bpe_encode_word("cat", ranks) == ["cat</w>"]


def test_train_bpe_merges_early_stop_and_word_prune(spark):
    """min_pair_count stops training before it memorizes hapax pairs;
    min_word_count drops hapax words from the table entirely."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aa aa aa zq")], "doc_id long, text string")
    got = train_bpe_merges(docs, 50)  # asks for 50, corpus supports few
    # every learned merge involves the repeated word's symbols only
    assert 0 < len(got) < 50
    assert all("z" not in p1 + p2 and "q" not in p1 + p2
               for p1, p2 in got)
    pruned = train_bpe_merges(docs, 50, min_word_count=2)
    assert pruned == got  # zq was never mergeable anyway
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges(docs, 0)


def test_train_save_load_count_roundtrip(spark, tmp_path):
    """Trained merges ship like imported ones: save_bpe_merges →
    load_bpe_merges is the identity, and bpe_token_count under the
    trained tokenizer beats the character count (the merges DO
    compress) while agreeing with the shared python kernel."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_encode_word,
        bpe_token_count,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe_merges,
    )

    corpus = ["spark shuffles spark scans spark sorts",
              "spark plans spark jobs"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    merges = train_bpe_merges(docs, 16)
    path = str(tmp_path / "merges.txt")
    save_bpe_merges(spark, merges, path)
    assert load_bpe_merges(spark, path) == merges

    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_count(docs, merges, lowercase=True)
           .select("doc_id", "n_bpe_tokens").collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, line in enumerate(corpus):
        want = sum(len(bpe_encode_word(w, ranks)) for w in line.split())
        assert got[i] == want
        assert got[i] < sum(len(w) + 1 for w in line.split())  # compresses

    with pytest.raises(ValueError, match="round-trip"):
        save_bpe_merges(spark, [("a b", "c")], str(tmp_path / "bad.txt"))


def test_train_bpe_batch_merges_j1_identical_and_valid_batches(spark):
    """batch_merges=1 IS the sequential trainer (same argmax, same
    tiebreak); batch_merges>1 learns a merge table whose accepted
    pairs are mutually non-interacting per round, so every merge's
    count was honest at application time — on a conflict-free corpus
    the batched table equals the sequential one exactly."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        train_bpe_merges,
    )

    corpus = ["the cat sat on the mat", "the dog and the cat",
              "that hat is the cat hat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    seq = train_bpe_merges(docs, 8)
    assert train_bpe_merges(docs, 8, batch_merges=1) == seq

    # conflict-free top pairs whose follow-up merges ((ab,p) etc.) rank
    # BELOW the next candidate: the j=2 batch accepts the same two
    # pairs sequential would pick, then the last round agrees too
    dis = ["abp abp abp abp abp abq abq abq abr abr",
           "cds cds cds cds cdt cdt cdu"]
    ddocs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(dis)], "doc_id long, text string")
    dseq = train_bpe_merges(ddocs, 3)
    dbat = train_bpe_merges(ddocs, 3, batch_merges=2)
    assert dbat == dseq == _mirror_train(dis, 3)
    assert dseq[:2] == [("a", "b"), ("c", "d")]

    with pytest.raises(ValueError, match="batch_merges"):
        train_bpe_merges(docs, 4, batch_merges=0)


def test_train_bpe_batch_merges_documented_divergence(spark):
    """The documented j>1 approximation, pinned: sequential training
    follows the newly created dominant pair ((ab,c) then (abc,</w>)),
    while the batch had already accepted the round's non-interacting
    runner-up ((c,</w>)) — a genuinely different merge PATH. Both
    tables still compress the word to the same single token, and every
    accepted count was honest at application time."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        END_OF_WORD,
        bpe_encode_word,
        train_bpe_merges,
    )

    corpus = ["abc abc abc abc abc abc abc abc abc abc",
              "de de de de de de"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    seq = train_bpe_merges(docs, 3)
    bat = train_bpe_merges(docs, 3, batch_merges=2)
    assert seq == [("a", "b"), ("ab", "c"), ("abc", END_OF_WORD)]
    assert bat == [("a", "b"), ("c", END_OF_WORD), ("ab", "c" + END_OF_WORD)]
    # different merge paths, same terminal encoding
    for table in (seq, bat):
        ranks = {p: i for i, p in enumerate(table)}
        assert bpe_encode_word("abc", ranks) == ["abc" + END_OF_WORD]


def test_train_bpe_batch_merges_cuts_rounds(spark):
    """The point of batching: ceil(n/j) materialize rounds instead of
    n — counted via the trainer's per-round lineage cut."""
    import harvesting_extract_to_ttl_service_spark.operators.materialize as mat  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        train_bpe_merges,
    )

    corpus = ["spark shuffles spark scans spark sorts",
              "spark plans spark jobs maps spark"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")

    real = mat.materialize
    calls = {"n": 0}

    def counting(df, mode="local_checkpoint", eager=False):
        calls["n"] += 1
        return real(df, mode, eager)

    mat.materialize = counting
    try:
        calls["n"] = 0
        seq = train_bpe_merges(docs, 8)
        seq_rounds = calls["n"]
        calls["n"] = 0
        bat = train_bpe_merges(docs, 8, batch_merges=4)
        bat_rounds = calls["n"]
    finally:
        mat.materialize = real
    assert len(seq) == len(bat) == 8
    assert seq_rounds == 8
    assert bat_rounds <= 4  # conflicts may cost a round, never more jobs
