"""Round-3 additions (segment c): per-user event-type pivot, bigram
collocation mining."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, user_id, value, event_type):
    n = len(user_id)
    ev = pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "user_id": pa.array(user_id, pa.int64()),
        "ts": pa.array(list(range(n)), pa.timestamp("us")),
        "value": pa.array(value, pa.float64()),
        "event_type": pa.array(event_type),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def test_pivot_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_pivot

    _write_events(tmp_path,
                  user_id=[1, 1, 1, 2, 2],
                  value=[1.5, 2.25, 4.0, 10.0, 0.125],
                  event_type=["click", "click", "view", "view", "buy"])
    out = (q_pivot(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # derived column set: sorted type vocabulary from the data
    assert list(out.columns) == ["user_id", "n_buy", "n_click", "n_view",
                                 "v_buy", "v_click", "v_view"]
    u1 = out.iloc[0]
    assert (u1["n_click"], u1["n_view"], u1["n_buy"]) == (2, 1, 0)
    assert u1["v_click"] == 3.75 and u1["v_view"] == 4.0 and u1["v_buy"] == 0.0
    u2 = out.iloc[1]
    assert (u2["n_click"], u2["n_view"], u2["n_buy"]) == (0, 1, 1)
    assert u2["v_view"] == 10.0 and u2["v_buy"] == 0.13  # rounded half-away
    assert out["n_click"].dtype == np.int64
    assert out["v_click"].dtype == np.float64


def test_bigram_topk_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_bigram_topk

    _write_docs(tmp_path, [
        "The cat sat",          # the cat, cat sat
        "the cat  sat down",    # multi-space still one split
        "cat",                  # no bigram
        "",                     # no bigram
        "sat the cat",          # sat the, the cat
    ])
    out = q_bigram_topk(str(tmp_path))
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    assert got == {("the", "cat"): 3, ("cat", "sat"): 2,
                   ("sat", "down"): 1, ("sat", "the"): 1}
    # ordering: count desc then lexicographic
    assert out.iloc[0][["w1", "w2"]].tolist() == ["the", "cat"]
    assert out.iloc[1][["w1", "w2"]].tolist() == ["cat", "sat"]
    assert out["n"].dtype == np.int64


def test_pivot_value_sums_match_pandas(tmp_path, ray_session):
    """Randomized cross-check: pivot sums equal a direct pandas pivot on
    the same int64 cent grid the engine folds on (round-4 quantization —
    ``sum(round(v*100))/100`` — which makes the sum independent of
    partition/summation order; see functions/relational._cents)."""
    from norsk_historisk_avis_ocr_ray.functions.relational import q_pivot
    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)

    rng = np.random.RandomState(11)
    n = 400
    users = rng.randint(0, 25, n).tolist()
    vals = (rng.rand(n) * 100).tolist()
    types = rng.choice(["a", "b", "c"], n).tolist()
    _write_events(tmp_path, users, vals, types)
    out = (q_pivot(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    df = pd.DataFrame({
        "u": users,
        "qv": round_half_away(np.asarray(vals) * 100.0, 0).astype(np.int64),
        "t": types})
    for ty in ["a", "b", "c"]:
        exp_n = df[df["t"] == ty].groupby("u").size()
        exp_v = df[df["t"] == ty].groupby("u")["qv"].sum()
        for _, row in out.iterrows():
            assert row[f"n_{ty}"] == exp_n.get(row["user_id"], 0)
            assert row[f"v_{ty}"] == float(round_half_away(
                exp_v.get(row["user_id"], 0) / 100.0, 2))


def _brute_substring(texts, k=4, min_count=2):
    from collections import Counter
    grams = []
    for t in texts:
        toks = (t or "").lower().split()
        grams.append([" ".join(toks[i:i + k])
                      for i in range(max(len(toks) - k + 1, 0))])
    cnt = Counter(g for gs in grams for g in gs)
    out = []
    for i, gs in enumerate(grams):
        nd = sum(1 for g in gs if cnt[g] >= min_count)
        out.append((i, len(gs), nd))
    return out


def _check_substring(tmp_path, ray_session, **kw):
    from norsk_historisk_avis_ocr_ray.functions.dedup import dedup_substring

    texts = [
        "a b c d a b c d",        # internal repeat of 'a b c d'
        "a b c d x y z w q",      # shares the 'a b c d' window
        "p q r s t u v",          # unique windows
        "x y",                    # too short: zero windows
        "",                       # empty
        "p q r s t u v",          # exact dup of doc 2: every window dup
    ]
    _write_docs(tmp_path, texts)
    out = (dedup_substring(str(tmp_path), **kw).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _brute_substring(texts)
    assert len(out) == len(texts)
    for doc_id, n_grams, n_dup in exp:
        row = out.iloc[doc_id]
        assert row["n_grams"] == n_grams, (doc_id, row["n_grams"], n_grams)
        assert row["n_dup"] == n_dup, (doc_id, row["n_dup"], n_dup)
        assert row["dup_frac"] == round(n_dup / max(n_grams, 1), 6)


def test_dedup_substring_broadcast_path(tmp_path, ray_session):
    _check_substring(tmp_path, ray_session)


def test_dedup_substring_distributed_join_path(tmp_path, ray_session):
    """broadcast_cutover=0 forces the >cutover dataflow: exploded gram rows
    hash-join the dup vocabulary instead of probing a broadcast array."""
    _check_substring(tmp_path, ray_session, broadcast_cutover=0)


def test_dsir_score_prefers_target_like_docs(tmp_path, ray_session):
    """Docs sharing the target slice's vocabulary must outscore docs that
    don't — the importance-resampling selection signal."""
    import math
    import hashlib
    import pyarrow as pa
    import pyarrow.parquet as pq
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        DSIR_N_FEATURES, dsir_score)

    texts = ["norsk avis tekst", "norsk avis arkiv", "norsk tekst arkiv",
             "random noise words here", "norsk avis tekst arkiv",
             "totally unrelated junk tokens"]
    sources = ["src0", "src0", "src0", "srcX", "srcX", "srcX"]
    t = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                  "text": pa.array(texts),
                  "source": pa.array(sources)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = (dsir_score(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 4 (raw, target-like) must outscore docs 3 and 5 (raw, unrelated)
    s = out.set_index("doc_id")["score_micro"]
    assert s[4] > s[3] and s[4] > s[5]
    assert s[4] > 0 and s[3] < 0 and s[5] < 0

    # brute-force exact check for one doc
    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:16],
                   16) % DSIR_N_FEATURES
    from collections import Counter
    nt, nr = Counter(), Counter()
    for txt, src in zip(texts, sources):
        for tok in txt.lower().split():
            (nt if src == "src0" else nr)[bucket(tok)] += 1
    t_tot = sum(nt.values()) + DSIR_N_FEATURES
    r_tot = sum(nr.values()) + DSIR_N_FEATURES

    def w(b):
        x = (math.log((nt[b] + 1) / t_tot)
             - math.log((nr[b] + 1) / r_tot)) * 1e6
        return int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))

    exp4 = sum(w(bucket(tok)) for tok in texts[4].lower().split())
    assert s[4] == exp4


def _write_labeled_docs(tmp_path, texts, langs):
    t = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(langs)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def _clf_corpus():
    pos_vocab = "den norske avisen trykket nyheter om byen".split()
    neg_vocab = "quick brown fox jumps over lazy dog today".split()
    rng = np.random.RandomState(5)
    texts, langs = [], []
    for i in range(120):
        pos = i % 2 == 0
        vocab = pos_vocab if pos else neg_vocab
        texts.append(" ".join(rng.choice(vocab, 12)))
        langs.append("en" if pos else "xx")
    return texts, langs


def test_quality_classifier_learns_planted_separation(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.classifier import (
        quality_classifier, train_quality_classifier)

    texts, langs = _clf_corpus()
    _write_labeled_docs(tmp_path, texts, langs)

    _, losses, _ = train_quality_classifier(str(tmp_path))
    assert losses[-1] < losses[0]          # optimization makes progress
    assert losses[-1] < 0.2                # separable corpus -> low loss

    out = (quality_classifier(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    acc = (out["pred"] == out["label"]).mean()
    assert acc == 1.0                      # disjoint vocabularies separate


def test_quality_classifier_partitioning_deterministic(tmp_path,
                                                       ray_session):
    """Integer-quantized gradient partials make training bit-identical
    under any block split — 1 block vs 7 blocks must agree exactly."""
    from norsk_historisk_avis_ocr_ray.functions.classifier import (
        quality_classifier)

    texts, langs = _clf_corpus()
    _write_labeled_docs(tmp_path, texts, langs)
    a = (quality_classifier(str(tmp_path), iters=4, num_blocks=1)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (quality_classifier(str(tmp_path), iters=4, num_blocks=7)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)    # exact, including float probs


def test_semdedup_planted_duplicates(tmp_path, ray_session):
    """Three planted near-dup cliques + singletons: exactly one survivor
    per clique (the lowest vec_id), singletons all survive."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import semdedup

    rng = np.random.RandomState(13)
    dim = 16
    base = rng.randn(6, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, clique = [], []
    vid = 0
    for b in range(3):            # cliques of 3 near-identical vectors
        for _ in range(3):
            v = base[b] + rng.randn(dim) * 0.001
            vecs.append(v / np.linalg.norm(v))
            clique.append(b)
            vid += 1
    for b in range(3, 6):         # singletons, well separated
        vecs.append(base[b])
        clique.append(b)
        vid += 1
    t = pa.table({
        "vec_id": pa.array(list(range(vid)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * vid, pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    out = (semdedup(str(tmp_path), n_clusters=4).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(out) == vid
    kept = set(out.loc[out["keep"] == 1, "vec_id"])
    # one survivor per clique: the minimum vec_id of each
    for b, members in [(0, [0, 1, 2]), (1, [3, 4, 5]), (2, [6, 7, 8])]:
        assert set(members) & kept == {min(members)}
    # singletons survive
    assert {9, 10, 11} <= kept
    # dropped rows carry the high similarity that killed them
    assert (out.loc[out["keep"] == 0, "max_sim"] >= 0.95).all()


def test_bpe_train_hand_computed_merges(tmp_path, ray_session):
    """Corpus 'lower lower lowest' x counts: the first merges are
    hand-checkable ('l'+'o' dominates, then 'lo'+'w', ...)."""
    from norsk_historisk_avis_ocr_ray.functions.bpe import bpe_train

    # 'low' x6, 'lower' x3, 'lowest' x2  -> 'lo' pair count 11
    _write_docs(tmp_path, ["low low low low low low",
                           "lower lower lower lowest lowest"])
    out = bpe_train(str(tmp_path), n_merges=4)
    assert out.iloc[0][["left", "right", "pair_count"]].tolist() == \
        ["l", "o", 11]
    assert out.iloc[1][["left", "right", "pair_count"]].tolist() == \
        ["lo", "w", 11]
    # after 'low': 'low</w>' x6 (count 6) vs 'low'+'e' (3+2=5)
    assert out.iloc[2][["left", "right", "pair_count"]].tolist() == \
        ["low", "</w>", 6]
    assert out.iloc[3][["left", "right", "pair_count"]].tolist() == \
        ["low", "e", 5]


def test_bpe_histogram_equals_corpus_semantics(tmp_path, ray_session):
    """Training on the histogram must equal training on the raw corpus —
    a naive per-occurrence reference implementation agrees."""
    from norsk_historisk_avis_ocr_ray.functions.bpe import (
        _train_merges, bpe_train)

    rng = np.random.RandomState(3)
    vocab = ["alpha", "beta", "alphabet", "bet", "abba", "ba"]
    words = rng.choice(vocab, 300).tolist()
    texts = [" ".join(words[i:i + 20]) for i in range(0, 300, 20)]
    _write_docs(tmp_path, texts)
    out = bpe_train(str(tmp_path), n_merges=10)

    # reference: histogram built naively from the same corpus
    from collections import Counter
    c = Counter(w for t in texts for w in t.lower().split())
    hist = pd.DataFrame({"word": list(c.keys()),
                         "n": np.array(list(c.values()), np.int64)})
    exp = _train_merges(hist, 10)
    got = [tuple(r) for r in out[["rank", "left", "right",
                                  "pair_count"]].itertuples(index=False)]
    assert got == exp


def test_unigram_ppl_flags_noise(tmp_path, ray_session):
    """Repetitive typical text gets LOW perplexity; a doc of rare junk
    tokens gets HIGH perplexity — the quality-filter signal."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_unigram_ppl

    common = "the quick brown fox jumps over the lazy dog"
    texts = [common] * 20 + ["zxqv jkwp qqqz mmvx bbnn"]
    _write_docs(tmp_path, texts)
    out = (q_unigram_ppl(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 21
    typical = out.iloc[0]["ppl"]
    junk = out.iloc[20]["ppl"]
    assert junk > typical * 5
    assert (out.iloc[:20]["ppl"] == typical).all()   # identical docs tie


def test_image_phash_recovers_planted_duplicates(ray_session):
    """A noisy re-scan of an image must pair with its original (small
    hamming); structurally different images must not pair."""
    import ray
    from norsk_historisk_avis_ocr_ray.sources.codec import encode_image
    from norsk_historisk_avis_ocr_ray.stages.multimodal import (
        ImagePHashStage, image_phash_pairs)

    rng = np.random.RandomState(21)
    # two structured base images (block patterns survive downscaling)
    base_a = np.kron(rng.randint(0, 2, (8, 8)), np.ones((16, 16))) * 255
    base_b = np.kron(rng.randint(0, 2, (8, 8)), np.ones((16, 16))) * 255
    noisy_a = np.clip(base_a + rng.randn(128, 128) * 8, 0, 255)
    imgs = {"orig_a": base_a, "rescan_a": noisy_a, "other_b": base_b}
    t = pa.table({
        "media_ref": pa.array(list(imgs.keys()), pa.string()),
        "image": pa.array([encode_image(v.astype(np.uint8))
                           for v in imgs.values()], pa.binary()),
        "width": pa.array([128] * 3, pa.int32()),
        "height": pa.array([128] * 3, pa.int32()),
        "codec": pa.array(["raw-zlib"] * 3, pa.string())})
    ds = ray.data.from_arrow(t)
    hashes = ds.map_batches(ImagePHashStage, batch_format="pyarrow",
                            batch_size=8, concurrency=1, num_cpus=1)
    pairs = image_phash_pairs(hashes)
    got = {(r.a, r.b) for r in pairs.itertuples()}
    assert ("orig_a", "rescan_a") in got
    assert all("other_b" not in p for p in got)
    ham = pairs.set_index(["a", "b"]).loc[("orig_a", "rescan_a"), "hamming"]
    assert int(ham) <= 6


def test_bloom_inactive_false_positive_path(tmp_path, ray_session):
    """A deliberately tiny filter (16 bits) forces false positives, so the
    verify join must reject them — the answer stays exactly the anti join."""
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_bloom_inactive)

    n_cust = 200
    active = list(range(0, 40))               # users 0..39 have events
    cust = pa.table({
        "c_custkey": pa.array(list(range(n_cust)), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
        "c_mktsegment": pa.array(["SEG"] * n_cust),
        "c_acctbal": pa.array([float(i) for i in range(n_cust)],
                              pa.float64())})
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    ev = pa.table({
        "event_id": pa.array(list(range(len(active))), pa.int64()),
        "user_id": pa.array(active, pa.int64()),
        "ts": pa.array([0] * len(active), pa.timestamp("us")),
        "value": pa.array([1.0] * len(active), pa.float64()),
        "event_type": pa.array(["t"] * len(active))})
    pq.write_table(ev, str(tmp_path / "events.parquet"))

    out = q_bloom_inactive(str(tmp_path), bits=16)
    assert out["c_custkey"].tolist() == list(range(40, n_cust))

    # sanity: with 16 bits and 40 keys the filter really does fire FPs
    # (otherwise this test proves nothing)
    import numpy as np
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        _bloom_positions)
    bloom = np.zeros(16, bool)
    pos = _bloom_positions(np.array(active, np.int64), 16)
    bloom[pos.ravel()] = True
    inactive_keys = np.arange(40, n_cust, dtype=np.int64)
    q = _bloom_positions(inactive_keys, 16)
    fp = (bloom[q[0]] & bloom[q[1]] & bloom[q[2]]).sum()
    assert fp > 0


def _seq_apply_reference(word, merges):
    """Independent reference: apply merges in RANK order, each replacing
    all occurrences left-to-right (Sennrich-style), vs the stage's
    lowest-rank-first greedy — the classic equivalence."""
    seq = list(word) + ["</w>"]
    for _, left, right, _ in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return tuple(seq)


def test_bpe_encode_matches_sequential_reference(tmp_path, ray_session):
    import hashlib
    from norsk_historisk_avis_ocr_ray.functions.bpe import (
        BpeApplyStage, bpe_encode, bpe_train)

    rng = np.random.RandomState(7)
    vocab = ["lower", "lowest", "low", "newer", "new", "wider"]
    texts = [" ".join(rng.choice(vocab, 15)) for _ in range(12)]
    _write_docs(tmp_path, texts)

    merges_df = bpe_train(str(tmp_path), n_merges=12)
    merges = [(int(r.rank), r.left, r.right, int(r.pair_count))
              for r in merges_df.itertuples(index=False)]

    # stage-level equivalence vs the independent sequential reference
    stage = BpeApplyStage(merges)
    for w in vocab:
        assert stage._encode_word(w) == _seq_apply_reference(w, merges), w

    # end-to-end digests agree with a locally recomputed encode
    out = (bpe_encode(str(tmp_path), n_merges=12).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, txt in enumerate(texts):
        toks = []
        for w in txt.split():
            toks.extend(_seq_apply_reference(w, merges))
        assert out.loc[i, "n_bpe_tokens"] == len(toks)
        assert out.loc[i, "tok_digest"] == hashlib.md5(
            "\x00".join(toks).encode()).hexdigest()
