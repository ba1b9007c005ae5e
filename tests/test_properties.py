"""Property/randomized tests (SURVEY §5.2): operator invariants under
hypothesis-generated inputs, repack order restoration under shuffles, and the
KMV sketch accuracy bound."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from norsk_historisk_avis_ocr_ray.functions.textops import (
    clean_divider_noise,
    reflow_text,
)
from norsk_historisk_avis_ocr_ray.stages.repack import repack_table

text_lines = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=382),
            max_size=40),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(text_lines)
def test_clean_never_leaves_short_garbage_lines(lines):
    out = clean_divider_noise("\n".join(lines))
    for line in out.split("\n"):
        s = line.strip()
        assert not (0 < len(s) <= 2)


@settings(max_examples=200, deadline=None)
@given(text_lines)
def test_clean_never_leaves_blank_runs(lines):
    out = clean_divider_noise("\n".join(lines))
    assert "\n\n\n" not in out  # runs of 2+ blank lines collapsed to one


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=382),
               max_size=200))
def test_reflow_single_line_no_newlines(text):
    out = reflow_text(text)
    assert "\n" not in out
    assert "  " not in out
    assert out == out.strip()


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab -\n", max_size=100))
def test_reflow_idempotent(text):
    once = reflow_text(text)
    assert reflow_text(once) == once


@settings(max_examples=50, deadline=None)
@given(st.permutations(list(range(8))))
def test_repack_restores_offset_order(perm):
    """Physical row order must never matter — only (in_offset, region_idx)."""
    rows = [{"doc_id": "d", "in_offset": i, "region_idx": 0, "kind": "text",
             "text": f"t{i}", "media_ref": "", "error": None}
            for i in range(8)]
    shuffled = [rows[i] for i in perm]
    out = repack_table(pa.Table.from_pylist(shuffled))
    spans = out["spans"][0].as_py()
    assert [s["text"] for s in spans] == [f"t{i}" for i in range(8)]
    assert [s["offset"] for s in spans] == list(range(8))


def test_kmv_accuracy():
    from norsk_historisk_avis_ocr_ray.functions.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )
    rng = np.random.default_rng(5)
    values = [f"user-{i}" for i in rng.integers(0, 5000, size=40000)]
    exact = len(set(values))
    # sketch per 10k-chunk, then merge — the distributed pattern
    sketches = [kmv_sketch(values[i:i + 10000]) for i in range(0, 40000, 10000)]
    est = kmv_estimate(kmv_merge(sketches))
    assert abs(est - exact) / exact < 0.15


def test_hll_accuracy_and_merge():
    from norsk_historisk_avis_ocr_ray.functions.sketch import (
        hll_estimate,
        hll_registers,
    )
    rng = np.random.default_rng(5)
    values = rng.integers(0, 5000, size=40000)
    exact = len(set(values.tolist()))
    # partial registers per 10k-chunk, elementwise-max merge — the
    # distributed pattern; must equal the single-pass registers exactly
    parts = [hll_registers(values[i:i + 10000])
             for i in range(0, 40000, 10000)]
    merged = np.maximum.reduce(parts)
    assert (merged == hll_registers(values)).all()
    est = hll_estimate(merged)
    assert abs(est - exact) / exact < 0.15   # m=256 → ~6.5% typical error


def test_hll_bit_length_u64_matches_python():
    from norsk_historisk_avis_ocr_ray.functions.sketch import _bit_length_u64

    rng = np.random.default_rng(11)
    # adversarial values around powers of two (float rounding overshoots)
    edges = []
    for k in range(1, 57):
        edges += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    w = np.array([0, 1, 2, 3] + edges
                 + rng.integers(0, 1 << 56, size=4096).tolist(),
                 dtype=np.uint64)
    got = _bit_length_u64(w)
    exp = np.array([int(x).bit_length() for x in w], np.int64)
    assert (got == exp).all()


def test_kmv_exact_below_k():
    from norsk_historisk_avis_ocr_ray.functions.sketch import (
        kmv_estimate,
        kmv_sketch,
    )
    est = kmv_estimate(kmv_sketch([f"v{i}" for i in range(100)]))
    assert est == 100.0


def test_bpe_split_counts_match_python_reference():
    """The RE2 BPE-ish pre-tokenizer count must agree with a plain-Python
    re.findall over the same pattern (pins the oracle's semantics)."""
    import re
    import pyarrow as pa
    import pyarrow.compute as pc
    from norsk_historisk_avis_ocr_ray.functions.textstats import BPE_SPLIT

    texts = ["hello world", "it's 2026, really!", "a  b\tc", "",
             "x9y9 ... e2e", "don't re-run; we'll see 3.14 today"]
    got = pc.count_substring_regex(pa.array(texts, pa.string()),
                                   BPE_SPLIT).to_pylist()
    # Python re lacks \p{..}; hand-written ASCII equivalent (inputs are ASCII)
    pypat = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+"
             r"| ?[^\sa-zA-Z0-9]+|\s+")
    assert BPE_SPLIT == (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
                         r"| ?[^\s\p{L}\p{N}]+|\s+")
    want = [len(re.findall(pypat, t)) for t in texts]
    assert got == want


def test_winnow_guarantee_and_determinism():
    """Winnowing (SIGMOD'03): texts sharing a substring of length
    >= w + k - 1 must share at least one selected hash; selection is
    deterministic."""
    import numpy as np
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        WINNOW_K, WINNOW_W, winnow_hashes)

    shared = "x" * 0 + "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    a = "PREFIX AAA " + shared + " SUFFIX BBB"
    b = "totally other start " + shared + " and another end"
    ha, hb = winnow_hashes(a), winnow_hashes(b)
    assert len(np.intersect1d(ha, hb)) >= 1
    assert np.array_equal(winnow_hashes(a), ha)
    # unrelated texts share nothing at this length
    c = winnow_hashes("0123456789abcdefghij" * 2)
    assert len(np.intersect1d(ha, c)) == 0
    # degenerate inputs don't crash
    assert len(winnow_hashes("")) >= 0
    assert len(winnow_hashes("ab")) >= 1


def test_winnow_fingerprint_query(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        winnow_fingerprint)

    df = winnow_fingerprint("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "n_fingerprints", "fp_digest"}
    assert (df["n_fingerprints"] > 0).all()
    # identical text => identical digest is implied by determinism; distinct
    # word-soup docs should almost all get distinct digests
    assert df["fp_digest"].nunique() > 450


def test_cms_never_underestimates_and_finds_exact_top(ray_session):
    """CMS point estimates are >= the true count by construction; with
    width >> cardinality the top-10 must equal the exact top-10."""
    import pandas as pd
    import pyarrow.parquet as pq
    from norsk_historisk_avis_ocr_ray.functions.sketch import approx_top_users

    # exact-oracle mode: all-distinct candidates (the driver-gate call)
    got = approx_top_users("/root/testdata/sf0.001", cand_per_batch=None)
    # bounded default (top-64 candidates per batch): still never
    # underestimates and still finds the planted top at this scale
    bounded = approx_top_users("/root/testdata/sf0.001")
    assert len(bounded) == 10
    exact = (pq.read_table("/root/testdata/sf0.001/events.parquet",
                           columns=["user_id"]).to_pandas()
             .value_counts("user_id").rename("n").reset_index())
    truth = dict(zip(exact["user_id"], exact["n"]))
    assert len(got) == 10
    for uid, est in zip(got["user_id"], got["est_events"]):
        assert est >= truth[int(uid)]
    exact = exact.sort_values(["n", "user_id"],
                              ascending=[False, True]).head(10)
    assert set(got["user_id"]) == set(exact["user_id"])
    # width 2048 >> distinct users: estimates should in fact be exact
    assert all(int(e) == truth[int(u)]
               for u, e in zip(got["user_id"], got["est_events"]))


def test_quantile_sketch_rank_error(ray_session):
    """The bottom-k sample quantiles must land within ~2/sqrt(k) rank error
    of the exact per-type quantiles."""
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.sketch import (
        QSK_K, approx_group_quantiles)

    sf = "/root/testdata/sf0.01"
    got = approx_group_quantiles(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exact = con.sql("""
        SELECT event_type, list(value ORDER BY value) AS vals
        FROM events GROUP BY event_type""").df()
    tol = 2.0 / np.sqrt(QSK_K)  # rank tolerance
    for _, row in got.iterrows():
        vals = np.array(
            exact.loc[exact["event_type"] == row["event_type"], "vals"]
            .iloc[0])
        n = len(vals)
        for p in (50, 90, 99):
            est = row[f"p{p}"]
            true_rank = np.searchsorted(vals, est) / n
            assert abs(true_rank - p / 100) <= tol, (
                row["event_type"], p, est, true_rank)


def test_quantile_sketch_partition_invariant(ray_session, tmp_path):
    """Sample membership is a pure function of event_id: the sketch result
    must be identical when the input arrives as 1 block or 16 blocks."""
    import pyarrow.parquet as pq
    import ray as _ray

    from norsk_historisk_avis_ocr_ray.functions.sketch import (
        approx_group_quantiles)

    sf = "/root/testdata/sf0.001"
    a = approx_group_quantiles(sf)
    # re-write the events table split into many small row groups
    t = pq.read_table(f"{sf}/events.parquet")
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=500)
    import pandas as pd
    b = approx_group_quantiles(str(tmp_path))
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e7, max_value=1e7, allow_nan=False,
                 allow_infinity=False),
       st.integers(min_value=0, max_value=6))
def test_round_half_away_matches_duckdb(x, d):
    """The engine's oracle-compat rounding must agree with DuckDB's round()
    bit-for-bit — the root cause of the two round-1 exact-hash failures was
    np.round's half-even mode diverging on ...5 boundaries."""
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)

    got = float(round_half_away(np.array([x]), d)[0])
    exp = duckdb.connect().execute(
        "SELECT round(CAST(? AS DOUBLE), ?)", [x, d]).fetchone()[0]
    assert got == exp, (x, d, got, exp)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=60))
def test_space_split_matches_duckdb_string_split(s):
    """Single-space tokenization parity: Python s.split(' ') must equal
    DuckDB string_split(s, ' ') element-for-element (the invariant the
    cluster/line-dedup/tfidf oracles rely on)."""
    import duckdb

    exp = duckdb.connect().execute(
        "SELECT string_split(?, ' ')", [s]).fetchone()[0]
    assert s.split(" ") == exp, (s, exp)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=2000),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_pcm16_roundtrip_property(samples, rate):
    from norsk_historisk_avis_ocr_ray.sources.wav import (
        decode_wav_mono16, encode_wav)

    pcm = np.array(samples, np.int16)
    out, r = decode_wav_mono16(encode_wav(pcm, rate))
    assert r == rate
    assert np.array_equal(out, pcm)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 12), st.integers(1, 16), st.integers(1, 16),
       st.integers(0, 2 ** 32 - 1))
def test_y4m_roundtrip_property(n, h, w, seed):
    from norsk_historisk_avis_ocr_ray.sources.y4m import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    for cs in ("mono", "420", "444"):
        # C420 chroma planes need even luma dims per spec; mono/444 don't,
        # but our neutral-chroma writer only emits w*h/2 bytes — keep dims
        # even for the 420 case
        if cs == "420" and (h % 2 or w % 2):
            continue
        out, ww, hh, _ = decode_y4m(encode_y4m(frames, colorspace=cs))
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, frames)


# --- round-3 segment-2 helpers ---------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50))
def test_sm64_sql_projection_matches_numpy(keys):
    """The DuckDB splitmix64 projection (the foundation of every sketch
    oracle) is bit-identical to the engine's vectorized mixer."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _sm64_proj
    from norsk_historisk_avis_ocr_ray.functions.sketch import _splitmix64

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": np.array(keys, np.int64)}))
    got = [int(r[0]) for r in con.sql(
        f"SELECT sm_h FROM (SELECT {_sm64_proj('x')} FROM t)").fetchall()]
    exp = _splitmix64(np.array(keys, np.uint64))
    assert got == [int(v) for v in exp]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50))
def test_cms_cols_sql_matches_numpy(keys):
    import duckdb
    import pandas as pd

    from __ray_entry__ import _cms_cols_proj, _sm64_proj
    from norsk_historisk_avis_ocr_ray.functions.sketch import _cms_indices

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": np.array(keys, np.int64)}))
    rows = con.sql(
        f"SELECT c1, c2, c3, c4 FROM (SELECT x, {_cms_cols_proj()} "
        f"FROM (SELECT x, {_sm64_proj('x')} FROM t))").fetchall()
    got = np.array(rows, np.int64).T
    exp = _cms_indices(np.array(keys, np.int64))
    assert np.array_equal(got, exp)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=30), max_size=6),
       st.integers(min_value=2, max_value=5))
def test_gram_hashes_all_counts_equal_string_grams(texts, k):
    """Hash-space k-gram occurrence counting == string-space counting
    (collisions aside): same number of windows per doc, and the multiset
    of per-gram counts matches the brute-force string version."""
    from collections import Counter

    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        _gram_hashes_all, _hash_tokens_batch)

    ths = _hash_tokens_batch(texts)
    brute = Counter()
    hashed = Counter()
    for txt, th in zip(texts, ths):
        toks = (txt or "").lower().split()
        assert len(th) == len(toks)
        grams = [" ".join(toks[i:i + k])
                 for i in range(max(len(toks) - k + 1, 0))]
        hs = _gram_hashes_all(th, k)
        assert len(hs) == len(grams)
        brute.update(grams)
        hashed.update(int(h) for h in hs)
    assert sorted(brute.values()) == sorted(hashed.values())


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="xyz ", max_size=40), max_size=5))
def test_classifier_features_l1_normalized(texts):
    from norsk_historisk_avis_ocr_ray.functions.classifier import (
        _features_batch)

    for (ids, counts), txt in zip(_features_batch(texts), texts):
        toks = (txt or "").lower().split()
        assert counts.sum() == len(toks)
        assert len(ids) == len(set(ids))        # unique feature ids


# --- round-4b pure-kernel properties --------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdef gh", min_size=8, max_size=120),
       st.integers(min_value=8, max_value=120))
def test_winnow_prefix_selection_subset(text, m):
    """Winnowing windows look only BACKWARD, so a character-prefix's
    selected set is a subset of the full text's (the q_containment_pairs
    prefix-containment-equals-1 argument)."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        winnow_hashes)
    m = min(m, len(text))
    if m < 8:
        return
    pre = set(winnow_hashes(text[:m]).tolist())
    full = set(winnow_hashes(text).tolist())
    assert pre <= full


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcd ", min_size=11, max_size=30),
       st.text(alphabet="xyz w", max_size=20),
       st.text(alphabet="pqr s", max_size=20))
def test_winnow_shared_substring_guarantee(shared, left, right):
    """Schleimer/Wilkerson/Aiken guarantee: two texts sharing a substring
    of length >= w + k - 1 = 11 share at least one selected hash."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        winnow_hashes)
    t1 = left + shared
    t2 = shared + right
    s1 = set(winnow_hashes(t1).tolist())
    s2 = set(winnow_hashes(t2).tolist())
    assert s1 & s2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 10**6), st.integers(1, 10**4)),
                min_size=2, max_size=30, unique_by=lambda t: t[0]),
       st.integers(2, 16))
def test_es_key_ranking_scale_invariant(docs, c):
    """Efraimidis-Spirakis ranking is invariant to scaling all weights by
    a constant (key = ln(u)/w): q_weighted_sample's pick is a function of
    relative weights only."""
    import hashlib
    import math

    def md5_64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")

    def ranking(scale):
        keys = []
        for d, w in docs:
            u = md5_64(str(d)) / float(1 << 64)
            keys.append((math.log(u) / (w * scale), d))
        return [d for _, d in sorted(keys, reverse=True)]

    assert ranking(1) == ranking(c)
