"""Planted ground truth for the round-4b operators: q_basket_pairs /
q_basket_rules (market-basket mining + A-Priori rules), q_zipf_slope
(Zipf OLS on the micro-quantized log grid), q_silhouette (integer-grid
cluster silhouette), emb_dbscan (integer eps-graph density clustering),
q_minhash_recall (LSH quality eval), q_containment_pairs (winnowing
containment), q_srp_signatures (SRP cosine sketch), q_emb_histogram
(per-dim drift histogram) and q_lsh_bucket_stats (band-bucket skew
forecast). Exact SQL equality is enforced by tools/check_oracle.py;
these pin hand-computable semantics on tiny corpora."""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, baskets):
    """baskets: list of (orderkey, [partkeys])."""
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_partkey": pa.array(pk, pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_basket_pairs_matches_bruteforce(ray_session, tmp_path):
    baskets = [(1, [1, 2, 3]), (2, [2, 3]), (3, [2, 3, 4]),
               (4, [1, 4]), (5, [2, 3, 4, 4]),   # dup line collapses
               (6, [5])]                          # singleton: no pairs
    sf = _write_lineitem(tmp_path, baskets)

    counts = {}
    for _, parts in baskets:
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_basket_pairs)
    out = q_basket_pairs(sf)
    assert list(out.columns) == ["part_a", "part_b", "n_orders"]
    got = [((a, b), n) for a, b, n in
           zip(out["part_a"], out["part_b"], out["n_orders"])]
    assert got == exp
    # (2,3) co-occurs in baskets 1, 2, 3 and 5 (the dup line collapses)
    assert got[0] == ((2, 3), 4)


def test_basket_pairs_empty(ray_session, tmp_path):
    sf = _write_lineitem(tmp_path, [])
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_basket_pairs)
    out = q_basket_pairs(sf)
    assert len(out) == 0
    assert list(out.columns) == ["part_a", "part_b", "n_orders"]


# --- q_zipf_slope ---------------------------------------------------------------


def _write_texts(tmp_path, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _ols_fit(freqs):
    """Independent quantized-log OLS replication (math.log, pure ints)."""
    import math
    qx = [round(1e6 * math.log(r + 1)) for r in range(len(freqs))]
    qy = [round(1e6 * math.log(f)) for f in freqs]
    n = len(freqs)
    sx, sy = sum(qx), sum(qy)
    sxy = sum(a * b for a, b in zip(qx, qy))
    sxx = sum(a * a for a in qx)
    syy = sum(b * b for b in qy)
    num, denx, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    slope = float(num) / float(denx)
    r2 = 0.0 if deny == 0 else (float(num) * float(num)) / (
        float(denx) * float(deny))
    return slope, r2


def test_zipf_slope_recovers_planted_exponent(ray_session, tmp_path):
    """A corpus whose token frequencies follow a 1/rank curve must fit
    slope ≈ -1: assert exact equality against an independent quantized-log
    OLS replication, plus a loose natural band."""
    # freq(tok_i) = max(240 // (i+1), 1): a 1/rank curve, 40 tokens
    freqs = [max(240 // (i + 1), 1) for i in range(40)]
    words = []
    for i, f in enumerate(freqs):
        words.extend([f"tok{i:03d}"] * f)
    # spread across docs so the combine actually folds partials
    texts = [" ".join(words[j::7]) for j in range(7)]
    sf = _write_texts(tmp_path, texts)

    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_zipf_slope)
    out = q_zipf_slope(sf)
    assert list(out.columns) == ["n_terms", "zipf_slope", "r2"]
    assert out["n_terms"].iloc[0] == 40
    # ground truth: ranks are by (freq desc, tok asc); our tokens sort in
    # rank order already, and freqs are distinct-or-tied consistently
    ranked = sorted(zip([-f for f in freqs],
                        [f"tok{i:03d}" for i in range(40)]))
    exp_slope, exp_r2 = _ols_fit([-f for f, _ in ranked])
    assert abs(out["zipf_slope"].iloc[0] - round(exp_slope, 6)) < 1e-9
    assert abs(out["r2"].iloc[0] - round(exp_r2, 6)) < 1e-9
    assert -1.35 < out["zipf_slope"].iloc[0] < -0.75
    assert out["r2"].iloc[0] > 0.9


def test_zipf_slope_flat_corpus_r2_zero(ray_session, tmp_path):
    """All tokens equally frequent: slope 0, R² defined as 0 (deny = 0)."""
    texts = ["alpha beta gamma delta", "alpha beta gamma delta"]
    sf = _write_texts(tmp_path, texts)
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_zipf_slope)
    out = q_zipf_slope(sf)
    assert out["zipf_slope"].iloc[0] == 0.0
    assert out["r2"].iloc[0] == 0.0


# --- q_silhouette ---------------------------------------------------------------


def _write_emb(tmp_path, vecs):
    pq.write_table(
        pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_silhouette_separated_clusters_score_high(ray_session, tmp_path):
    """Three tight orthogonal groups, contiguous in id order so the
    id-spread init seeds one centroid per group: every cluster's mean
    silhouette must be near 1."""
    rng = np.random.default_rng(7)
    vecs = []
    for axis in range(3):
        for _ in range(10):
            v = rng.normal(0, 0.01, 9)
            v[axis * 3] += 5.0
            vecs.append(v)
    sf = _write_emb(tmp_path, vecs)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_silhouette)
    out = q_silhouette(sf, n_clusters=3)
    assert list(out.columns) == ["cluster", "n", "mean_sil"]
    assert out["n"].sum() == 30
    assert (out["mean_sil"] > 0.8).all()


def test_silhouette_identical_vectors_zero(ray_session, tmp_path):
    """All-identical vectors collapse to one cluster (ties to the lower
    id): b is undefined -> s = 0 by the sklearn convention."""
    sf = _write_emb(tmp_path, [[1.0, 2.0, 3.0]] * 12)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_silhouette)
    out = q_silhouette(sf, n_clusters=4)
    assert out["n"].sum() == 12
    assert (out["mean_sil"] == 0.0).all()


def test_silhouette_matches_bruteforce_replication(ray_session, tmp_path):
    """Independent brute-force replication of the quantized silhouette on
    a small random set — same grids, straight from the definition."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (24, 6))
    sf = _write_emb(tmp_path, vecs)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        _int_kmeans_centroids, _nq_batch, _assign, q_silhouette)
    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)

    out = q_silhouette(sf, n_clusters=4)

    cent = _int_kmeans_centroids(sf, 4)
    nx = _nq_batch(np.asarray(vecs, np.float64))
    own, _, _, _ = _assign(cent, nx)
    n = len(vecs)
    qs_by_cluster = {}
    for i in range(n):
        sums, cnts = {}, {}
        for j in range(n):
            if i == j:
                continue
            d2 = int(((nx[i] - nx[j]) ** 2).sum())
            qd = int(round_half_away(1e3 * np.sqrt(float(d2)), 0))
            c = int(own[j])
            sums[c] = sums.get(c, 0) + qd
            cnts[c] = cnts.get(c, 0) + 1
        oc = int(own[i])
        if oc not in cnts:
            s = 0.0
        else:
            a = float(sums[oc]) / float(cnts[oc])
            others = [float(sums[c]) / float(cnts[c])
                      for c in cnts if c != oc]
            if not others:
                s = 0.0
            else:
                b = min(others)
                mx = max(a, b)
                s = 0.0 if mx == 0 else (b - a) / mx
        qs = int(round_half_away(1e9 * s, 0))
        qs_by_cluster.setdefault(oc, []).append(qs)
    exp = {c: round_half_away(sum(v) / 1e9 / len(v), 6)
           for c, v in qs_by_cluster.items()}
    got = dict(zip(out["cluster"], out["mean_sil"]))
    assert got == {c: exp[c] for c in sorted(exp)}


# --- emb_dbscan -----------------------------------------------------------------


def test_dbscan_star_geometry_core_border_noise(ray_session, tmp_path):
    """A star (center within eps of 4 satellites that are NOT within eps
    of each other) under minpts=5: the center is core, satellites are
    border (attached to the center's cluster), far points are noise."""
    import math
    c, s = math.cos(math.radians(20)), math.sin(math.radians(20))
    vecs = [[1, 0, 0, 0, 0, 0]]                      # 0: center
    for i in range(4):                               # 1-4: satellites
        v = [0.0] * 6
        v[0], v[1 + i] = c, s
        vecs.append(v)
    vecs.append([-1, 0, 0, 0, 0, 0])                 # 5: noise
    vecs.append([0, 0, 0, 0, 0, -1])                 # 6: noise
    sf = _write_emb(tmp_path, vecs)
    from norsk_historisk_avis_ocr_ray.functions.similarity import emb_dbscan
    out = (emb_dbscan(sf, eps2=200_000_000_000, minpts=5)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out["role"].tolist() == (["core"] + ["border"] * 4
                                    + ["noise"] * 2)
    assert out["cluster_id"].tolist() == [0, 0, 0, 0, 0, -1, -1]
    assert out["n_nbrs"].tolist() == [5, 2, 2, 2, 2, 1, 1]


def test_dbscan_matches_bruteforce_replication(ray_session, tmp_path):
    """Independent O(N²) replication (integer eps test, min-root
    components, min-core-neighbor border) on random vectors."""
    rng = np.random.default_rng(23)
    vecs = rng.normal(0, 1, (40, 6))
    sf = _write_emb(tmp_path, vecs)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        _nq_batch, emb_dbscan)
    eps2, minpts = 1_400_000_000_000, 4

    out = (emb_dbscan(sf, eps2=eps2, minpts=minpts)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    nx = _nq_batch(np.asarray(vecs, np.float64))
    n = len(vecs)
    within = np.zeros((n, n), bool)
    for i in range(n):
        for j in range(n):
            if i != j:
                within[i, j] = int(((nx[i] - nx[j]) ** 2).sum()) <= eps2
    nn = within.sum(axis=1) + 1
    core = nn >= minpts
    # min-root union-find over core-core edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if within[i, j] and core[i] and core[j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    exp_role, exp_cl = [], []
    for i in range(n):
        if core[i]:
            exp_role.append("core")
            exp_cl.append(find(i))
        else:
            cn = [find(j) for j in range(n) if within[i, j] and core[j]]
            if cn:
                exp_role.append("border")
                exp_cl.append(min(cn))
            else:
                exp_role.append("noise")
                exp_cl.append(-1)
    assert out["role"].tolist() == exp_role
    assert out["cluster_id"].tolist() == exp_cl
    assert out["n_nbrs"].tolist() == nn.astype(int).tolist()


# --- q_minhash_recall -----------------------------------------------------------


def test_minhash_recall_identical_groups(ray_session, tmp_path):
    """Groups of identical docs: identical signatures ALWAYS collide in
    LSH, so recall must be exactly 1.0 and verified == truth."""
    texts = []
    for g in range(3):
        texts += [f"group {g} text body with several shared words"] * (g + 2)
    texts += [f"unique document number {i} nothing alike {i*7}"
              for i in range(6)]
    sf = _write_texts(tmp_path, texts)
    from norsk_historisk_avis_ocr_ray.functions.dedup import q_minhash_recall
    out = q_minhash_recall(sf)
    exp_truth = sum((g + 2) * (g + 1) // 2 for g in range(3))  # C(g+2, 2)
    row = out.iloc[0]
    assert row["n_truth"] == exp_truth
    assert row["n_verified"] == exp_truth
    assert row["recall"] == 1.0
    assert row["n_cand"] >= row["n_verified"]
    assert 0.0 < row["precision"] <= 1.0


def test_minhash_recall_truth_matches_bruteforce(ray_session):
    """n_truth at sf0.001 equals the brute-force all-pairs rounded-jaccard
    count (independent of the blocking machinery)."""
    import itertools

    import pyarrow.parquet as pq2

    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        ngram_jaccard, q_minhash_recall)
    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)

    sf = "/root/testdata/sf0.001"
    t = pq2.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    n_truth = 0
    for a, b in itertools.combinations(sorted(texts), 2):
        ta, tb = texts[a] or "", texts[b] or ""
        if ta and tb and round_half_away(ngram_jaccard(ta, tb), 6) >= 0.8:
            n_truth += 1
    out = q_minhash_recall(sf)
    assert out.iloc[0]["n_truth"] == n_truth


# --- q_containment_pairs ----------------------------------------------------------


def test_containment_prefix_excerpt_is_one(ray_session, tmp_path):
    """A character-prefix excerpt selects EXACTLY the long doc's window
    minima for the shared positions (same partial leading windows), so
    its containment must be exactly 1.0."""
    rng = np.random.default_rng(31)
    words = [f"w{rng.integers(0, 9999):04d}" for _ in range(200)]
    long_doc = " ".join(words)
    excerpt = long_doc[:300]
    others = [" ".join(f"x{rng.integers(0, 9999):04d}y{i}"
                       for i in range(60)) for _ in range(3)]
    sf = _write_texts(tmp_path, [long_doc, excerpt] + others)
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_containment_pairs)
    out = q_containment_pairs(sf)
    assert ((out["a"] == 0) & (out["b"] == 1)).any()
    row = out[(out["a"] == 0) & (out["b"] == 1)].iloc[0]
    assert row["containment"] == 1.0


def test_containment_matches_bruteforce(ray_session, tmp_path):
    """Full output equality against a brute-force set replication
    (winnow_hashes sets, df filter, c/min rule, rounded threshold)."""
    import itertools

    rng = np.random.default_rng(37)
    base = " ".join(f"t{rng.integers(0, 50):02d}" for _ in range(80))
    texts = [base, base[:200], base[100:400],
             " ".join(f"q{i}z{rng.integers(0, 999)}" for i in range(50)),
             base]     # exact dup of 0 → containment 1.0
    sf = _write_texts(tmp_path, texts)
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_containment_pairs, winnow_hashes, CONTAIN_MAX_DF)
    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)

    sets = {i: set(winnow_hashes(t).tolist()) for i, t in enumerate(texts)}
    from collections import Counter
    dfc = Counter(h for s in sets.values() for h in s)
    sets = {i: {h for h in s if dfc[h] <= CONTAIN_MAX_DF}
            for i, s in sets.items()}
    exp = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        mn = min(len(sets[a]), len(sets[b]))
        if inter and mn:
            cont = float(round_half_away(inter / mn, 6))
            if cont >= 0.5:
                exp.append((a, b, cont))
    out = q_containment_pairs(sf)
    got = list(zip(out["a"], out["b"], out["containment"]))
    assert got == exp


# --- q_srp_signatures -------------------------------------------------------------


def test_srp_signature_angle_properties(ray_session, tmp_path):
    """Charikar sketch property: identical vectors share the signature,
    negated vectors flip every non-tied bit (Hamming 64 for generic
    vectors), near-orthogonal pairs land near Hamming 32."""
    rng = np.random.default_rng(41)
    v = rng.normal(0, 1, 16)
    w = rng.normal(0, 1, 16)
    w -= (w @ v) / (v @ v) * v        # make w orthogonal to v
    sf = _write_emb(tmp_path, [v, v.copy(), -v, w])
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_srp_signatures)
    out = (q_srp_signatures(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    sigs = [int(s, 16) for s in out["srp_sig"]]
    assert sigs[0] == sigs[1]                       # identical
    ham_neg = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham_neg == 64                            # antipodal
    ham_orth = bin(sigs[0] ^ sigs[3]).count("1")
    assert 16 <= ham_orth <= 48                     # ~32 expected


def test_srp_planes_deterministic_and_balanced(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        _srp_planes)
    p1, p2 = _srp_planes(32), _srp_planes(32)
    assert (p1 == p2).all()
    assert set(np.unique(p1)) == {-1, 1}
    # md5 parity is ~balanced: no plane is all-same-sign
    assert (np.abs(p1.sum(axis=1)) < 32).all()


# --- q_basket_rules ---------------------------------------------------------------


def test_basket_rules_matches_bruteforce(ray_session, tmp_path):
    baskets = [(1, [1, 2, 3]), (2, [2, 3]), (3, [2, 3, 4]),
               (4, [1, 4]), (5, [2, 3, 4]), (6, [5]), (7, [1, 2])]
    sf = _write_lineitem(tmp_path, baskets)
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_basket_rules)
    out = q_basket_rules(sf)

    sets = {o: set(p) for o, p in baskets}
    n_total = len(sets)
    part_n = {}
    pair_n = {}
    for s in sets.values():
        for p in s:
            part_n[p] = part_n.get(p, 0) + 1
        for a, b in itertools.combinations(sorted(s), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    exp = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert len(out) == len(exp)
    for row, ((a, b), nab) in zip(out.itertuples(index=False), exp):
        assert (row.part_a, row.part_b, row.n_orders) == (a, b, nab)
        assert row.conf_ab == round(nab / part_n[a], 6)
        assert row.conf_ba == round(nab / part_n[b], 6)
        assert row.lift == round((n_total * nab) / (part_n[a] * part_n[b]),
                                 6)
    # (2,3) in 4 of 7 orders; part 2 in 5 orders, part 3 in 4
    r0 = out.iloc[0]
    assert (r0["part_a"], r0["part_b"]) == (2, 3)
    assert r0["lift"] == round(7 * 4 / (5 * 4), 6)


# --- q_emb_histogram --------------------------------------------------------------


def test_emb_histogram_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(43)
    vecs = rng.normal(0, 1, (30, 4))
    vecs[0, 0] = -1.9999   # bin-boundary-adjacent values
    vecs[1, 0] = 0.25
    vecs[2, 0] = -0.25
    sf = _write_emb(tmp_path, vecs)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_emb_histogram)
    from norsk_historisk_avis_ocr_ray.functions.rounding import (
        round_half_away)
    out = q_emb_histogram(sf)

    exp = {}
    f32 = np.asarray(vecs, np.float32).astype(np.float64)  # storage dtype
    for row in f32:
        for d, x in enumerate(row):
            q = int(round_half_away(1000.0 * x, 0))
            b = q // 250   # python floor division floors, like the engine
            exp[(d, b)] = exp.get((d, b), 0) + 1
    got = {(int(d), int(b)): int(n)
           for d, b, n in zip(out["dim"], out["bin"], out["n"])}
    assert got == exp
    assert int(out["n"].sum()) == 30 * 4


# --- q_lsh_bucket_stats -----------------------------------------------------------


def test_lsh_bucket_stats_invariants(ray_session, tmp_path):
    """Mass conservation per band (Σ size·n_buckets = n_docs) and exact
    dup groups: k identical docs always share every band bucket, so each
    band has ≥ 1 bucket of size ≥ k."""
    texts = (["identical duplicate body text here"] * 4
             + [f"unique doc {i} with words {i*3} {i*5}" for i in range(8)])
    sf = _write_texts(tmp_path, texts)
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        BANDS, q_lsh_bucket_stats)
    out = q_lsh_bucket_stats(sf)
    assert sorted(out["band"].unique()) == list(range(BANDS))
    for band, g in out.groupby("band"):
        assert (g["bucket_size"] * g["n_buckets"]).sum() == len(texts)
        assert g["bucket_size"].max() >= 4


# --- q_weighted_sample ------------------------------------------------------------


def test_weighted_sample_matches_bruteforce_and_biases_long(ray_session,
                                                            tmp_path):
    """Exact match against a brute-force Efraimidis-Spirakis replication,
    and the statistical property: long docs are overrepresented vs a
    uniform draw."""
    import hashlib
    import math

    rng = np.random.default_rng(47)
    # 100 short docs (20 chars) + 100 long docs (2000 chars)
    texts = (["s" * 20] * 100 + ["L" * 2000] * 100)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "n_chars": pa.array([len(t) for t in texts],
                                      pa.int64())}),
        str(tmp_path / "documents.parquet"))
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_weighted_sample)
    out = q_weighted_sample(str(tmp_path), k=40)

    def md5_64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")

    keyed = []
    for d, t in enumerate(texts):
        w = len(t)
        u = np.float64(np.uint64(md5_64(str(d))).astype(np.float64)
                       ) / float(1 << 64)
        keyed.append((math.log(u) / w, d, w))
    keyed.sort(reverse=True)
    exp = [(i + 1, d, w) for i, (_, d, w) in enumerate(keyed[:40])]
    got = list(zip(out["rk"], out["doc_id"], out["n_chars"]))
    assert got == exp
    # weight bias: long docs are 100x likelier per E-S; in 40 draws the
    # long cohort must dominate
    assert (out["n_chars"] == 2000).sum() >= 35


def test_weighted_sample_zero_weight_excluded(ray_session, tmp_path):
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["", "ab", "cdef"], pa.string()),
                  "n_chars": pa.array([0, 2, 4], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_weighted_sample)
    out = q_weighted_sample(str(tmp_path))
    assert 0 not in set(out["doc_id"])
    assert len(out) == 2


# --- q_split_leakage --------------------------------------------------------------


def test_split_leakage_matches_bruteforce(ray_session, tmp_path):
    """Brute-force replication: distinct trigram sets per split side via
    the same md5 bucket rule; planted shared text across sides."""
    import hashlib

    def bucket(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100

    rng = np.random.default_rng(53)
    texts = {}
    for d in range(200):
        words = [f"w{rng.integers(0, 300):03d}" for _ in range(12)]
        texts[d] = " ".join(words)
    sf = _write_texts(tmp_path, [texts[d] for d in range(200)])

    train, test = set(), set()
    for d, t in texts.items():
        b = bucket(d)
        if 80 <= b < 90:
            continue
        toks = t.lower().strip().split()
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        (test if b >= 90 else train).update(grams)

    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_split_leakage)
    out = q_split_leakage(sf).iloc[0]
    assert out["n_train_grams"] == len(train)
    assert out["n_test_grams"] == len(test)
    assert out["n_shared"] == len(train & test)
    assert out["leak_frac"] == round(len(train & test) / len(test), 6)


# --- q_incremental_dedup ----------------------------------------------------------


def test_incremental_dedup_planted(ray_session, tmp_path):
    """Plant: find a delta doc id (md5 bucket >= 90), give it text
    identical to a base doc -> exact_dup = 1 AND near_cand = 1 (identical
    signatures share every band); another delta doc with unique text ->
    both 0."""
    import hashlib

    def bucket(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100

    ids = list(range(400))
    delta_ids = [d for d in ids if bucket(d) >= 90]
    base_ids = [d for d in ids if bucket(d) < 80]
    assert len(delta_ids) >= 2 and len(base_ids) >= 2
    shared = "this exact text lives in both the base and the delta side"
    texts = {}
    for d in ids:
        texts[d] = f"unique filler document number {d} tokens {d*7} {d*13}"
    texts[base_ids[0]] = shared
    texts[delta_ids[0]] = shared          # exact dup of a base doc
    # delta_ids[1] keeps unique text -> no dup
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([texts[d] for d in ids], pa.string())}),
        str(tmp_path / "documents.parquet"))

    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        q_incremental_dedup)
    out = (q_incremental_dedup(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert set(out.index) == set(delta_ids)       # one row per delta doc
    assert out.loc[delta_ids[0], "exact_dup"] == 1
    assert out.loc[delta_ids[0], "near_cand"] == 1
    assert out.loc[delta_ids[1], "exact_dup"] == 0


# --- driver-contract invariants ----------------------------------------------------


def test_gate_window_all_oracled_and_unique():
    """The external driver gates the FIRST 50 queries() entries: every
    window entry must carry an exact oracle, and names must be unique."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    q = list(entry.queries())
    assert len(q) == len(set(q))
    oracles = entry.oracle_sql()
    window = q[:50]
    missing = [k for k in window if k not in oracles]
    assert not missing, f"gate-window entries without oracles: {missing}"
