"""Planted edge cases for dedup_edit_distance (exact equality vs DuckDB
is enforced by tools/check_oracle.py — these tests pin the PassJoin
blocking LOSSLESSNESS and the byte-level DP semantics on hand-built
corpora where the oracle's brute-force join is replayed locally)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_part(tmp_path, names):
    pq.write_table(
        pa.table({"p_partkey": pa.array(range(len(names)), pa.int64()),
                  "p_name": pa.array(names, pa.string())}),
        str(tmp_path / "part.parquet"))
    return str(tmp_path)


def _brute(names, d=3):
    con = duckdb.connect()
    con.execute("CREATE TABLE n (s VARCHAR)")
    for s in set(n for n in names if n is not None):
        con.execute("INSERT INTO n VALUES (?)", [s])
    return con.sql(f"""
        SELECT a.s AS name_a, b.s AS name_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM n a JOIN n b ON a.s < b.s
        WHERE levenshtein(a.s, b.s) <= {d}
        ORDER BY name_a, name_b""").df()


def _run(sf_dir):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_edit_distance)

    return dedup_edit_distance(sf_dir)


def test_edit_distance_dp_matches_duckdb_bytes():
    """Byte-level DP == DuckDB levenshtein, including multibyte UTF-8
    (octet distance, NOT character distance) and empty strings."""
    import random

    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        _edit_distance_bytes)

    con = duckdb.connect()
    assert _edit_distance_bytes(b"kitten", b"sitting") == 3
    # å→a is sub+del on the octets; character-level would be 2
    assert _edit_distance_bytes("blåbær".encode(), b"blaber") == 4
    assert _edit_distance_bytes(b"", b"abc") == 3
    rng = random.Random(11)
    alpha = "abæø Z"
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _edit_distance_bytes(a.encode(), b.encode()) == want


def test_edit_join_planted_corpus(ray_session, tmp_path):
    """Full pipeline equals the brute-force join on a corpus built to hit
    every blocking path: repeated names (distinct-reduce), short-string
    bucket (byte length < d + 1), multibyte names, a pair at exactly
    d = 3, a pair at 4 (excluded), and a prefix-insertion pair whose
    matching segment sits at the edge of the ±d position window."""
    names = ["kitten", "sitting",            # dist 3: kept
             "kitten", "kitten",             # duplicates collapse
             "blåbær", "blaber",             # octet dist 4: excluded
             "ab", "b", "",                  # short bucket (L < 4)
             "abcdefgh", "xyzabcdefgh",      # 3 front inserts: shift = d
             "unrelated-long-name-here"]
    got = _run(_write_part(tmp_path, names))
    want = _brute(names)
    assert got.columns.tolist() == ["name_a", "name_b", "dist"]
    assert got["dist"].dtype == np.int64
    assert got.values.tolist() == want.values.tolist()
    pairs = set(zip(got["name_a"], got["name_b"]))
    assert ("kitten", "sitting") in pairs
    assert ("abcdefgh", "xyzabcdefgh") in pairs
    assert ("blaber", "blåbær") not in pairs


def test_edit_join_dense_random_vocab(ray_session, tmp_path):
    """Adversarial density: a tiny alphabet makes most pairs land within
    a few edits, so any pruning bug (segment rule mismatch, window
    off-by-one, short-string path) loses a pair vs brute force."""
    import random

    rng = random.Random(23)
    names = list({"".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
                  for _ in range(60)})
    got = _run(_write_part(tmp_path, names * 2))
    want = _brute(names)
    assert got.values.tolist() == want.values.tolist()


# --- q_triangle_dups ---------------------------------------------------------

P = "p1 p2 p3 p4 p5 p6 p7 p8"      # shared 8-token prefix key
S = "s1 s2 s3 s4 s5 s6 s7 s8"      # shared 8-token suffix key


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_triangle_census_planted(ray_session, tmp_path):
    """A K4 prefix clique (4 triangles, every node deg 3 / tri 3), a
    2-doc suffix edge (no triangle), and an isolated doc (absent)."""
    from norsk_historisk_avis_ocr_ray.functions.cluster import (
        q_triangle_dups)

    texts = [f"{P} k4 member zero", f"{P} k4 member one",
             f"{P} k4 member two", f"{P} k4 member three",
             f"edge doc number four tail is {S}",
             f"edge doc number five tail is {S}",
             "totally isolated document six with enough tokens here ok"]
    df = (q_triangle_dups(_write_docs(tmp_path, texts))
          .sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert df.loc[:3, "deg"].tolist() == [3, 3, 3, 3]
    assert df.loc[:3, "n_triangles"].tolist() == [3, 3, 3, 3]
    assert df.loc[4:, "deg"].tolist() == [1, 1]
    assert df.loc[4:, "n_triangles"].tolist() == [0, 0]


def test_triangle_max_group_drops_boilerplate(ray_session, tmp_path):
    """The max_group knob removes a degenerate hub key BEFORE the
    |group|-squared pair emit; the remaining clique is unaffected."""
    from norsk_historisk_avis_ocr_ray.functions.cluster import (
        q_triangle_dups)

    texts = ([f"{P} k3 member {i}" for i in range(3)]
             + [f"boiler plate key words all same here now tail {i}"
                for i in range(6)])
    # the boilerplate 6-group shares its PREFIX key ("boiler plate ...")
    sf = _write_docs(tmp_path, texts)
    full = q_triangle_dups(sf).sort_values("doc_id")
    assert len(full) == 9            # both groups edge up
    capped = (q_triangle_dups(sf, max_group=4)
              .sort_values("doc_id").reset_index(drop=True))
    assert capped["doc_id"].tolist() == [0, 1, 2]
    assert capped["n_triangles"].tolist() == [1, 1, 1]


# --- q_temperature_mix / q_heaps_curve ---------------------------------------


def _write_docs_src(tmp_path, rows):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array([t for t, _ in rows], pa.string()),
                  "source": pa.array([s for _, s in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_temperature_mix_upsamples_low_resource(ray_session, tmp_path):
    """alpha = 0.3 compresses an 8:1 corpus skew to an 8^0.3 : 1 ≈
    1.87 : 1 sampling ratio; quotas floor-split the integer budget."""
    import math

    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        MIX_BUDGET, q_temperature_mix)

    rows = [("doc a", "big")] * 8 + [("doc b", "small")]
    df = q_temperature_mix(_write_docs_src(tmp_path, rows))
    assert df["source"].tolist() == ["big", "small"]
    assert df["n_docs"].tolist() == [8, 1]
    wq_big = round(8 ** 0.3 * 1e9)
    wq_small = round(1.0 * 1e9)
    total = wq_big + wq_small
    assert df["quota"].tolist() == [wq_big * MIX_BUDGET // total,
                                    wq_small * MIX_BUDGET // total]
    # corpus share of 'small' is 1/9 ~= 0.111; its sampling prob is higher
    assert df.loc[1, "prob"] > 1 / 9
    assert math.isclose(df["prob"].sum(), 1.0, abs_tol=2e-6)


def test_heaps_curve_planted_vocab_plan(ray_session, tmp_path):
    """10 docs introducing a known token schedule: the checkpoint counts
    equal the hand-computed first-occurrence census."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_heaps_curve)

    texts = ["a b c",        # doc 0: 3 new
             "a b",          # doc 1: 0 new
             "d",            # doc 2: 1 new
             "a d",          # 3: 0
             "e f",          # 4: 2 new
             "a",            # 5: 0
             "g",            # 6: 1 new
             "a b c d e f",  # 7: 0
             "h i j",        # 8: 3 new
             "a"]            # 9: 0
    rows = [(t, "s") for t in texts]
    df = q_heaps_curve(_write_docs_src(tmp_path, rows))
    # thresholds: (10 * pct) // 100 -> 1, 2, 5, 7, 10 docs
    assert df["pct"].tolist() == [10, 25, 50, 75, 100]
    assert df["n_docs"].tolist() == [1, 2, 5, 7, 10]
    assert df["vocab_size"].tolist() == [3, 3, 6, 7, 10]
