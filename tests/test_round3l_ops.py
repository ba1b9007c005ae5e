"""Planted ground truth for q_watermark_lateness (global prefix-max
scan, two-phase bucket carry) and q_dedup_survivorship (per-source
exact-dedup survival). Exact SQL equality is enforced by
tools/check_oracle.py; these pin the distributed mechanics on corpora
built to cross bucket boundaries / span sources."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


# --- q_watermark_lateness ----------------------------------------------------


def _write_events(tmp_path, secs):
    ts = pa.array(np.asarray(secs, np.int64) * 1_000_000,
                  pa.timestamp("us"))
    pq.write_table(
        pa.table({"event_id": pa.array(range(len(secs)), pa.int64()),
                  "ts": ts}),
        str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _run_wm(sf_dir):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_watermark_lateness)

    return (q_watermark_lateness(sf_dir).to_pandas()
            .sort_values("event_id").reset_index(drop=True))


def test_watermark_planted_out_of_order(ray_session, tmp_path):
    """Hand-computed lateness: the watermark is the running max of event
    time in event_id (arrival) order; late events measure their lag."""
    secs = [100, 105, 103, 110, 104, 110, 99]
    df = _run_wm(_write_events(tmp_path, secs))
    assert df["lateness_s"].tolist() == [0, 0, 2, 0, 6, 0, 11]
    assert df["is_late"].tolist() == [0, 0, 1, 0, 1, 0, 1]
    assert df["lateness_s"].dtype == np.int64


def test_watermark_carry_crosses_buckets(ray_session, tmp_path):
    """A single early maximum dominates every later bucket: the carry-in
    prefix max (not bucket-local state) must propagate it. 300 events
    span multiple WM_BUCKETS ranges; truth is a one-line numpy scan."""
    rng = np.random.default_rng(7)
    secs = rng.integers(0, 500, size=300).astype(np.int64)
    secs[3] = 10_000       # global max arrives 4th — everyone after is late
    df = _run_wm(_write_events(tmp_path, secs))
    wm = np.maximum.accumulate(secs)
    assert df["lateness_s"].to_numpy().tolist() == (wm - secs).tolist()
    assert (df["lateness_s"].to_numpy()[4:] > 0).all()


def test_watermark_monotone_input_never_late(ray_session, tmp_path):
    df = _run_wm(_write_events(tmp_path, list(range(50))))
    assert df["lateness_s"].sum() == 0
    assert df["is_late"].sum() == 0


# --- q_dedup_survivorship ----------------------------------------------------


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array([t for t, _ in rows], pa.string()),
                  "source": pa.array([s for _, s in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_survivorship_planted(ray_session, tmp_path):
    """mirror-heavy source keeps only the min-doc_id copy of each text;
    cross-source duplicates survive in whichever source holds the min."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_dedup_survivorship)

    rows = [("alpha", "crawl"),      # 0: min of the alpha group -> survives
            ("alpha", "crawl"),      # 1: dup
            ("alpha", "curated"),    # 2: dup (loses cross-source)
            ("beta", "curated"),     # 3: unique -> survives
            ("gamma", "crawl"),      # 4: survives
            ("gamma", "crawl")]      # 5: dup
    df = q_dedup_survivorship(_write_docs(tmp_path, rows))
    assert df["source"].tolist() == ["crawl", "curated"]
    assert df["n_docs"].tolist() == [4, 2]
    assert df["n_survivors"].tolist() == [2, 1]
    assert df["survival_rate"].tolist() == [0.5, 0.5]
    assert df["n_survivors"].dtype == np.int64


def test_survivorship_all_unique_is_100pct(ray_session, tmp_path):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_dedup_survivorship)

    rows = [(f"doc {i}", "s") for i in range(5)]
    df = q_dedup_survivorship(_write_docs(tmp_path, rows))
    assert df["n_survivors"].tolist() == [5]
    assert df["survival_rate"].tolist() == [1.0]


# --- q_skyline ---------------------------------------------------------------


def test_skyline_mask_dominance_semantics():
    """Hand-built frontier: duplicates both survive, same-x lower-y is
    dominated, >= on both dims with one strict dominates."""
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        _skyline2d_mask)

    x = np.array([10.0, 10.0, 10.0, 9.0, 9.0, 8.0, 11.0])
    y = np.array([5,     5,    3,   6,   5,   7,   1], np.int64)
    #             dup   dup  same-x  ok  dom by  ok   ok (max x)
    #             keep  keep  lower-y     (10,5)
    assert _skyline2d_mask(x, y).tolist() == [
        True, True, False, True, False, True, True]


def test_skyline_merge_of_local_frontiers(ray_session, tmp_path):
    """The end-to-end op over a multi-row-group file equals a local numpy
    skyline of the whole table (skyline-of-skylines exactness)."""
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        _skyline2d_mask, q_skyline)

    rng = np.random.default_rng(3)
    n = 5000
    price = np.round(rng.uniform(1e3, 1e5, n), 2)
    days = rng.integers(0, 2000, n).astype("datetime64[D]")
    dates = days.astype("datetime64[us]")
    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(n), pa.int64()),
                  "o_totalprice": pa.array(price, pa.float64()),
                  "o_orderdate": pa.array(dates, pa.timestamp("us"))}),
        str(tmp_path / "orders.parquet"), row_group_size=512)
    got = q_skyline(str(tmp_path))
    mask = _skyline2d_mask(price, dates.view(np.int64))
    want = np.flatnonzero(mask)
    assert got["o_orderkey"].tolist() == want.tolist()


# --- q_type_cooccurrence -----------------------------------------------------


def test_type_cooccurrence_planted(ray_session, tmp_path):
    """3 users: u1 does a+b, u2 does a+b, u3 does a only; repeated events
    must not inflate the distinct-user counts."""
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_type_cooccurrence)

    users = [1, 1, 1, 2, 2, 3, 3, 3]
    types = ["a", "b", "b", "a", "b", "a", "a", "a"]
    pq.write_table(
        pa.table({"event_id": pa.array(range(len(users)), pa.int64()),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(types, pa.string())}),
        str(tmp_path / "events.parquet"))
    df = q_type_cooccurrence(str(tmp_path))
    assert df.values.tolist() == [["a", "b", 2, round(2 / 3, 6)]]


# --- q_ngram_novelty ---------------------------------------------------------


def test_ngram_novelty_planted(ray_session, tmp_path):
    """doc0 introduces all its grams; doc1 copies doc0 verbatim (novelty
    0); doc2 is half-copied (exactly 2 of its 4 grams are new); a short
    doc (< 5 tokens) is vacuously novel with zero grams."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_ngram_novelty)

    base = "a b c d e f g"            # grams: abcde bcdef cdefg (3)
    texts = [base,                     # doc0: 3/3 novel
             base,                     # doc1: 0/3
             "a b c d e x y z",        # doc2: abcde old; bcdex cdexy dexyz new
             "tiny doc"]               # doc3: 0 grams -> 1.0
    df = (q_ngram_novelty(_write_docs(tmp_path, [(t, "s") for t in texts]))
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert df["n_grams"].tolist() == [3, 3, 4, 0]
    assert df["n_novel"].tolist() == [3, 0, 3, 0]
    assert df["novelty"].tolist() == [1.0, 0.0, 0.75, 1.0]


def test_ngram_novelty_duplicate_grams_within_doc(ray_session, tmp_path):
    """Repeated grams inside one doc count once (distinct semantics)."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_ngram_novelty)

    df = (q_ngram_novelty(_write_docs(
            tmp_path, [("p q r s t p q r s t", "s")]))
          .to_pandas())
    # windows: pqrst qrstp rstpq stpqr tpqrs pqrst -> 5 distinct
    assert df["n_grams"].tolist() == [5]
    assert df["novelty"].tolist() == [1.0]


# --- q_keyword_match ---------------------------------------------------------


def test_keyword_match_planted(ray_session, tmp_path):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_keyword_match)

    texts = ["we use spark here", "a hash join beats a sort",
             "spark again", "nothing relevant"]
    df = q_keyword_match(_write_docs(tmp_path, [(t, "s") for t in texts]),
                         keywords=("spark", "hash join", "absent kw"))
    assert df["keyword"].tolist() == ["hash join", "spark"]
    assert df["n_docs"].tolist() == [1, 2]
    assert df["first_doc"].tolist() == [1, 0]


# --- q_source_overlap --------------------------------------------------------


def test_source_overlap_planted(ray_session, tmp_path):
    """Source m1 mirrors m0 exactly (jaccard 1.0); h shares half its
    grams with m0; z shares nothing and appears in no pair."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_source_overlap)

    base = "a b c d e f"              # grams: abcde bcdef (2)
    half = "a b c d e x"              # grams: abcde bcdex (shares 1 w/ base)
    rows = [(base, "m0"), (base, "m1"), (half, "h"),
            ("q r s t u v", "z")]
    df = q_source_overlap(_write_docs(tmp_path, rows))
    assert df[["source_a", "source_b"]].values.tolist() == [
        ["h", "m0"], ["h", "m1"], ["m0", "m1"]]
    assert df["n_shared"].tolist() == [1, 1, 2]
    assert df["jaccard"].tolist() == [round(1 / 3, 6), round(1 / 3, 6), 1.0]
