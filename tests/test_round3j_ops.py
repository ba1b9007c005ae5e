"""Planted edge cases for q_gopher_filter (exact equality vs DuckDB is
enforced by tools/check_oracle.py — these tests pin the rule SEMANTICS on
hand-constructed documents)."""

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"

# 54 words, mean word length 5.30 (inside [3, 10]), stopwords {det, som}
GOOD = ("avisen skriver mange gode saker om byen det som skjer rundt "
        "havnen gir folk glede hver eneste morgen und kveld mens "
        "redaksjonen arbeider videre med nye artikler om fiske handel "
        "skipsfart vær politikk kultur idrett skole kirke marked torg "
        "bønder fiskere sjømenn kjøpmenn lærere prester leser avisen "
        "det som alltid kommer presis klokken seks")


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _run(sf_dir):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_gopher_filter)

    return (q_gopher_filter(sf_dir).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_gopher_rules_planted(ray_session, tmp_path):
    assert len(GOOD.split()) >= 50
    docs = [
        GOOD,                                     # 0: passes everything
        "og er det kort",                         # 1: too few words
        "\n".join(["- punkt nummer " + str(i) for i in range(20)]),  # 2: all bullet lines
        "\n".join([("rad nummer " + str(i) + " slutter slik ...")
                   for i in range(10)]),          # 3: all lines end with ellipsis
        "123 456 789 " * 20,                      # 4: no alphabetic words
        GOOD.replace("det", "xxx").replace("som", "vvv"),  # 5: no stopwords
        "",                                       # 6: empty
    ]
    df = _run(_write_docs(tmp_path, docs))

    assert df.loc[0, "keep"] == 1
    assert df.loc[1, "keep"] == 0 and df.loc[1, "n_words"] == 4
    assert df.loc[2, "keep"] == 0 and df.loc[2, "bullet_frac"] == 1.0
    assert df.loc[3, "keep"] == 0 and df.loc[3, "ellipsis_frac"] == 1.0
    assert df.loc[4, "keep"] == 0 and df.loc[4, "alpha_frac"] == 0.0
    assert df.loc[5, "keep"] == 0 and df.loc[5, "n_stop"] < 2
    assert df.loc[6, "keep"] == 0 and df.loc[6, "n_words"] == 0
    assert df.loc[6, "mean_word_len"] == 0.0


def test_gopher_symbol_counting_nonoverlapping(ray_session, tmp_path):
    # 6 dots = two non-overlapping '...'; one '#'; '….' = one '…'
    df = _run(_write_docs(tmp_path, [GOOD + " ...... #. ….", GOOD]))
    n_words0 = df.loc[0, "n_words"]
    assert df.loc[0, "symbol_ratio"] == round((2 + 1 + 1) / n_words0, 6)
    assert df.loc[1, "symbol_ratio"] == 0.0
    assert df.loc[1, "keep"] == 1


def test_gopher_integer_thresholds_edge(ray_session, tmp_path):
    # exactly 50 words, every word exactly 3 chars → mean exactly 3.0
    # (inclusive lower bound) — the integer predicate 3n <= sum must keep it
    fifty = " ".join(["ord"] * 47 + ["det", "som", "til"])
    ws = fifty.split()
    assert len(ws) == 50 and all(len(w) == 3 for w in ws)
    df = _run(_write_docs(tmp_path, [fifty]))
    assert df.loc[0, "n_words"] == 50
    assert df.loc[0, "mean_word_len"] == 3.0
    assert df.loc[0, "keep"] == 1                 # both bounds inclusive


def test_gopher_keep_discriminates_at_gate_scale(ray_session):
    df = _run(SF)
    assert len(df) == 500
    assert 0 < int(df["keep"].sum()) < 500


# --- q_c4_filter (line-level C4 cleaning) ------------------------------------

def _run_c4(sf_dir):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_c4_filter

    return (q_c4_filter(sf_dir).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_c4_planted_line_rules(ray_session, tmp_path):
    import hashlib

    keep1 = "denne setningen har mange fine ord og slutter riktig."
    keep2 = "enda en linje med nok ord som slutter med spørsmål?"
    keep3 = 'og en tredje linje som slutter med et sitat her."'
    docs = [
        "\n".join([keep1,
                   "for få ord her.",                 # < 5 words
                   "denne linjen slutter ikke med punktum",  # no terminal
                   "en linje om JavaScript som er lang nok.",  # javascript
                   keep2, keep3]),                    # 3 kept → keep=1
        "\n".join([keep1, keep2]),                    # only 2 kept → 0
        "\n".join([keep1, keep2, keep3,
                   "dette dokumentet nevner lorem ipsum her."]),  # bad doc
        "\n".join([keep1, keep2, keep3]) + " {",      # brace → 0
        "",                                           # empty → 0
    ]
    df = _run_c4(_write_docs(tmp_path, docs))

    assert df.loc[0, "keep"] == 1 and df.loc[0, "n_kept"] == 3
    assert df.loc[0, "n_lines"] == 6
    expect = hashlib.md5("\n".join([keep1, keep2, keep3])
                         .encode()).hexdigest()
    assert df.loc[0, "clean_md5"] == expect
    assert df.loc[1, "keep"] == 0 and df.loc[1, "n_kept"] == 2
    # lorem-ipsum doc keeps 4 lines but is dropped doc-level
    assert df.loc[2, "keep"] == 0 and df.loc[2, "n_kept"] == 4
    assert df.loc[3, "keep"] == 0                    # '{' doc-level drop
    assert df.loc[4, "keep"] == 0 and df.loc[4, "n_kept"] == 0
    assert df.loc[4, "clean_md5"] == hashlib.md5(b"").hexdigest()

    # the sf gate corpus is single-line — cross-check the ORACLE on this
    # planted multi-line corpus too (exact frame equality, driver dtypes)
    import duckdb
    import importlib.util
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "rayentry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    odf = (con.execute(mod.oracle_sql()["q_c4_filter"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(df, odf)


# --- q_minhash_jaccard_est (signature-agreement estimator) -------------------

def test_minhash_estimate_planted(ray_session, tmp_path):
    base = ("en ganske lang tekst om fiske og handel i byen som brukes "
            "til aa teste minhash signaturer paa en fornuftig maate "
            "med nok ord til at shinglene faar variasjon")
    docs = [
        base,                                     # 0 ┐ identical pair
        base,                                     # 1 ┘
        base.replace("handel", "seilas"),         # 2: near-dup of 0/1
        "helt annen tekst om noe helt annet som ikke ligner",  # 3
    ]
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        ngram_jaccard,
        q_minhash_jaccard_est,
    )

    df = q_minhash_jaccard_est(_write_docs(tmp_path, docs))
    pairs = {(int(r.a), int(r.b)): r for r in df.itertuples()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)].agree == 128             # identical → all slots
    assert pairs[(0, 1)].est_jaccard == 1.0
    # the near-dup pair is a candidate and its estimate tracks the truth
    assert (0, 2) in pairs
    exact = ngram_jaccard(docs[0], docs[2])
    assert abs(pairs[(0, 2)].est_jaccard - exact) < 0.25
    assert pairs[(0, 2)].agree < 128
    # the unrelated doc never pairs
    assert not any(3 in p for p in pairs)


# --- q_source_kl (per-source KL divergence) ----------------------------------

def test_source_kl_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["vanlig tekst om fjord og fisk",      # srcA (3 docs, common)
             "vanlig tekst om fjell og skog",
             "vanlig tekst om hav og strand",
             "xyzzy qwerty plugh zork frobozz"]    # srcB: alien vocabulary
    srcs = ["srcA", "srcA", "srcA", "srcB"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["nb"] * 4, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_source_kl

    df = q_source_kl(str(tmp_path)).set_index("source")
    assert set(df.index) == {"srcA", "srcB"}
    # the alien-vocabulary source diverges far more from the blend
    assert df.loc["srcB", "kl"] > df.loc["srcA", "kl"] > 0
    assert df.loc["srcA", "n_tokens"] == 18
    assert df.loc["srcB", "n_tokens"] == 5


def test_source_kl_single_source_is_zero(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["en tekst her", "en annen tekst"], pa.string()),
        "lang": pa.array(["nb", "nb"], pa.string()),
        "source": pa.array(["only", "only"], pa.string()),
        "n_chars": pa.array([12, 14], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_source_kl

    df = q_source_kl(str(tmp_path))
    # the single source IS the corpus: every ratio is 1, every ln is 0
    assert df.loc[0, "kl_q"] == 0 and df.loc[0, "kl"] == 0.0


# --- q_pagerank_dups (integer PageRank over the dup graph) -------------------

def test_pagerank_planted_graph(ray_session, tmp_path):
    """Star of 3 docs sharing a prefix key (+ 1 pair sharing a suffix key,
    + isolated docs): node set, degrees, hub dominance, and exact equality
    vs the unrolled-CTE oracle."""
    import duckdb
    import importlib.util
    import pandas as pd

    pre = "felles start paa alle tre dokumenter i denne gruppen"  # 9 words
    assert len(pre.split()) >= 8
    suf = "og helt lik slutt for de to siste dokumentene her"
    docs = [
        pre + " unik hale nummer en",                    # 0 ┐ share k1
        pre + " annen hale nummer to",                   # 1 │ (prefix key)
        pre + " tredje hale nummer tre",                 # 2 ┘
        "helt egen tekst " + suf,                        # 3 ┐ share k2
        "annen egen tekst " + suf,                       # 4 ┘
        "et dokument uten noen delte kanter i det hele tatt",  # 5 isolated
    ]
    from norsk_historisk_avis_ocr_ray.functions.cluster import q_pagerank_dups

    d = _write_docs(tmp_path, docs)
    df = q_pagerank_dups(d).set_index("doc_id")
    assert sorted(df.index) == [0, 1, 2, 3, 4]           # 5 is isolated
    # star: 1 and 2 point at root 0 and back — deg(0)=2, deg(1)=deg(2)=1
    assert df.loc[0, "deg"] == 2
    assert df.loc[1, "deg"] == 1 and df.loc[2, "deg"] == 1
    assert df.loc[3, "deg"] == 1 and df.loc[4, "deg"] == 1
    # the hub receives two contributions: strictly higher pagerank
    assert df.loc[0, "pagerank"] > df.loc[1, "pagerank"]
    assert df.loc[1, "pagerank"] == df.loc[2, "pagerank"]
    # symmetric pair: equal scores
    assert df.loc[3, "pagerank"] == df.loc[4, "pagerank"]

    spec = importlib.util.spec_from_file_location(
        "rayentry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    odf = (con.execute(mod.oracle_sql()["q_pagerank_dups"]).df()
           .astype({"doc_id": "int64", "deg": "int64",
                    "pagerank": "int64"}))
    pd.testing.assert_frame_equal(df.reset_index(), odf)


# --- q_funnel (ordered conversion funnel) ------------------------------------

def test_funnel_strictly_after_semantics(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ev(eid, ts_s, uid, et):
        return {"event_id": eid, "ts": ts_s * 1_000_000, "user_id": uid,
                "event_type": et, "value": 1.0, "props": "{}"}

    rows = [
        # user 1: full ordered funnel
        ev(1, 10, 1, "view"), ev(2, 20, 1, "click"), ev(3, 30, 1, "purchase"),
        # user 2: click BEFORE view — converts step 1 only
        ev(4, 20, 2, "click"), ev(5, 30, 2, "view"),
        # user 3: purchase before click — steps 1..2 only
        ev(6, 10, 3, "view"), ev(7, 15, 3, "purchase"), ev(8, 20, 3, "click"),
        # user 4: click at the SAME instant as view — strictly-after fails
        ev(9, 10, 4, "view"), ev(10, 10, 4, "click"),
        # user 5: never views
        ev(11, 10, 5, "purchase"), ev(12, 11, 5, "error"),
    ]
    t = pa.Table.from_pylist(rows).set_column(
        1, "ts", pa.Table.from_pylist(rows)["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))

    from norsk_historisk_avis_ocr_ray.functions.relational import q_funnel

    df = q_funnel(str(tmp_path)).set_index("step")
    assert df.loc["view", "n_users"] == 4          # users 1,2,3,4
    assert df.loc["click", "n_users"] == 2         # users 1,3 (4 is same-ts)
    assert df.loc["purchase", "n_users"] == 1      # user 1 only
    assert df.loc["view", "frac_prev"] == round(4 / 5, 6)
    assert df.loc["click", "frac_prev"] == 0.5
    assert df.loc["purchase", "frac_prev"] == 0.5


def test_funnel_gate_scale_monotone(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_funnel

    df = q_funnel(SF)
    n = df["n_users"].tolist()
    assert n[0] >= n[1] >= n[2] > 0


# --- q_bm25_topk (BM25 more-like-this retrieval) -----------------------------

def test_bm25_planted_ranking(ray_session, tmp_path):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_bm25_topk

    query = "fjord laks torsk sild makrell"          # doc 0 = the query doc
    docs = [
        query,
        "fjord laks torsk sild makrell",              # 1: exact term match
        "fjord laks torsk sild",                      # 2: 4 of 5 terms
        "fjord laks",                                 # 3: 2 of 5
        "helt andre ord uten treff her",              # 4: no terms → absent
        "fjord " * 30,                                # 5: one term, high tf
    ]
    df = q_bm25_topk(_write_docs(tmp_path, docs))
    assert list(df.columns) == ["doc_id", "bm25_q", "bm25"]
    assert 0 not in set(df["doc_id"])                 # query doc excluded
    assert 4 not in set(df["doc_id"])                 # zero-score excluded
    ranks = {int(r.doc_id): i for i, r in df.iterrows()}
    assert ranks[1] < ranks[2] < ranks[3]             # more terms → higher
    # scores are positive and the int/float columns agree
    assert (df["bm25_q"] > 0).all()
    assert (df["bm25"] == (df["bm25_q"] / 1e9).round(6)).all()


def test_bm25_gate_scale_shape(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_bm25_topk

    df = q_bm25_topk(SF)
    assert len(df) == 20
    assert df["bm25_q"].is_monotonic_decreasing


def test_c4_rstrip_and_tab_handling(ray_session, tmp_path):
    # terminal punctuation still counts through trailing spaces/tabs
    line = "fem ord er her na og mer."
    docs = ["\n".join([line + "   ", line + "\t", line])]
    df = _run_c4(_write_docs(tmp_path, docs))
    assert df.loc[0, "n_kept"] == 3 and df.loc[0, "keep"] == 1
