"""Semantic invariants for the round-4c TPC-H shapes over the reduced
schema (q2_min_cost_supplier, q11_important_stock, q16_supplier_cnt,
q20_promotion_suppliers). Exact value equality vs DuckDB is enforced by
tools/check_oracle.py; these pin the qualitative semantics."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"


def test_q2_winner_is_true_min_per_part(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q2_MAX_SIZE, Q2_REGION, Q2_TYPE, q2_min_cost_supplier)

    df = q2_min_cost_supplier(SF)
    assert len(df) > 0 and len(df) <= 100
    # acctbal DESC is the primary order
    assert (np.diff(df["s_acctbal"].to_numpy()) <= 1e-9).all()
    # every reported cost equals the true min offer for that part among
    # EUROPE suppliers (independently recomputed in DuckDB)
    truth = dict(duckdb.sql(f"""
        SELECT l.l_partkey, min(round(l.l_extendedprice, 2))
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
        JOIN '{SF}/region.parquet' r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{Q2_REGION}'
        GROUP BY l.l_partkey""").fetchall())
    parts = duckdb.sql(f"""
        SELECT p_partkey FROM '{SF}/part.parquet'
        WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
    """).df()["p_partkey"].to_numpy()
    assert set(df["p_partkey"]).issubset(set(int(p) for p in parts))
    for pk, cost in zip(df["p_partkey"], df["min_cost"]):
        assert abs(truth[int(pk)] - cost) < 5e-3


def test_q11_threshold_and_order(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q11_important_stock)

    df = q11_important_stock(SF)
    assert len(df) > 0
    vals = df["part_value"].to_numpy()
    # strictly above 1.5x the mean of the FULL per-part distribution is
    # impossible to check from the survivors alone, but survivors must
    # all exceed the survivor-implied floor: max >= 1.5*mean(all) implies
    # every kept value > the smallest kept value - grid eps; and order
    # is value DESC.
    assert (np.diff(vals) <= 1e-9).all()
    # keep decision is scale-invariant: at least one part is excluded
    n_parts = duckdb.sql(f"""
        SELECT count(DISTINCT l_partkey) FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'""").fetchone()[0]
    assert 0 < len(df) < n_parts


def test_q16_counts_match_brute_force(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q16_EXCL_BRAND, Q16_EXCL_TYPE, Q16_SIZES, q16_supplier_cnt)

    df = q16_supplier_cnt(SF)
    assert len(df) > 0
    assert (df["supplier_cnt"] > 0).all()
    assert not (df["p_brand"] == Q16_EXCL_BRAND).any()
    assert not (df["p_type"] == Q16_EXCL_TYPE).any()
    assert set(df["p_size"]).issubset(set(Q16_SIZES))
    # counts DESC is the primary order
    assert (np.diff(df["supplier_cnt"].to_numpy()) <= 0).all()
    total = duckdb.sql(f"""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
                    FROM '{SF}/lineitem.parquet')
        SELECT count(*) FROM (
            SELECT p.p_brand, p.p_type, p.p_size,
                   count(DISTINCT ps.l_suppkey)
            FROM ps
            JOIN '{SF}/part.parquet' p ON p.p_partkey = ps.l_partkey
            JOIN '{SF}/supplier.parquet' s
                 ON s.s_suppkey = ps.l_suppkey AND s.s_acctbal >= 0
            WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
              AND p.p_type <> '{Q16_EXCL_TYPE}'
              AND p.p_size IN {Q16_SIZES}
            GROUP BY 1, 2, 3)""").fetchone()[0]
    assert len(df) == total


def test_q20_half_sum_predicate(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q20_MIN_QTY, Q20_NAME_PREFIX, q20_promotion_suppliers)

    df = q20_promotion_suppliers(SF)
    assert len(df) > 0
    assert df["s_suppkey"].is_monotonic_increasing
    # every reported supplier has at least one qualifying (part, pair)
    # under the brute-force half-sum predicate
    winners = set(duckdb.sql(f"""
        SELECT DISTINCT l.l_suppkey
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '{Q20_NAME_PREFIX}%'
        GROUP BY l.l_partkey, l.l_suppkey
        HAVING 2 * sum(CASE WHEN l.l_shipdate >= DATE '1997-01-01'
                             AND l.l_shipdate < DATE '1998-01-01'
                        THEN l.l_quantity ELSE 0 END)
               > sum(l.l_quantity)
           AND sum(l.l_quantity) >= {Q20_MIN_QTY}
        """).df()["l_suppkey"])
    assert set(int(k) for k in df["s_suppkey"]) == set(
        int(k) for k in winners)


def test_knn_accuracy_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_knn_accuracy)

    df = q_knn_accuracy(SF)
    assert len(df) > 0
    assert (df["n_correct"] <= df["n"]).all()
    assert df["acc"].between(0.0, 1.0).all()
    emb = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"'{SF}/embeddings.parquet' ORDER BY vec_id").df()
    mat = np.stack(emb["embedding"].to_numpy())
    assert int(df["n"].sum()) == len(emb)
    # brute-force float 1-NN (cosine, tie-break nbr_id asc via argmax
    # stability on the exact grid is not reproduced here — so compare
    # the TOTAL accuracy, which ties cannot move at this scale)
    n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    sim = n @ n.T
    np.fill_diagonal(sim, -np.inf)
    pred = emb["label"].to_numpy()[sim.argmax(axis=1)]
    acc = float((pred == emb["label"].to_numpy()).mean())
    got = float(df["n_correct"].sum()) / float(df["n"].sum())
    assert abs(acc - got) < 0.02


def test_knn_hubness_edge_conservation(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        KNN_K, q_knn_hubness)

    df = q_knn_hubness(SF)
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    # every vector emits exactly K out-edges -> in-degrees sum to K*N,
    # and every vector appears in exactly one histogram bucket
    assert int(df["n_vecs"].sum()) == n_vecs
    assert int((df["in_degree"] * df["n_vecs"]).sum()) == KNN_K * n_vecs
    assert df["in_degree"].is_monotonic_increasing


def test_cdc_upsert_lww_semantics(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_cdc_upsert)

    df = q_cdc_upsert(SF).to_pandas()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    # compaction conserves the version count and keys are unique
    assert int(df["n_versions"].sum()) == n_events
    assert not df.duplicated(["user_id", "event_type"]).any()
    # the surviving ts is the true per-key max
    truth = duckdb.sql(f"""
        SELECT user_id, event_type, max(epoch_us(ts)) AS m
        FROM '{SF}/events.parquet' GROUP BY 1, 2""").df()
    m = df.merge(truth, on=["user_id", "event_type"])
    assert len(m) == len(df)
    assert (m["last_ts"].to_numpy(np.int64)
            == m["m"].to_numpy(np.int64)).all()


def test_ks_drift_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import q_ks_drift

    df = q_ks_drift(SF)
    docs = duckdb.sql(f"SELECT source, n_chars FROM "
                      f"'{SF}/documents.parquet'").df()
    srcs = sorted(docs["source"].unique())
    assert len(df) == len(srcs) * (len(srcs) - 1) // 2
    assert df["ks"].between(0.0, 1.0).all()
    # brute-force KS for three spot pairs
    for _, r in df.head(3).iterrows():
        xa = np.sort(docs[docs["source"] == r["source_a"]]
                     ["n_chars"].to_numpy())
        xb = np.sort(docs[docs["source"] == r["source_b"]]
                     ["n_chars"].to_numpy())
        grid = np.unique(np.concatenate([xa, xb]))
        ca = np.searchsorted(xa, grid, side="right") / len(xa)
        cb = np.searchsorted(xb, grid, side="right") / len(xb)
        assert abs(np.abs(ca - cb).max() - r["ks"]) < 2e-6
        assert int(r["n_a"]) == len(xa) and int(r["n_b"]) == len(xb)


def test_gini_length_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_gini_length)

    df = q_gini_length(SF)
    docs = duckdb.sql(f"SELECT source, n_chars FROM "
                      f"'{SF}/documents.parquet'").df()
    assert set(df["source"]) == set(docs["source"].unique())
    assert df["gini"].between(0.0, 1.0).all()
    for _, r in df.head(3).iterrows():
        x = np.sort(docs[docs["source"] == r["source"]]
                    ["n_chars"].to_numpy().astype(np.int64))
        n, s = len(x), x.sum()
        si = (np.arange(1, n + 1, dtype=np.int64) * x).sum()
        assert abs((2 * si - (n + 1) * s) / (n * s) - r["gini"]) < 2e-6
        assert int(r["n_docs"]) == n


def test_good_turing_identities(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_good_turing

    df = q_good_turing(SF)
    assert len(df) > 0
    assert (df["hapax"] <= df["vocab"]).all()
    assert (df["vocab"] <= df["n_tokens"]).all()
    assert df["gt_unseen"].between(0.0, 1.0).all()
    # brute force one source
    s = df["source"].iloc[0]
    truth = duckdb.sql(f"""
        WITH wd AS (SELECT unnest(list_filter(regexp_split_to_array(
                        lower(coalesce(text, '')), '\\s+'),
                        x -> x <> '')) AS tok
                    FROM '{SF}/documents.parquet' WHERE source = '{s}')
        SELECT count(*) AS n, count(DISTINCT tok) AS v,
               sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS h
        FROM (SELECT tok, count(*) AS c FROM wd GROUP BY tok)""").df()
    # n from the per-token counts: sum(c) == token occurrences
    r = df[df["source"] == s].iloc[0]
    assert int(r["vocab"]) == int(truth["v"].iloc[0])
    assert int(r["hapax"]) == int(truth["h"].iloc[0])


def test_ccnet_buckets_tercile_invariants(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_ccnet_buckets, q_unigram_ppl)

    df = q_ccnet_buckets(SF)
    assert len(df) > 0
    assert set(df["bucket"]).issubset({1, 2, 3})
    # every doc lands in exactly one bucket, token totals conserved
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert int(df["n_docs"].sum()) == n_docs
    ppl = q_unigram_ppl(SF).to_pandas()
    assert int(df["n_tokens"].sum()) == int(ppl["n_tokens"].sum())
    # within each source: buckets ordered head < middle < tail by mean
    # ppl (grid-tercile cut is monotone in v, v monotone in ppl), and the
    # tercile sizes are balanced up to one v-grid tie-group
    for src, g in df.groupby("source"):
        g = g.sort_values("bucket")
        m = g["mean_ppl"].to_numpy()
        assert (np.diff(m) > 0).all()
        assert g["n_docs"].min() > 0


def test_token_cover_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_token_cover

    df = q_token_cover(SF)
    assert len(df) > 0
    assert (df["cover_types"] <= df["n_types"]).all()
    assert (df["cover_types"] > 0).all()
    assert df["cover_ratio"].between(0.0, 1.0).all()
    # brute force one source: greedy descending-count prefix cover
    s = df["source"].iloc[0]
    cnts = duckdb.sql(f"""
        WITH wd AS (SELECT unnest(list_filter(regexp_split_to_array(
                        lower(coalesce(text, '')), '\\s+'),
                        x -> x <> '')) AS tok
                    FROM '{SF}/documents.parquet' WHERE source = '{s}')
        SELECT count(*) AS c FROM wd GROUP BY tok
        ORDER BY c DESC""").df()["c"].to_numpy(np.int64)
    total = int(cnts.sum())
    need = (9 * total + 9) // 10
    cover = int(np.searchsorted(np.cumsum(cnts), need)) + 1
    r = df[df["source"] == s].iloc[0]
    assert int(r["n_tokens"]) == total
    assert int(r["n_types"]) == len(cnts)
    assert int(r["cover_types"]) == cover


def test_dup_leakage_matches_bruteforce_sf01(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import q_dup_leakage

    # sf0.01 has no exact dups — both engines must agree on emptiness
    assert len(q_dup_leakage(SF)) == 0
    # sf0.1 plants 8 surplus exact-dup docs — non-trivial path
    sf1 = "/root/testdata/sf0.1"
    df = q_dup_leakage(sf1)
    assert len(df) > 0
    assert (df["n_pairs"] >= df["n_groups"]).all()
    truth = duckdb.sql(f"""
        WITH c AS (SELECT md5(coalesce(text, '')) AS fp, source,
                          count(*)::BIGINT AS c
                   FROM '{sf1}/documents.parquet' GROUP BY fp, source)
        SELECT a.source AS sa, b.source AS sb,
               sum(CASE WHEN a.source = b.source
                        THEN a.c * (a.c - 1) // 2
                        ELSE a.c * b.c END) AS np
        FROM c a JOIN c b ON a.fp = b.fp AND a.source <= b.source
        GROUP BY 1, 2 HAVING np > 0 ORDER BY 1, 2""").df()
    assert len(df) == len(truth)
    assert (df["n_pairs"].to_numpy(np.int64)
            == truth["np"].to_numpy(np.int64)).all()


def test_lang_confusion_conserves_docs(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        STOPWORDS, lang_id, q_lang_confusion)

    df = q_lang_confusion(SF)
    docs = duckdb.sql(f"SELECT doc_id, lang FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    assert set(df["lang_pred"]).issubset(set(STOPWORDS) | {"und"})
    assert set(df["lang"]).issubset(set(docs["lang"].unique()))
    assert df["mean_score"].between(0.0, 1.0).all()
    # cell counts replay from the per-doc lang_id predictions
    pred = lang_id(SF).to_pandas().merge(docs, on="doc_id")
    truth = (pred.groupby(["lang", "lang_pred"]).size()
             .reset_index(name="n"))
    m = df.merge(truth, on=["lang", "lang_pred"], how="outer")
    assert not m["n_docs"].isna().any() and not m["n"].isna().any()
    assert (m["n_docs"].to_numpy(np.int64)
            == m["n"].to_numpy(np.int64)).all()


def test_fertility_matches_per_doc_stats(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_fertility, text_token_stats)

    df = q_fertility(SF)
    docs = duckdb.sql(f"SELECT doc_id, lang FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    assert (df["fertility"] > 0).all()
    assert (df["chars_per_subtoken"] > 0).all()
    # per-lang sums replay from the per-doc text_token_stats rows
    per = text_token_stats(SF).to_pandas().merge(docs, on="doc_id")
    truth = per.groupby("lang", as_index=False).agg(
        nw=("n_tokens", "sum"), ns=("n_subtokens", "sum"),
        nc=("n_chars", "sum"))
    m = df.merge(truth, on="lang")
    assert len(m) == len(df)
    assert (m["n_words"].to_numpy(np.int64)
            == m["nw"].to_numpy(np.int64)).all()
    assert (m["n_subtokens"].to_numpy(np.int64)
            == m["ns"].to_numpy(np.int64)).all()
    assert (m["n_chars"].to_numpy(np.int64)
            == m["nc"].to_numpy(np.int64)).all()


def test_length_percentiles_match_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_length_percentiles)

    df = q_length_percentiles(SF)
    docs = duckdb.sql(f"SELECT source, n_chars FROM "
                      f"'{SF}/documents.parquet'").df()
    assert set(df["source"]) == set(docs["source"].unique())
    assert (df["p50"] <= df["p90"]).all() and (df["p90"] <= df["p99"]).all()
    for _, r in df.iterrows():
        x = np.sort(docs[docs["source"] == r["source"]]
                    ["n_chars"].to_numpy(np.int64))
        n = len(x)
        assert int(r["n_docs"]) == n
        for q, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            # min v with 100*cum(v) >= q*n == the ceil(q*n/100)-th order
            # statistic (1-based)
            k = -(-q * n // 100)
            assert int(r[col]) == int(x[k - 1])


def test_doremi_weights_invariants(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_doremi_weights)

    df = q_doremi_weights(SF)
    assert len(df) > 0
    assert (df["loss"] > 0).all()
    assert (df["excess"] >= 0).all()
    # the corpus mean is the token-weighted mean of source losses, so at
    # least one source sits at-or-below it -> zero excess
    assert df["excess"].min() == 0.0
    assert abs(df["weight"].sum() - 1.0) < 1e-4
    # upweighting is monotone in excess
    s = df.sort_values("excess")
    assert (np.diff(s["weight"].to_numpy()) >= -1e-12).all()
    # token conservation vs the oracle tokenizer
    truth = duckdb.sql(f"""
        SELECT count(*) FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
                   AS tok
            FROM '{SF}/documents.parquet') WHERE tok <> ''""").fetchone()[0]
    assert int(df["n_tokens"].sum()) == truth


def test_bpe_fertility_matches_per_doc_encode(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.bpe import (
        bpe_encode, q_bpe_fertility)

    df = q_bpe_fertility(SF)
    docs = duckdb.sql(f"SELECT doc_id, source FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    # a trained-BPE token is at least one per word (</w> marker)
    assert (df["n_bpe_tokens"] >= df["n_words"]).all()
    assert (df["bpe_fertility"] >= 1.0).all()
    # per-source sums replay from the per-doc bpe_encode rows
    per = bpe_encode(SF).to_pandas().merge(docs, on="doc_id")
    truth = per.groupby("source", as_index=False).agg(
        nw=("n_words", "sum"), nb=("n_bpe_tokens", "sum"))
    m = df.merge(truth, on="source")
    assert len(m) == len(df)
    assert (m["n_words"].to_numpy(np.int64)
            == m["nw"].to_numpy(np.int64)).all()
    assert (m["n_bpe_tokens"].to_numpy(np.int64)
            == m["nb"].to_numpy(np.int64)).all()


def test_near_dup_leakage_counts_verified_pairs(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_minhash, q_near_dup_leakage)

    df = q_near_dup_leakage(SF)
    pairs = dedup_minhash(SF)
    # every verified pair lands in exactly one matrix cell
    assert int(df["n_pairs"].sum()) == len(pairs)
    assert (df["source_a"] <= df["source_b"]).all()
    if len(pairs):
        # spot-replay one pair's cell membership
        docs = duckdb.sql(f"SELECT doc_id, source FROM "
                          f"'{SF}/documents.parquet'").df()
        src = dict(zip(docs["doc_id"], docs["source"]))
        p = pairs.iloc[0]
        sa, sb = sorted((src[int(p["a"])], src[int(p["b"])]))
        cell = df[(df["source_a"] == sa) & (df["source_b"] == sb)]
        assert len(cell) == 1 and int(cell["n_pairs"].iloc[0]) >= 1


def test_cluster_purity_invariants(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        emb_kmeans, q_cluster_purity)

    df = q_cluster_purity(SF)
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    assert int(df["n_vecs"].sum()) == n_vecs
    assert (df["purity"] > 0).all() and (df["purity"] <= 1.0).all()
    assert (df["entropy"] >= 0).all()
    # single-label clusters have zero entropy and purity 1
    one = df[df["n_labels"] == 1]
    if len(one):
        assert (one["entropy"] == 0.0).all()
        assert (one["purity"] == 1.0).all()
    # cluster ids and sizes agree with the emb_kmeans summary
    km = emb_kmeans(SF)
    m = df.merge(km, on="cluster")
    assert len(m) == len(df)
    assert (m["n_vecs"].to_numpy(np.int64)
            == m["n"].to_numpy(np.int64)).all()


def test_pack_stats_matches_seq_pack_rollup(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        PACK_CAPACITY, q_pack_stats, seq_pack)

    df = q_pack_stats(SF)
    bins = seq_pack(SF)
    assert int(df["n_bins"].sum()) == len(bins)
    assert int(df["n_tokens"].sum()) == int(bins["n_tokens"].sum())
    assert int(df["n_docs"].sum()) == int(bins["n_docs"].sum())
    truth = ((10 * bins["n_tokens"].to_numpy(np.int64)) // PACK_CAPACITY)
    t = (pd.Series(truth).value_counts().sort_index())
    assert list(df["fill_decile"]) == list(t.index)
    assert list(df["n_bins"]) == list(t.to_numpy())


def test_quality_vs_dup_contingency(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_quality_vs_dup)
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_gopher_filter)

    # sf0.1 has planted exact dups -> the dup column is exercised
    sf1 = "/root/testdata/sf0.1"
    df = q_quality_vs_dup(sf1)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf1}/documents.parquet'").fetchone()[0]
    assert int(df["n_docs"].sum()) == n_docs
    assert set(zip(df["keep"], df["is_dup"])) <= {(0, 0), (0, 1),
                                                  (1, 0), (1, 1)}
    assert int(df[df["is_dup"] == 1]["n_docs"].sum()) == duckdb.sql(f"""
        SELECT count(*) FROM (
            SELECT count(*) OVER (PARTITION BY md5(coalesce(text, '')))
                   AS c
            FROM '{sf1}/documents.parquet') WHERE c > 1""").fetchone()[0]
    # keep margin agrees with the gopher stream
    keep = q_gopher_filter(sf1).to_pandas()["keep"].to_numpy(np.int64)
    assert int(df[df["keep"] == 1]["n_docs"].sum()) == int(keep.sum())


def test_cdc_chunks_bruteforce_and_edit_stability(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        CDC_MASK, _gram_hashes, q_cdc_chunks)

    df = q_cdc_chunks(SF).to_pandas().sort_values("doc_id")
    docs = duckdb.sql(f"SELECT doc_id, text FROM "
                      f"'{SF}/documents.parquet' ORDER BY doc_id").df()
    assert len(df) == len(docs)
    assert (df["n_chunks"] >= 1).all()
    assert (df["max_chunk"] <= df["n_grams"]).all()
    # brute-force three docs
    for _, r in docs.head(3).iterrows():
        h = _gram_hashes(r["text"] or "")
        pos = np.nonzero(h % np.uint64(CDC_MASK) == 0)[0] + 1
        got = df[df["doc_id"] == r["doc_id"]].iloc[0]
        assert int(got["n_grams"]) == len(h)
        assert int(got["n_chunks"]) == len(pos) + 1
    # the CDC property: a prefix edit shifts content but boundaries
    # re-synchronize — chunks after the first boundary are identical
    t = docs["text"].iloc[0]
    if isinstance(t, str) and len(t) > 200:
        h1 = _gram_hashes(t)
        h2 = _gram_hashes("XYZ " + t)
        b1 = set((np.nonzero(h1 % np.uint64(CDC_MASK) == 0)[0]).tolist())
        b2 = set((np.nonzero(h2 % np.uint64(CDC_MASK) == 0)[0] - 4)
                 .tolist())
        if b1:
            first = min(b1)
            assert {x for x in b1 if x > first} <= b2


def test_encoding_health_matches_python(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_encoding_health)

    df = q_encoding_health(SF)
    docs = duckdb.sql(f"SELECT source, text FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    assert df["non_ascii_ratio"].between(0.0, 1.0).all()
    # brute-force one source in plain Python codepoint space
    s = df["source"].iloc[0]
    texts = docs[docs["source"] == s]["text"].fillna("")
    nc = sum(len(t) for t in texts)
    na = sum(sum(1 for ch in t if ord(ch) > 0x7F) for t in texts)
    nf = sum(t.count("�") for t in texts)
    r = df[df["source"] == s].iloc[0]
    assert int(r["n_chars"]) == nc
    assert int(r["n_non_ascii"]) == na
    assert int(r["n_replacement"]) == nf


def test_shard_skew_matches_prepare_sharding(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import _fmix64
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        SKEW_SHARDS, q_shard_skew)
    from norsk_historisk_avis_ocr_ray.pipelines.prepare import (
        PREPARE_SHARDS)

    assert SKEW_SHARDS == PREPARE_SHARDS   # forecasts the ACTUAL job
    df = q_shard_skew(SF)
    docs = duckdb.sql(f"SELECT doc_id, n_chars FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    assert abs(df["load_frac"].sum() - 1.0) < 1e-4
    # replay the sharding exactly
    sh = (_fmix64(docs["doc_id"].to_numpy(np.uint64))
          % np.uint64(SKEW_SHARDS)).astype(np.int64)
    truth = pd.Series(sh).value_counts().sort_index()
    m = df.set_index("shard")["n_docs"]
    assert (m.reindex(truth.index).to_numpy(np.int64)
            == truth.to_numpy(np.int64)).all()


def test_curation_report_margins_match_component_ops(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_curation_report, q_doremi_weights)
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_encoding_health, q_gopher_filter)

    df = q_curation_report(SF)
    docs = duckdb.sql(f"SELECT doc_id, source FROM "
                      f"'{SF}/documents.parquet'").df()
    assert int(df["n_docs"].sum()) == len(docs)
    assert df["keep_rate"].between(0.0, 1.0).all()
    # keep margin == the gopher stream's
    keep = q_gopher_filter(SF).to_pandas().merge(docs, on="doc_id")
    truth = keep.groupby("source")["keep"].sum()
    m = df.set_index("source")
    assert (m["keep_rate"] * m["n_docs"]).round().astype(np.int64).equals(
        truth.reindex(m.index).astype(np.int64))
    # mean_nll == q_doremi_weights' loss for every source present there
    dw = q_doremi_weights(SF).set_index("source")
    for s in dw.index:
        assert abs(float(m.loc[s, "mean_nll"])
                   - float(dw.loc[s, "loss"])) < 2e-6
    # non-ASCII ratio == q_encoding_health's
    eh = q_encoding_health(SF).set_index("source")
    for s in m.index:
        assert float(m.loc[s, "non_ascii_ratio"]) == float(
            eh.loc[s, "non_ascii_ratio"])


def test_dedup_funnel_stage_identities(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.cluster import (
        minhash_clusters)
    from norsk_historisk_avis_ocr_ray.functions.dedup import q_dedup_funnel

    sf1 = "/root/testdata/sf0.1"    # has planted exact dups
    df = q_dedup_funnel(sf1).set_index("stage")
    n, d, dup = duckdb.sql(f"""
        SELECT count(*), count(DISTINCT md5(coalesce(text, ''))),
               count(*) - count(DISTINCT md5(coalesce(text, '')))
        FROM '{sf1}/documents.parquet'""").fetchone()
    assert int(df.loc["input", "n_kept"]) == n
    assert int(df.loc["exact", "n_kept"]) == d
    assert int(df.loc["exact", "n_removed"]) == dup
    cl = minhash_clusters(sf1)
    removed = len(cl) - cl["cluster_id"].nunique()
    assert int(df.loc["near_dup", "n_removed"]) == removed
    assert int(df.loc["near_dup", "n_kept"]) == n - removed
    # near-dup removes at least the exact surplus (exact dups are
    # jaccard-1 pairs, so they are members of some near-dup cluster)
    assert removed >= dup


def test_hard_negatives_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_hard_negatives)

    df = q_hard_negatives(SF).to_pandas().sort_values("vec_id")
    emb = duckdb.sql(f"SELECT vec_id, embedding, label FROM "
                     f"'{SF}/embeddings.parquet' ORDER BY vec_id").df()
    # every vector has some differing-label peer in this corpus
    assert len(df) == len(emb)
    assert (df["label"] != df["neg_label"]).all()
    # brute-force float argmax for three anchors (ties can't move the
    # winner at float precision on this data)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-30)
    labs = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy(np.int64)
    for row in range(3):
        sims = nrm[row] @ nrm.T
        mask = (labs != labs[row]) & (ids != ids[row])
        best = ids[mask][np.argmax(sims[mask])]
        got = df[df["vec_id"] == ids[row]].iloc[0]
        assert int(got["neg_id"]) == int(best)


def test_contrastive_margin_consistency(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_contrastive_margin, q_hard_negatives, q_positive_pairs)

    df = q_contrastive_margin(SF)
    pos = q_positive_pairs(SF).to_pandas()
    neg = q_hard_negatives(SF).to_pandas()
    assert len(df) > 0
    # anchors contributing = inner join of the two mining outputs
    j = pos.merge(neg[["vec_id", "cos"]], on="vec_id",
                  suffixes=("_p", "_n"))
    assert int(df["n"].sum()) == len(j)
    # margin identity per label (to rounding)
    t = (j.assign(m=j["cos_p"] - j["cos_n"])
         .groupby("label")["m"].mean())
    m = df.set_index("label")["mean_margin"]
    for lb in m.index:
        assert abs(float(m.loc[lb]) - float(t.loc[lb])) < 5e-6
    # a same-label pair is a valid positive; labels agree on both sides
    assert (pos["label"] == pos.merge(
        neg[["vec_id", "label"]], on="vec_id")["label_y"]).all()


def test_diurnal_profile_conservation(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_diurnal_profile)

    df = q_diurnal_profile(SF)
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert int(df["n_events"].sum()) == n_events
    assert df["hour"].between(0, 23).all()
    assert (df["n_users"] <= df["n_events"]).all()
    # spot-check one cell's distinct users
    r = df.iloc[0]
    truth = duckdb.sql(f"""
        SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'
        WHERE event_type = '{r["event_type"]}'
          AND (floor(epoch(ts) / 3600) % 24) = {int(r["hour"])}
        """).fetchone()[0]
    assert int(r["n_users"]) == truth


def test_session_hist_matches_sessionize_rollup(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_session_hist, q_sessionize)

    df = q_session_hist(SF)
    sess = q_sessionize(SF).to_pandas()
    assert int(df["n_sessions"].sum()) == len(sess)
    assert int((df["n_events"] * df["n_sessions"]).sum()) == int(
        sess["n_events"].sum())
    truth = (sess.groupby("n_events")
             .agg(c=("n_events", "size"), d=("duration_s", "mean")))
    m = df.set_index("n_events")
    for depth in truth.index:
        assert int(m.loc[depth, "n_sessions"]) == int(
            truth.loc[depth, "c"])
        assert abs(float(m.loc[depth, "mean_duration_s"])
                   - float(truth.loc[depth, "d"])) < 2e-6


def test_anomaly_days_integer_test_matches_float(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_anomaly_days)

    # sf0.1 exhibits >3-sigma days; verify against float z-scores
    sf1 = "/root/testdata/sf0.1"
    df = q_anomaly_days(sf1)
    counts = duckdb.sql(f"""
        SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT)
               AS day, count(*) AS n
        FROM '{sf1}/events.parquet' GROUP BY 1, 2""").df()
    flagged = set()
    for et, g in counts.groupby("event_type"):
        n = g["n"].to_numpy(np.float64)
        mu, sd = n.mean(), n.std()   # population sigma, matches D*Q-S^2
        for day, x in zip(g["day"], n):
            if sd > 0 and abs(x - mu) > 3 * sd:
                flagged.add((et, int(day)))
    assert set(zip(df["event_type"], df["day"].astype(int))) == flagged
    assert (df["z"] > 3.0).all()


def test_keep_by_length_margins(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_gopher_filter, q_keep_by_length)

    df = q_keep_by_length(SF)
    docs = duckdb.sql(f"SELECT count(*) FROM "
                      f"'{SF}/documents.parquet'").fetchone()[0]
    assert int(df["n_docs"].sum()) == docs
    assert set(df["decile"]).issubset(set(range(1, 11)))
    assert df["keep_rate"].between(0.0, 1.0).all()
    # keep margin equals the gopher stream's total
    keep = q_gopher_filter(SF).to_pandas()["keep"].to_numpy(np.int64)
    assert int(df["n_keep"].sum()) == int(keep.sum())
    # deciles are roughly balanced (within one tie-run of n/10)
    assert df["n_docs"].max() <= docs // 10 + docs // 2


def test_first_touch_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_first_touch)

    df = q_first_touch(SF)
    ev = duckdb.sql(f"""
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM '{SF}/events.parquet'""").df()
    n_users = ev["user_id"].nunique()
    assert int(df["n_users"].sum()) == n_users
    assert int(df["n_events"].sum()) == len(ev)
    first = (ev.sort_values(["user_id", "sec", "event_id"])
             .groupby("user_id").first())
    truth = first["event_type"].value_counts()
    m = df.set_index("first_type")["n_users"]
    for et in truth.index:
        assert int(m.loc[et]) == int(truth.loc[et])


def test_user_concentration_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_user_concentration)

    df = q_user_concentration(SF)
    assert len(df) == 1
    r = df.iloc[0]
    counts = duckdb.sql(f"""
        SELECT count(*) AS n FROM '{SF}/events.parquet'
        GROUP BY user_id""").df()["n"].to_numpy(np.int64)
    u, e = len(counts), int(counts.sum())
    assert int(r["n_users"]) == u and int(r["n_events"]) == e
    need = (u + 9) // 10
    top = int(np.sort(counts)[::-1][:need].sum())
    assert int(r["top10_events"]) == top
    assert abs(float(r["top10_share"]) - top / e) < 2e-6
    # Gini against the float formula
    x = np.sort(counts).astype(np.float64)
    i = np.arange(1, u + 1, dtype=np.float64)
    g = float((2 * (i * x).sum() - (u + 1) * x.sum()) / (u * x.sum()))
    assert abs(float(r["gini"]) - g) < 2e-6


def test_rfm_segments_invariants(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_rfm_segments)

    df = q_rfm_segments(SF)
    n_users = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                         f"'{SF}/events.parquet'").fetchone()[0]
    assert int(df["n_users"].sum()) == n_users
    for c in ("r", "f", "m"):
        assert df[c].between(1, 3).all()
        marg = df.groupby(c)["n_users"].sum()
        # tercile 1 always populated (ties take the better tercile); a
        # dominant tie group may legitimately empty tercile 2
        assert 1 in marg.index
        assert marg.loc[1] >= n_users // 3
    # frequency/monetary are well-spread in this corpus: all terciles
    for c in ("f", "m"):
        assert set(df.groupby(c)["n_users"].sum().index) == {1, 2, 3}
    assert not df.duplicated(["r", "f", "m"]).any()


def test_transition_time_matches_transitions(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_event_transitions, q_transition_time)

    df = q_transition_time(SF)
    base = q_event_transitions(SF)
    # the timed matrix has exactly the transition matrix's cells/counts
    m = df.merge(base, on=["prev_type", "next_type"])
    assert len(m) == len(df) == len(base)
    assert (m["n_x"].to_numpy(np.int64)
            == m["n_y"].to_numpy(np.int64)).all()
    assert (df["mean_gap_s"] >= 0).all()
    # spot-check one cell against a brute-force lag mean
    r = df.iloc[0]
    truth = duckdb.sql(f"""
        WITH s AS (SELECT user_id, event_type,
                          lag(event_type) OVER w AS pt,
                          epoch_us(ts) - lag(epoch_us(ts)) OVER w AS g
                   FROM '{SF}/events.parquet'
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
        SELECT avg(g / 1000000.0) FROM s
        WHERE pt = '{r["prev_type"]}'
          AND event_type = '{r["next_type"]}'""").fetchone()[0]
    assert abs(float(r["mean_gap_s"]) - float(truth)) < 1e-4


def test_dedup_thresholds_monotone_and_consistent(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_minhash, q_dedup_thresholds)

    df = q_dedup_thresholds(SF)
    assert list(df["threshold"]) == [0.7, 0.8, 0.9]
    n = df["n_pairs"].to_numpy(np.int64)
    assert (np.diff(n) <= 0).all()         # monotone non-increasing
    # the 0.8 row equals the default dedup_minhash pair count
    assert int(df[df["threshold"] == 0.8]["n_pairs"].iloc[0]) == len(
        dedup_minhash(SF))


def test_source_entropy_matches_scipy_form(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_source_entropy)

    df = q_source_entropy(SF)
    assert len(df) > 0
    assert (df["entropy"] > 0).all()
    # entropy <= ln(vocab) (uniform bound)
    assert (df["entropy"].to_numpy()
            <= np.log(df["vocab"].to_numpy(np.float64)) + 1e-6).all()
    # brute-force one source
    s = df["source"].iloc[0]
    cnt = duckdb.sql(f"""
        WITH wd AS (SELECT unnest(list_filter(regexp_split_to_array(
                        lower(coalesce(text, '')), '\\s+'),
                        x -> x <> '')) AS tok
                    FROM '{SF}/documents.parquet' WHERE source = '{s}')
        SELECT count(*) AS c FROM wd GROUP BY tok""").df()["c"].to_numpy(
        np.float64)
    p = cnt / cnt.sum()
    h = float(-(p * np.log(p)).sum())
    r = df[df["source"] == s].iloc[0]
    assert abs(float(r["entropy"]) - h) < 1e-4
    assert int(r["vocab"]) == len(cnt)


def test_ref_integrity_matches_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_ref_integrity)

    df = q_ref_integrity(SF).set_index("pair")
    d = set(duckdb.sql(f"SELECT DISTINCT doc_id FROM "
                       f"'{SF}/documents.parquet'").df()["doc_id"])
    e = set(duckdb.sql(f"SELECT DISTINCT vec_id FROM "
                       f"'{SF}/embeddings.parquet'").df()["vec_id"])
    r = df.loc["documents-embeddings"]
    assert int(r["n_left"]) == len(d) and int(r["n_right"]) == len(e)
    assert int(r["n_matched"]) == len(d & e)
    assert int(r["n_left_only"]) == len(d - e)
    assert int(r["n_right_only"]) == len(e - d)
    u = set(duckdb.sql(f"SELECT DISTINCT user_id FROM "
                       f"'{SF}/events.parquet'").df()["user_id"])
    c = set(duckdb.sql(f"SELECT DISTINCT c_custkey FROM "
                       f"'{SF}/customer.parquet'").df()["c_custkey"])
    r = df.loc["events-customer"]
    assert int(r["n_matched"]) == len(u & c)
    assert int(r["n_left_only"]) == len(u - c)
    assert int(r["n_right_only"]) == len(c - u)


def test_stopword_profile_bruteforce(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        GOPHER_STOPS, q_stopword_profile)

    df = q_stopword_profile(SF)
    assert df["stop_frac"].between(0.0, 1.0).all()
    s = df["source"].iloc[0]
    texts = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet' "
                       f"WHERE source = '{s}'").df()["text"].fillna("")
    toks = [w for t in texts for w in t.lower().split()]
    r = df[df["source"] == s].iloc[0]
    assert int(r["n_tokens"]) == len(toks)
    assert int(r["n_stop"]) == sum(1 for w in toks if w in GOPHER_STOPS)


def test_dup_distance_covers_pairs(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_minhash, q_dup_distance)

    df = q_dup_distance(SF)
    pairs = dedup_minhash(SF)
    assert int(df["n_pairs"].sum()) == len(pairs)
    assert (df["min_dist"] <= df["max_dist"]).all()
    assert df["dist_bucket"].is_monotonic_increasing
    # grid consistency: bucket == floor(100*ln(1+min_dist)) for each row
    import math
    for _, r in df.iterrows():
        assert int(r["dist_bucket"]) == math.floor(
            100 * math.log(1.0 + float(r["min_dist"])))


def test_transition_entropy_bounds(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_event_transitions, q_transition_entropy)

    df = q_transition_entropy(SF)
    base = q_event_transitions(SF)
    assert set(df["prev_type"]) == set(base["prev_type"].unique())
    assert (df["entropy"] >= 0).all()
    assert (df["entropy"].to_numpy()
            <= np.log(df["n_next_types"].to_numpy(np.float64))
            + 1e-9).all()
    # brute-force one row
    pt = df["prev_type"].iloc[0]
    c = base[base["prev_type"] == pt]["n"].to_numpy(np.float64)
    p = c / c.sum()
    h = float(-(p * np.log(p)).sum())
    assert abs(float(df[df["prev_type"] == pt]["entropy"].iloc[0])
               - h) < 1e-4


def test_daily_actives_identities(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_daily_actives)

    df = q_daily_actives(SF)
    n_users = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                         f"'{SF}/events.parquet'").fetchone()[0]
    # every user is new exactly once
    assert int(df["n_new"].sum()) == n_users
    assert (df["n_active"] == df["n_new"] + df["n_returning"]).all()
    # day-one actives are all new
    assert int(df.iloc[0]["n_returning"]) == 0
    # active sum equals distinct (user, day) pairs
    pairs = duckdb.sql(f"""
        SELECT count(*) FROM (SELECT DISTINCT user_id,
            CAST(floor(epoch(ts) / 86400) AS BIGINT)
        FROM '{SF}/events.parquet')""").fetchone()[0]
    assert int(df["n_active"].sum()) == pairs


def test_charclass_profile_bruteforce(ray_session):
    import re

    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_charclass_profile)

    df = q_charclass_profile(SF)
    for c in ("letter_frac", "digit_frac", "space_frac"):
        assert df[c].between(0.0, 1.0).all()
    s = df["source"].iloc[0]
    texts = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet' "
                       f"WHERE source = '{s}'").df()["text"].fillna("")
    blob = "".join(texts)
    r = df[df["source"] == s].iloc[0]
    assert int(r["n_chars"]) == len(blob)
    nl = len(re.findall(r"[A-Za-zæøåÆØÅ]", blob))
    assert abs(float(r["letter_frac"]) - nl / len(blob)) < 2e-6


def test_cluster_medoids_are_members_nearest_centroid(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        emb_kmeans, q_cluster_medoids)

    df = q_cluster_medoids(SF)
    km = emb_kmeans(SF)
    m = df.merge(km, on="cluster")
    assert len(m) == len(df) == len(km)
    # sizes agree with the kmeans summary; ids unique; dists nonneg
    assert (m["n_vecs"].to_numpy(np.int64)
            == m["n"].to_numpy(np.int64)).all()
    assert df["medoid_id"].is_unique
    assert (df["dist2"] >= 0).all()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    assert int(df["n_vecs"].sum()) == n_vecs


def test_label_balance_and_dedup_savings(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        q_dedup_savings)
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_label_balance)

    lb = q_label_balance(SF)
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    assert int(lb["n_vecs"].sum()) == n_vecs
    assert abs(lb["frac"].sum() - 1.0) < 1e-4

    # sf0.1 has exact dups: savings must be positive there, zero at SF
    sv = q_dedup_savings(SF)
    assert len(sv) == 1 and int(sv["n_removed"].iloc[0]) == 0
    sv1 = q_dedup_savings("/root/testdata/sf0.1").iloc[0]
    n, d = duckdb.sql("""
        SELECT count(*), count(*) - count(DISTINCT md5(coalesce(text, '')))
        FROM '/root/testdata/sf0.1/documents.parquet'""").fetchone()
    assert int(sv1["n_docs"]) == n
    assert int(sv1["n_removed"]) == d
    assert int(sv1["chars_removed"]) > 0
    assert 0 < float(sv1["saved_frac"]) < 1


def test_dup_cluster_sizes_matches_components(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.cluster import (
        minhash_clusters, q_dup_cluster_sizes)

    df = q_dup_cluster_sizes(SF)
    cl = minhash_clusters(SF)
    assert int(df["n_docs"].sum()) == len(cl)
    assert int(df["n_clusters"].sum()) == cl["cluster_id"].nunique()
    assert (df["cluster_size"] >= 2).all()   # components have >= 2 members
    assert (df["n_docs"]
            == df["cluster_size"] * df["n_clusters"]).all()


def test_outlier_users_matches_float_sigma(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_outlier_users)

    sf1 = "/root/testdata/sf0.1"      # has 9 spend outliers
    df = q_outlier_users(sf1)
    totals = duckdb.sql(f"""
        SELECT user_id, sum(round(value * 100)) AS t
        FROM '{sf1}/events.parquet' GROUP BY user_id""").df()
    t = totals["t"].to_numpy(np.float64)
    mu, sd = t.mean(), t.std()
    flagged = set(totals.loc[np.abs(t - mu) > 3 * sd, "user_id"]
                  .astype(int))
    assert set(df["user_id"].astype(int)) == flagged
    assert (df["z"] > 3.0).all()


def test_rank_normalize_is_cume_dist(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_rank_normalize)

    df = q_rank_normalize(SF).to_pandas().sort_values("doc_id")
    x = df["n_chars"].to_numpy(np.int64)
    n = len(x)
    assert df["pct_rank"].between(0.0, 1.0).all()
    assert df["pct_rank"].max() == 1.0
    # monotone in value and equal on ties
    order = np.argsort(x, kind="mergesort")
    p = df["pct_rank"].to_numpy()[order]
    assert (np.diff(p) >= -1e-12).all()
    xs = np.sort(x)
    cume = np.searchsorted(xs, x, side="right") / n
    assert np.abs(cume - df["pct_rank"].to_numpy()).max() < 1e-6
