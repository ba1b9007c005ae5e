"""Planted ground truth for the round-4b operators: q_basket_pairs
(market-basket part-pair mining), q_zipf_slope (Zipf-exponent fit on the
micro-quantized log grid), and q_silhouette (integer-grid cluster
silhouette). Exact SQL equality is enforced by tools/check_oracle.py;
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
