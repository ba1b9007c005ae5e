"""Driver-scale pinned ground truth for deterministic rows-only queries.

These pins guard deterministic ops whose primary gate is elsewhere
(``simhash_signatures`` / ``winnow_fingerprint`` gained exact DuckDB
oracles in round 3, ``bpe_train`` / ``quality_classifier`` in round 4 —
the pins stay as batching-independence tripwires). The FULL result table at
the driver's gate scale (sf0.01, 500 docs) is hashed against values
computed once and frozen here — any regression in tokenization, hashing,
winnowing selection, or batching-dependence flips the digest.
"""

import hashlib

import pytest

SF = "/root/testdata/sf0.01"


def table_digest(df) -> str:
    return hashlib.blake2b(df.to_csv(index=False).encode(),
                           digest_size=16).hexdigest()


def test_simhash_signatures_pinned_full_table(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import simhash_signatures

    df = (simhash_signatures(SF).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(df) == 500
    assert df.loc[0, "simhash"] == "20c140db9cf2a332"
    assert df.loc[1, "simhash"] == "10bc4ff884f2b230"
    assert table_digest(df) == "d14ef94a8040d4cd5fd3d879bc917457"


def test_winnow_fingerprint_pinned_full_table(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import winnow_fingerprint

    df = (winnow_fingerprint(SF).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(df) == 500
    assert df.loc[0, "n_fingerprints"] == 57
    assert df.loc[0, "fp_digest"] == "0c0257827538ed98af688dfd75ae3f9c"
    assert table_digest(df) == "09e12bf86663a36571becb687376702d"


def test_bpe_train_pinned_full_table(ray_session):
    """BPE merges are deterministic (integer counts, total tie-break
    order): the driver-scale merge table is frozen here."""
    from norsk_historisk_avis_ocr_ray.functions.bpe import bpe_train

    df = bpe_train(SF)
    assert len(df) == 40
    assert df.iloc[0][["left", "right", "pair_count"]].tolist() == \
        ["e", "r", 4568]
    assert table_digest(df) == "cd51827a6007e1f2d634525631e09f34"


def test_quality_classifier_pinned_full_table(ray_session):
    """Training is partitioning-deterministic (int64-quantized gradient
    partials), so the full scored table at driver scale pins exactly."""
    from norsk_historisk_avis_ocr_ray.functions.classifier import (
        quality_classifier)

    df = (quality_classifier(SF).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(df) == 500
    assert df.loc[0, "prob"] == 0.438813
    # round-4 re-pin: the integer-grid trainer (micro-unit weights, glibc
    # sigmoid) moves a handful of 6-decimal probs by one grid step; the op
    # is now ALSO exact-oracled, so this pin is a secondary guard
    assert table_digest(df) == "af683519398db42ac17ebd4d11dd1813"
