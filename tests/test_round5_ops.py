"""Round-5 pins: scale-derived sweep blocks, distributed component
closure, and the other VERDICT-r4 fix items."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestNeardupBlockInvariance:
    """embedding_neardup derives its block count from scale.pair_blocks
    (round-5 change); the float cosines must be block-count-independent
    because the corpus embeddings are integer-grid (exact float64 dots
    under any BLAS blocking). Pin that invariance explicitly."""

    def test_block_counts_agree(self):
        from norsk_historisk_avis_ocr_ray.functions.similarity import (
            embedding_neardup)

        base = embedding_neardup(SF, n_blocks=4)
        for nb in (3, 7, 13):
            alt = embedding_neardup(SF, n_blocks=nb)
            pd.testing.assert_frame_equal(base, alt)

    def test_default_derives_from_scale(self):
        from norsk_historisk_avis_ocr_ray.functions import scale
        from norsk_historisk_avis_ocr_ray.functions.similarity import (
            embedding_neardup)

        derived = embedding_neardup(SF)
        explicit = embedding_neardup(SF, n_blocks=scale.pair_blocks())
        pd.testing.assert_frame_equal(derived, explicit)
