"""Exhaustive 0-1-principle verification of the median selection networks.

A comparator network computes an order statistic for ALL real inputs iff it
does for all 0-1 inputs (monotone-threshold argument), so these brute-force
enumerations are complete proofs, not samples.
"""

import itertools

from istnet_tpu.data.device_preprocess import (
    _MEDIAN25_SC_CES,
    _MEDIAN25_SC_OUT,
    _SORT5_CES,
)


def _run(ces, v):
    w = list(v)
    for a, b in ces:
        w[a], w[b] = min(w[a], w[b]), max(w[a], w[b])
    return w


def test_sort5_network_all_01_inputs():
    for bits in range(32):
        v = [(bits >> i) & 1 for i in range(5)]
        assert _run(_SORT5_CES, v) == sorted(v)


def test_median25_sorted_columns_all_01_inputs():
    """All 6^5 bit patterns whose five 5-runs are sorted (the network's
    precondition — the kernel feeds pre-sorted vertical quintuples)."""
    for zs in itertools.product(range(6), repeat=5):
        v = []
        for z in zs:
            v += [0] * (5 - z) + [1] * z
        got = _run(_MEDIAN25_SC_CES, v)[_MEDIAN25_SC_OUT]
        assert got == sorted(v)[12]


def test_median25_random_reals_vs_numpy():
    import numpy as np

    rng = np.random.RandomState(0)
    for _ in range(200):
        cols = np.sort(rng.randn(5, 5), axis=1)
        v = [float(x) for x in cols.reshape(-1)]
        got = _run(_MEDIAN25_SC_CES, v)[_MEDIAN25_SC_OUT]
        assert got == float(np.median(v))
