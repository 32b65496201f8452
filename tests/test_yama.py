"""yama DP vs golden outputs of the reference C kernel (fuzz fixtures)."""

import os

import numpy as np
import pytest

from multiz_tpu import yama as Y

from .conftest import GOLDEN

FIX = os.path.join(GOLDEN, "yama_fuzz.npz")


@pytest.fixture(scope="module")
def cases():
    data = np.load(FIX)
    n = int(data["n_cases"])
    return data, n


def test_yama_numpy_matches_reference(cases):
    data, n = cases
    for i in range(n):
        A = data[f"case{i}_A"]
        B = data[f"case{i}_B"]
        LB = data[f"case{i}_LB"]
        RB = data[f"case{i}_RB"]
        want = data[f"case{i}_out"]
        got = Y.yama_numpy(A, B, LB, RB)
        assert got.shape == want.shape, f"case {i}: shape {got.shape} != {want.shape}"
        assert np.array_equal(got, want), f"case {i}: content mismatch"


def test_band_checks():
    A = np.full((4, 2), ord("A"), np.uint8)
    B = np.full((4, 2), ord("A"), np.uint8)
    LB = np.zeros(5, np.int64)
    RB = np.full(5, 4, np.int64)
    Y.yama_numpy(A, B, LB, RB)  # ok
    bad = LB.copy()
    bad[0] = 1
    with pytest.raises(Y.YamaError):
        Y.yama_numpy(A, B, bad, RB)


def test_native_yama_matches_python():
    """mzcore.yama_into (C++ host DP) is bit-identical to the pure-NumPy
    oracle across random banded problems."""
    import multiz_tpu.yama as Y
    from multiz_tpu.ops.synth import synth_jobs

    if Y._mzcore is None or not hasattr(Y._mzcore, "yama_into"):
        pytest.skip("native runtime unavailable")
    native = Y._mzcore
    jobs = synth_jobs(24, m_lo=10, m_hi=200, k_lo=1, k_hi=5, radius=12,
                      seed=8)
    try:
        for A, B, LB, RB in jobs:
            got = Y.yama_numpy(A, B, LB, RB)
            Y._mzcore = None
            want = Y.yama_numpy(A, B, LB, RB)
            Y._mzcore = native
            assert got.shape == want.shape and (got == want).all()
    finally:
        Y._mzcore = native
