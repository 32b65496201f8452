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
