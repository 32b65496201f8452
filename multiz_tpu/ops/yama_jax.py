"""Jitted/batched yama DP for TPU execution.

The recurrence (mz_yama.c:97-254) has three per-cell nodes:
  D depends on the previous row, C on the previous row's diagonal, and I on
  the previous column of the same row. Rows are therefore computed as full
  vectors (one ``lax.scan`` step per row); the in-row I chain
  ``I[c] = prefmax(x[c], y[c], I[c-1] - z[c]) - e[c]`` is solved exactly in
  parallel with a prefix-max transform: with P[c] = sum_{lb<k<=c}(z[k]+e[k])
  and V[c] = max_pref(x,y)[c] - e[c] + P[c], W[c] = I[c] + P[c] satisfies
  W[c] = max(V[c], W[c-1]) — a cummax. The C/D/I tie-breaking preference
  (mz_yama.c:138-154) is recovered exactly from (V, W_prev, x<y) in integer
  arithmetic.

All arithmetic is int32, matching the C's ``int``. The chain's P offsets
add at most band_width * (gap_open + gap_extend) * K * L to cell values;
for multiz workloads (local-alignment blocks, N <= ~10^4, K*L <= ~10^2)
that stays around 2^28, far from int32 overflow. (int64 on TPU is emulated
and spills VMEM, so it is deliberately avoided.) Outputs are the packed
traceback flags (uint8) and the final C/D/I scores; traceback runs on host
(or in the native helper).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import scores as sc
from ..yama import (
    FLAG_C,
    FLAG_D,
    FLAG_I,
    MININT,
    ColStats,
    _check_band,
    column_stats,
    traceback,
    _replay,
)

# Sentinel for non-chain cells: below MININT minus any legitimate P-shifted
# value, but well inside int32.
NEG_HUGE = jnp.int32(-(2**30) - (2**29))


def _yama_core(
    histA,  # (m_pad+1, 6) int32
    a0, a1,  # (m_pad+1,) int32 non-dash / dash counts of A columns
    pa,  # (m_pad+1, 4) int32 pair counts
    histB,  # (n_pad+1, 6) int32
    b0, b1,  # (n_pad+1,)
    pb,  # (n_pad+1, 4)
    LB, RB,  # (m_pad+1,) int32
    M, N,  # scalars int32 (actual sizes)
    K, L,  # scalars int32 (row counts; arithmetic only)
    ss_cat,  # (6, 6) int32
    go: int, ge: int, m_pad: int, n_pad: int,
):
    cols = jnp.arange(n_pad + 1, dtype=jnp.int32)

    # ---- row 0 init (mz_yama.c:82-94) ----
    dpC = jnp.full(n_pad + 1, MININT, jnp.int32).at[0].set(0)
    dpD = dpC
    r0 = RB[0]
    chain0 = (cols >= 1) & (cols <= r0)
    i0 = -jnp.cumsum(jnp.where(chain0, b0, 0)) * K * ge
    dpI = jnp.where(chain0, i0, jnp.where(cols == 0, 0, MININT)).astype(
        jnp.int32
    )
    flags0 = jnp.where(chain0, jnp.uint8(FLAG_I << 4), jnp.uint8(0))

    sub_right = histB.astype(jnp.int32) @ ss_cat.T  # (n_pad+1, 6)

    def row_step(carry, xs):
        dpC, dpD, dpI = carry
        (row, lb, lbm1, lbm2, rb, ha, a0r, a1r, par) = xs
        row_valid = row <= M
        in_band = (cols >= lb) & (cols <= rb)
        last_row = row == M

        # ---------- D node ----------
        xs_ = dpC
        ys_ = dpD
        zs_ = dpI
        inner = (cols > 0) & (cols < N)
        not1 = row > 1
        xD = go * (par[0] * b0 + par[2] * L)
        yD = go * par[2] * L
        xs_ = xs_ - jnp.where(inner & (cols > lbm2) & not1, xD, 0)
        ys_ = ys_ - jnp.where(inner & not1, yD, 0)
        zD = go * a0r * L
        zs_ = zs_ - jnp.where(inner & (cols > lbm1), zD, 0)
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        D_new = (
            jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_)) - a0r * L * ge
        )
        flag_d = jnp.where(
            pickC, jnp.uint8(FLAG_C),
            jnp.where(pickD, jnp.uint8(FLAG_D), jnp.uint8(FLAG_I)),
        )
        D_row = jnp.where(in_band, D_new, dpD)

        # ---------- C node ----------
        shiftC = jnp.concatenate([jnp.array([MININT], jnp.int32), dpC[:-1]])
        shiftD = jnp.concatenate([jnp.array([MININT], jnp.int32), dpD[:-1]])
        shiftI = jnp.concatenate([jnp.array([MININT], jnp.int32), dpI[:-1]])
        # at col == lb the diagonal is MININT unless LB[row-1] <= lb-1
        kill = (cols == lb) & (lbm1 > lb - 1)
        xs_ = jnp.where(kill, MININT, shiftC)
        ys_ = jnp.where(kill, MININT, shiftD)
        zs_ = jnp.where(kill, MININT, shiftI)
        gt1 = cols > 1
        xC = go * (
            par[0] * pb[:, 1]
            + par[1] * (pb[:, 0] + pb[:, 2])
            + par[2] * (pb[:, 1] + pb[:, 3])
            + par[3] * pb[:, 2]
        )
        yC = go * (par[1] * b0 + par[2] * b1 + par[3] * b0)
        zC = go * (a0r * (pb[:, 1] + pb[:, 3]) + a1r * pb[:, 2])
        xs_ = xs_ - jnp.where(gt1 & (cols > lbm2 + 1) & not1, xC, 0)
        ys_ = ys_ - jnp.where(gt1 & not1, yC, 0)
        zs_ = zs_ - jnp.where(gt1 & (cols > lbm1 + 1), zC, 0)
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        sub = sub_right @ ha  # (n_pad+1,)
        C_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_)) + sub
        flag_c = jnp.where(
            pickC, jnp.uint8(FLAG_C),
            jnp.where(pickD, jnp.uint8(FLAG_D), jnp.uint8(FLAG_I)),
        )
        reach = cols > lbm1
        C_new = jnp.where(reach, C_new, MININT)
        flag_c = jnp.where(reach, flag_c, jnp.uint8(0))
        C_row = jnp.where(in_band, C_new, dpC)

        # ---------- I node: parallel prefix-max chain ----------
        live = ~last_row
        xI = jnp.where(
            live, go * (a0r * (pb[:, 0] + pb[:, 2]) + a1r * pb[:, 2]), 0
        )
        yI = jnp.where(live, go * K * b0, 0)
        zI = jnp.where(live, go * K * pb[:, 2], 0)
        e = b0 * K * ge
        Cw = jnp.concatenate([jnp.array([MININT], jnp.int32), C_row[:-1]])
        Dw = jnp.concatenate([jnp.array([MININT], jnp.int32), D_row[:-1]])
        xv = Cw - jnp.where(cols > lbm1 + 1, xI, 0)
        yv = Dw - yI
        chain = cols >= lb + 1
        s = jnp.where(cols > lb + 1, zI, 0) + e
        P = jnp.cumsum(jnp.where(chain, s, 0), dtype=jnp.int32)
        from_y = xv < yv
        xy = jnp.maximum(xv, yv)
        V = xy - e + P
        Vp = jnp.where(
            cols == lb, jnp.int32(MININT), jnp.where(chain, V, NEG_HUGE)
        )
        R = lax.cummax(Vp)
        Wprev = jnp.concatenate([jnp.array([NEG_HUGE], jnp.int32), R[:-1]])
        zwin = (Wprev > V) | ((Wprev == V) & from_y)
        I_chain = R - P
        I_new = jnp.where(cols == lb, MININT, I_chain)
        flag_i = jnp.where(
            cols == lb,
            jnp.uint8(0),
            jnp.where(
                zwin, jnp.uint8(FLAG_I),
                jnp.where(~from_y, jnp.uint8(FLAG_C), jnp.uint8(FLAG_D)),
            ),
        )
        I_row = jnp.where(in_band, I_new, dpI)

        frow = jnp.where(
            in_band & row_valid,
            flag_c | (flag_d << 2) | (flag_i << 4),
            jnp.uint8(0),
        )
        dpC2 = jnp.where(row_valid, C_row, dpC)
        dpD2 = jnp.where(row_valid, D_row, dpD)
        dpI2 = jnp.where(row_valid, I_row, dpI)
        return (dpC2, dpD2, dpI2), frow

    rows = jnp.arange(1, m_pad + 1, dtype=jnp.int32)
    lbv = LB[1 : m_pad + 1]
    lbm1v = LB[0:m_pad]
    lbm2v = jnp.concatenate([jnp.zeros(1, jnp.int32), LB[: m_pad - 1]])
    rbv = RB[1 : m_pad + 1]
    xs = (
        rows, lbv, lbm1v, lbm2v, rbv,
        histA[1:], a0[1:], a1[1:], pa[1:],
    )
    (dpC, dpD, dpI), frows = lax.scan(
        row_step, (dpC, dpD, dpI), xs
    )
    flags = jnp.concatenate([flags0[None, :], frows], axis=0)
    lastC = dpC[N]
    lastD = dpD[N]
    lastI = dpI[N]
    return flags, lastC, lastD, lastI


SELECT_CID = 3


def _traceback_core(flags, M, N, lastC, lastD, lastI, m_pad: int, n_pad: int):
    """On-device edit-script extraction (mz_yama.c:257-291).

    Returns (script, nedit): script[k] is the k-th op walking BACKWARD from
    (M, N); entries past nedit are zero. Runs as a fixed-trip scan so it
    vmaps cleanly over a batch."""
    node0 = jnp.where(
        (lastC >= lastD) & (lastC >= lastI),
        jnp.int32(FLAG_C),
        jnp.where(lastD >= lastI, jnp.int32(FLAG_D), jnp.int32(FLAG_I)),
    )

    def step(carry, _):
        row, col, node, k = carry
        done = (row <= 0) & (col <= 0)
        st = flags[row, col].astype(jnp.int32)
        out = jnp.where(done, jnp.int32(-1), node)
        is_i = node == FLAG_I
        is_d = node == FLAG_D
        nrow = jnp.where(is_i, row, row - 1)
        ncol = jnp.where(is_d, col, col - 1)
        nnode = jnp.where(
            is_i, st >> 4,
            jnp.where(is_d, (st >> 2) & SELECT_CID, st & SELECT_CID),
        )
        row2 = jnp.where(done, row, nrow)
        col2 = jnp.where(done, col, ncol)
        node2 = jnp.where(done, node, nnode)
        k2 = jnp.where(done, k, k + 1)
        return (row2, col2, node2, k2), out

    (r, c, n_, k), ops = lax.scan(
        step, (M, N, node0, jnp.int32(0)), None, length=m_pad + n_pad
    )
    script = jnp.where(ops < 0, jnp.uint8(255), ops.astype(jnp.uint8))
    return script, k


@functools.partial(
    jax.jit, static_argnames=("go", "ge", "m_pad", "n_pad")
)
def _yama_device_batch(
    histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L, ss_cat,
    go: int, ge: int, m_pad: int, n_pad: int,
):
    """vmap over a bucket of same-padded-shape problems. Traceback runs on
    device too: only the (m_pad+n_pad)-byte edit scripts travel to host,
    not the O(m_pad*n_pad) flags (critical when the host link is slow)."""

    def fn(*args):
        flags, lc, ld, li = _yama_core(
            *args, ss_cat, go=go, ge=ge, m_pad=m_pad, n_pad=n_pad
        )
        m = args[10]
        n = args[11]
        script, nedit = _traceback_core(
            flags, m, n, lc, ld, li, m_pad=m_pad, n_pad=n_pad
        )
        return script, nedit

    return jax.vmap(fn)(
        histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L
    )


def _prep(X: np.ndarray, pad: int):
    """Pad ColStats arrays of X (ncol, nrow) to pad+1 rows."""
    st = column_stats(X)
    ncol = st.ncol

    def p(arr, width=None):
        shape = list(arr.shape)
        shape[0] = pad + 1
        out = np.zeros(shape, dtype=np.int32)
        out[: ncol + 1] = arr
        return out

    return (
        p(st.hist), p(st.nond), p(st.ndash), p(st.pair), ncol
    )


def _pad_to(n: int) -> int:
    """Pad sizes to limit compilation count: next power of two, >= 16."""
    p = 16
    while p < n:
        p *= 2
    return p


def yama_jax(
    A: np.ndarray,
    B: np.ndarray,
    LB: np.ndarray,
    RB: np.ndarray,
    sp: sc.ScoreParams | None = None,
) -> np.ndarray:
    """Drop-in replacement for yama_numpy using the jitted device kernel."""
    return yama_batch([(A, B, LB, RB)], sp=sp)[0]


def yama_batch(jobs, sp: sc.ScoreParams | None = None):
    """Batched DP over a list of (A, B, LB, RB) problems.

    Problems are bucketed by padded shape and executed as one vmapped
    kernel launch per bucket; tracebacks run on host. Returns merged
    column matrices in input order."""
    if sp is None:
        sp = sc.current
    go, ge = int(sp.gap_open), int(sp.gap_extend)
    ss_cat = jnp.asarray(sp.ss_cat)
    buckets = {}
    for idx, (A, B, LB, RB) in enumerate(jobs):
        M, K = A.shape
        N, L = B.shape
        LB = np.asarray(LB, dtype=np.int64)
        RB = np.asarray(RB, dtype=np.int64)
        _check_band(LB, RB, M, N)
        key = (_pad_to(M), _pad_to(N))
        buckets.setdefault(key, []).append(idx)
    results = [None] * len(jobs)
    for (m_pad, n_pad), idxs in buckets.items():
        arrs = {k: [] for k in (
            "histA", "a0", "a1", "pa", "histB", "b0", "b1", "pb",
            "LB", "RB", "M", "N", "K", "L",
        )}
        for idx in idxs:
            A, B, LB, RB = jobs[idx]
            M, K = A.shape
            N, L = B.shape
            hA, a0_, a1_, pa_, _ = _prep(A, m_pad)
            hB, b0_, b1_, pb_, _ = _prep(B, n_pad)
            LBp = np.zeros(m_pad + 1, dtype=np.int32)
            RBp = np.zeros(m_pad + 1, dtype=np.int32)
            LBp[: M + 1] = LB
            RBp[: M + 1] = RB
            LBp[M + 1 :] = LB[M]
            RBp[M + 1 :] = RB[M]
            arrs["histA"].append(hA)
            arrs["a0"].append(a0_)
            arrs["a1"].append(a1_)
            arrs["pa"].append(pa_)
            arrs["histB"].append(hB)
            arrs["b0"].append(b0_)
            arrs["b1"].append(b1_)
            arrs["pb"].append(pb_)
            arrs["LB"].append(LBp)
            arrs["RB"].append(RBp)
            arrs["M"].append(M)
            arrs["N"].append(N)
            arrs["K"].append(K)
            arrs["L"].append(L)
        stacked = {
            k: jnp.asarray(np.stack(v) if np.ndim(v[0]) else np.asarray(v, np.int32))
            for k, v in arrs.items()
        }
        scripts, nedits = _yama_device_batch(
            stacked["histA"], stacked["a0"], stacked["a1"], stacked["pa"],
            stacked["histB"], stacked["b0"], stacked["b1"], stacked["pb"],
            stacked["LB"], stacked["RB"],
            stacked["M"].astype(jnp.int32), stacked["N"].astype(jnp.int32),
            stacked["K"].astype(jnp.int32), stacked["L"].astype(jnp.int32),
            ss_cat, go=go, ge=ge, m_pad=m_pad, n_pad=n_pad,
        )
        scripts_np = np.asarray(scripts)
        nedits_np = np.asarray(nedits)
        for slot, idx in enumerate(idxs):
            A, B, _, _ = jobs[idx]
            ne = int(nedits_np[slot])
            script = scripts_np[slot][:ne][::-1].copy()
            results[idx] = _replay(script, A, B)
    return results
