"""Band-local Pallas TPU kernel for the yama DP.

The full-row JAX scan (`yama_jax.py`) wastes ~94% of its lanes: a DP row
is n_pad lanes wide while the radius-30 band is ~65 columns, and every
row costs one XLA while-loop step of fixed overhead. This kernel runs
the row loop INSIDE one Mosaic kernel on band-local Wb-lane vectors, so
a row costs a few hundred VPU instructions instead of an XLA loop step.

Design notes (Mosaic constraints shaped all of this):
  * Dynamic-offset vector loads/stores on the lane dimension must be
    128-aligned, so the classic "dp array in absolute columns + window
    load at LB[r]" does not lower. Instead the dp state lives in
    REGISTERS in band-local coordinates: lane j of the state holds the
    previous row's value at column LB[r]-1+j. Realignment between rows
    is a dynamic lane rotate (pltpu.roll supports dynamic shifts) plus a
    MININT fill of the lanes rotated in from beyond the old window —
    exact, because the previous row never wrote those columns (band
    width <= Wb-1 and RB monotone, mz_yama.c:58-71).
  * The row chunk is a statically unrolled Python loop, so every
    sublane index (prep window reads, flag stores) is static.
  * State is spilled to an (8, Wb) VMEM scratch only at chunk
    boundaries (static offsets), and carried across the row-chunk grid
    dimension.
  * Everything that is a per-(row, band-lane) function of the inputs —
    gap corrections folded with their gating, substitution windows,
    band masks, I-chain prefix increments — is precomputed OUTSIDE the
    kernel by one vectorized XLA gather pass (`_precompute`) and
    streamed in as (ROW_CHUNK, Wb) blocks.
  * The in-row I chain uses the same prefix-max transform as
    yama_jax.py, evaluated with log2(Wb) dynamic rotates; prefix sums
    and maxes are shift-invariant within the window so the result is
    bit-identical to the absolute-column formulation.

Lane mapping: cell at column c of row r sits at lane c - LB[r] + 1;
lane 0 is the diagonal-only column LB[r]-1. The diagonal read of
mz_yama.c:101-106 (kill when LB[r]==LB[r-1]) masks lane 0 after
realignment. Bit-identical to `yama_numpy` / `yama_jax` (same integer
arithmetic, same C>=D>I tie-breaking, mz_yama.c:138-154).
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
from .yama_jax import NEG_HUGE, _pad_to, stack_jobs, STACK_KEYS

ROW_CHUNK = 32  # rows per grid step (statically unrolled)

# Set True to run the kernel in the Pallas interpreter (CPU testing).
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Precompute: per-(row, band-lane) correction/mask windows, one XLA gather
# ---------------------------------------------------------------------------


def _precompute(histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L,
                ss_cat, go, ge, m_pad, n_pad, Wb):
    """Build the kernel operands for ONE problem (vmapped by caller).

    Returns dict of (m_pad+1, Wb) int32 windows + row-0 dp window +
    scalars. Row index r in [1, m_pad]; window lane j maps to absolute
    column cw = LB[r] + j - 1 (lane 0 is the diagonal-only column)."""
    rows = jnp.arange(m_pad + 1, dtype=jnp.int32)  # row 0 unused
    js = jnp.arange(Wb, dtype=jnp.int32)
    lb = LB
    lbm1 = jnp.concatenate([LB[:1], LB[:-1]])
    lbm2 = jnp.concatenate([LB[:1], LB[:1], LB[:-2]])
    rb = RB
    cw = lb[:, None] + js[None, :] - 1  # (m_pad+1, Wb) absolute columns

    def bwin(arr):
        """arr[(cw)] with out-of-range reading 0 (arrays are 0-padded)."""
        idx = jnp.clip(cw, 0, arr.shape[0] - 1)
        return jnp.take(arr, idx, axis=0)

    b0w = bwin(b0)
    b1w = bwin(b1)
    pb0 = bwin(pb[:, 0])
    pb1 = bwin(pb[:, 1])
    pb2 = bwin(pb[:, 2])
    pb3 = bwin(pb[:, 3])
    sub_right = histB.astype(jnp.int32) @ ss_cat.T  # (n_pad+1, 6)
    subw = jnp.einsum(
        "rwc,rc->rw", bwin(sub_right), histA.astype(jnp.int32)
    )

    a0r = a0[:, None]
    a1r = a1[:, None]
    pa0, pa1, pa2, pa3 = (pa[:, i][:, None] for i in range(4))
    not1 = (rows > 1)[:, None]
    inner = (cw > 0) & (cw < N)
    in_band = (cw >= lb[:, None]) & (cw <= rb[:, None])
    row_valid = (rows >= 1)[:, None] & (rows <= M)[:, None]
    last_row = (rows == M)[:, None]

    # ---- D node: fold gating + the -a0*L*ge term into each candidate ----
    eD = a0r * L * ge
    xD = jnp.where(inner & (cw > lbm2[:, None]) & not1,
                   go * (pa0 * b0w + pa2 * L), 0) + eD
    yD = jnp.where(inner & not1, go * pa2 * L, 0) + eD
    zD = jnp.where(inner & (cw > lbm1[:, None]),
                   go * a0r * L, 0) + eD

    # ---- C node: fold gating and +sub into each candidate ----
    gt1 = cw > 1
    xC = jnp.where(gt1 & (cw > lbm2[:, None] + 1) & not1,
                   go * (pa0 * pb1 + pa1 * (pb0 + pb2)
                         + pa2 * (pb1 + pb3) + pa3 * pb2), 0) - subw
    yC = jnp.where(gt1 & not1,
                   go * (pa1 * b0w + pa2 * b1w + pa3 * b0w), 0) - subw
    zC = jnp.where(gt1 & (cw > lbm1[:, None] + 1),
                   go * (a0r * (pb1 + pb3) + a1r * pb2), 0) - subw

    # ---- I node ----
    live = ~last_row
    xI = jnp.where(live & (cw > lbm1[:, None] + 1),
                   go * (a0r * (pb0 + pb2) + a1r * pb2), 0)
    yI = jnp.where(live, go * K * b0w, 0)
    zI = jnp.where(live, go * K * pb2, 0)
    e_w = b0w * K * ge
    chain = (cw >= lb[:, None] + 1) & (cw <= rb[:, None])
    szw = jnp.where(chain, jnp.where(cw > lb[:, None] + 1, zI, 0) + e_w, 0)

    maskD = in_band & row_valid
    maskC = maskD & (cw > lbm1[:, None])
    maskI = maskD & (cw > lb[:, None])
    # cells at or left of column lb never seed the I chain
    ichain0 = cw <= lb[:, None]

    z = jnp.zeros_like
    prep = {
        "xD": xD, "yD": yD, "zD": zD,
        "xC": xC, "yC": yC, "zC": zC,
        "xI": xI, "yI": yI, "szw": szw, "e": e_w,
        "maskD": maskD.astype(jnp.int32),
        "maskC": maskC.astype(jnp.int32),
        "maskI": maskI.astype(jnp.int32),
        "ichain0": ichain0.astype(jnp.int32),
    }
    # neutralize row 0 entries (never used; keeps padding harmless)
    prep = {k: jnp.where((rows >= 1)[:, None], v, z(v)) for k, v in prep.items()}

    # ---- row-0 dp window (mz_yama.c:82-94): lane j = column j-1 ----
    cols = js - 1
    dp0C = jnp.where(cols == 0, 0, MININT).astype(jnp.int32)
    chain0 = (cols >= 1) & (cols <= RB[0])
    b0w0 = jnp.take(b0, jnp.clip(cols, 0, n_pad), axis=0)
    i0 = -jnp.cumsum(jnp.where(chain0, b0w0, 0)) * K * ge
    dp0I = jnp.where(chain0, i0, jnp.where(cols == 0, 0, MININT)).astype(
        jnp.int32
    )
    dp0 = jnp.stack([dp0C, dp0C, dp0I] + [dp0C] * 5, axis=0)  # (8, Wb)

    f0 = jnp.where(
        chain0, jnp.int32(FLAG_I << 4), 0
    ).astype(jnp.int32)

    kill = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (LB[1:] == LB[:-1]).astype(jnp.int32)]
    )
    return prep, dp0, f0, LB.astype(jnp.int32), kill


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

PREP_KEYS = (
    "xD", "yD", "zD", "xC", "yC", "zC", "xI", "yI", "szw", "e",
    "maskD", "maskC", "maskI", "ichain0",
)


def _log2_steps(w: int):
    s, out = 1, []
    while s < w:
        out.append(s)
        s *= 2
    return out


def _kernel(lb_ref, kill_ref, mn_ref, dp0_ref, f0_ref, *refs, Wb):
    prep_refs = refs[: len(PREP_KEYS)]
    flags_ref, last_ref = refs[len(PREP_KEYS) : len(PREP_KEYS) + 2]
    st_ref = refs[len(PREP_KEYS) + 2]  # scratch (8, Wb): C/D/I carry

    rc = pl.program_id(1)
    nrc = pl.num_programs(1)
    js2 = lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    minint = jnp.int32(MININT)
    neg_huge = jnp.int32(int(NEG_HUGE))
    mp1 = lb_ref.shape[-1]

    @pl.when(rc == 0)
    def _init():
        st_ref[0:3, :] = dp0_ref[0, 0:3, :]
        flags_ref[0, 0:1, :] = f0_ref[0]

    M = mn_ref[0, 0, 0]
    N = mn_ref[0, 0, 1]

    def shift1(v, fill):
        r = pltpu.roll(v, 1, 1)
        return jnp.where(js2 == 0, fill, r)

    def prefix_sum(v):
        for s in _log2_steps(Wb):
            v = v + jnp.where(js2 >= s, pltpu.roll(v, s, 1), 0)
        return v

    def prefix_max(v):
        for s in _log2_steps(Wb):
            v = jnp.maximum(v, jnp.where(js2 >= s, pltpu.roll(v, s, 1),
                                         minint))
        return v

    sC = st_ref[0:1, :]
    sD = st_ref[1:2, :]
    sI = st_ref[2:3, :]

    for i in range(ROW_CHUNK):
        row = rc * ROW_CHUNK + i
        rowc = jnp.minimum(row, mp1 - 1)
        row_ok = (row >= 1) & (row <= M)
        lb = lb_ref[0, 0, rowc]
        lbp = lb_ref[0, 0, jnp.maximum(rowc - 1, 0)]
        kill = kill_ref[0, 0, rowc]

        # ---- realign state from window LB[row-1]-1 to LB[row]-1 ----
        d = lb - lbp
        shift = jnp.remainder(Wb - d, Wb)
        stale = js2 >= Wb - d  # columns the previous row never wrote
        upC = jnp.where(stale, minint, pltpu.roll(sC, shift, 1))
        upD = jnp.where(stale, minint, pltpu.roll(sD, shift, 1))
        upI = jnp.where(stale, minint, pltpu.roll(sI, shift, 1))

        diag_kill = (js2 == 0) & (kill == 1)
        dgC = jnp.where(diag_kill, minint, upC)
        dgD = jnp.where(diag_kill, minint, upD)
        dgI = jnp.where(diag_kill, minint, upI)
        diagC = shift1(dgC, minint)
        diagD = shift1(dgD, minint)
        diagI = shift1(dgI, minint)

        def P(k, i=i):
            return prep_refs[PREP_KEYS.index(k)][0, i : i + 1, :]

        # D node
        xs_ = upC - P("xD")
        ys_ = upD - P("yD")
        zs_ = upI - P("zD")
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        D_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_))
        flag_d = jnp.where(pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I))
        D_row = jnp.where(P("maskD") != 0, D_new, minint)

        # C node
        xs_ = diagC - P("xC")
        ys_ = diagD - P("yC")
        zs_ = diagI - P("zC")
        pickC = (xs_ >= ys_) & (xs_ >= zs_)
        pickD = (~pickC) & (ys_ > zs_)
        C_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_))
        flag_c = jnp.where(pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I))
        mc = P("maskC") != 0
        C_row = jnp.where(mc, C_new, minint)
        flag_c = jnp.where(mc, flag_c, 0)

        # I node: prefix-max chain
        e = P("e")
        ic0 = P("ichain0") != 0
        xv = shift1(C_row, minint) - P("xI")
        yv = shift1(D_row, minint) - P("yI")
        Pofs = prefix_sum(P("szw"))
        from_y = xv < yv
        xy = jnp.maximum(xv, yv)
        V = xy - e + Pofs
        Vp = jnp.where(ic0, minint, V)
        R = prefix_max(Vp)
        Wprev = shift1(R, neg_huge)
        zwin = (Wprev > V) | ((Wprev == V) & from_y)
        I_chain = R - Pofs
        flag_i = jnp.where(
            ic0, 0,
            jnp.where(zwin, FLAG_I, jnp.where(~from_y, FLAG_C, FLAG_D)),
        )
        I_row = jnp.where(P("maskI") != 0, I_chain, minint)

        md = P("maskD") != 0
        frow = jnp.where(md, flag_c | (flag_d << 2) | (flag_i << 4), 0)

        @pl.when(row_ok)
        def _(frow=frow, i=i):
            flags_ref[0, i : i + 1, :] = frow

        @pl.when((~row_ok) & (row >= 1))
        def _(i=i):
            flags_ref[0, i : i + 1, :] = jnp.zeros((1, Wb), jnp.int32)

        # freeze the state on inactive rows (register carry)
        sC = jnp.where(row_ok, C_row, sC)
        sD = jnp.where(row_ok, D_row, sD)
        sI = jnp.where(row_ok, I_row, sI)

    st_ref[0:1, :] = sC
    st_ref[1:2, :] = sD
    st_ref[2:3, :] = sI

    @pl.when(rc == nrc - 1)
    def _final():
        # state window of row M starts at column LB[M]-1
        lbM = lb_ref[0, 0, jnp.minimum(M, mp1 - 1)]
        sel = js2 == (N - lbM + 1)
        last_ref[0, 0:1, 0:1] = jnp.sum(
            jnp.where(sel, sC, 0), axis=1, keepdims=True
        )
        last_ref[0, 0:1, 1:2] = jnp.sum(
            jnp.where(sel, sD, 0), axis=1, keepdims=True
        )
        last_ref[0, 0:1, 2:3] = jnp.sum(
            jnp.where(sel, sI, 0), axis=1, keepdims=True
        )


def _pallas_dp(prep, dp0, f0, LBp, kill, M, N, m_pad, n_pad, Wb):
    """Batched band DP via pallas_call over a (B, row-chunks) grid.

    All operands carry a leading batch dim B; the state scratch persists
    across the row-chunk grid dim and is re-initialized at rc==0."""
    B = dp0.shape[0]
    mp1 = m_pad + 1
    nrc = pl.cdiv(mp1, ROW_CHUNK)
    mp_pad = nrc * ROW_CHUNK

    grid = (B, nrc)
    smem = lambda last_dim: pl.BlockSpec(  # noqa: E731
        (1, 1, last_dim), lambda b, rc: (b, 0, 0),
        memory_space=pltpu.SMEM,
    )
    in_specs = [
        smem(mp1),  # lb
        smem(mp1),  # kill
        smem(2),  # mn
        pl.BlockSpec((1, 8, Wb), lambda b, rc: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # dp0
        pl.BlockSpec((1, 1, Wb), lambda b, rc: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # f0
    ] + [
        pl.BlockSpec((1, ROW_CHUNK, Wb), lambda b, rc: (b, rc, 0),
                     memory_space=pltpu.VMEM)
        for _ in PREP_KEYS
    ]
    out_specs = [
        pl.BlockSpec((1, ROW_CHUNK, Wb), lambda b, rc: (b, rc, 0),
                     memory_space=pltpu.VMEM),  # flags
        pl.BlockSpec((1, 1, 8), lambda b, rc: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # last
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, mp_pad, Wb), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
    ]
    prep_pad = {
        k: jnp.zeros((B, mp_pad, Wb), jnp.int32).at[:, :mp1].set(v)
        for k, v in prep.items()
    }
    mn = jnp.stack([M, N], axis=-1).astype(jnp.int32)[:, None, :]
    flags, last = pl.pallas_call(
        functools.partial(_kernel, Wb=Wb),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((8, Wb), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(
        LBp[:, None, :], kill[:, None, :], mn, dp0, f0[:, None, :],
        *[prep_pad[k] for k in PREP_KEYS],
    )
    return flags[:, :mp1], last[:, 0]


def _traceback_band(flags, LB, RB, M, N, lastC, lastD, lastI,
                    m_pad, n_pad, Wb):
    """Band-local traceback: flags[row, col - LB[row] + 1]
    (mz_yama.c:257-291)."""
    SELECT_CID = 3
    node0 = jnp.where(
        (lastC >= lastD) & (lastC >= lastI), jnp.int32(FLAG_C),
        jnp.where(lastD >= lastI, jnp.int32(FLAG_D), jnp.int32(FLAG_I)),
    )

    def step(carry, _):
        row, col, node, k = carry
        done = (row <= 0) & (col <= 0)
        j = col - LB[row] + 1
        inb = (j >= 1) & (col <= RB[row]) & (j < Wb)
        jc = jnp.clip(j, 0, Wb - 1)
        st = jnp.where(inb, flags[row, jc], 0)
        out = jnp.where(done, jnp.int32(-1), node)
        is_i = node == FLAG_I
        is_d = node == FLAG_D
        nrow = jnp.where(is_i, row, row - 1)
        ncol = jnp.where(is_d, col, col - 1)
        nnode = jnp.where(
            is_i, st >> 4,
            jnp.where(is_d, (st >> 2) & SELECT_CID, st & SELECT_CID),
        )
        return (
            jnp.where(done, row, nrow), jnp.where(done, col, ncol),
            jnp.where(done, node, nnode), jnp.where(done, k, k + 1),
        ), out

    (_, _, _, k), ops = lax.scan(
        step, (M, N, node0, jnp.int32(0)), None, length=m_pad + n_pad
    )
    script = jnp.where(ops < 0, jnp.uint8(255), ops.astype(jnp.uint8))
    return script, k


@functools.partial(
    jax.jit, static_argnames=("go", "ge", "m_pad", "n_pad", "Wb")
)
def _pallas_device_batch(stacked_tuple, ss_cat, go, ge, m_pad, n_pad, Wb):
    (histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L) = (
        stacked_tuple
    )

    prep, dp0, f0, LBp, kill = jax.vmap(
        lambda *args: _precompute(*args, ss_cat, go, ge, m_pad, n_pad, Wb)
    )(histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L)

    flags, last = _pallas_dp(
        prep, dp0, f0, LBp, kill, M, N, m_pad, n_pad, Wb
    )
    return jax.vmap(
        lambda fl, lb, rb, m, n, la: _traceback_band(
            fl, lb, rb, m, n, la[0], la[1], la[2], m_pad, n_pad, Wb
        )
    )(flags, LB, RB, M, N, last)


def yama_batch_pallas(jobs, sp: sc.ScoreParams | None = None):
    """yama_batch drop-in using the Pallas band-local kernel."""
    from ..yama import YamaError, _mzcore, _replay

    if sp is None:
        sp = sc.current
    go, ge = int(sp.gap_open), int(sp.gap_extend)
    ss_cat = jnp.asarray(sp.ss_cat)
    buckets = {}
    for idx, (A, B, LB, RB) in enumerate(jobs):
        M, K = A.shape
        N, L = B.shape
        LBa = np.asarray(LB, dtype=np.int64)
        RBa = np.asarray(RB, dtype=np.int64)
        _check_band(LBa, RBa, M, N)
        width = int(np.max(RBa[: M + 1] - LBa[: M + 1])) + 1
        # +1: lane 0 is the diagonal-only column LB[r]-1
        key = (_pad_to(M), _pad_to(N), _round_up(width + 1, 128))
        buckets.setdefault(key, []).append(idx)
    results = [None] * len(jobs)
    for (m_pad, n_pad, Wb), idxs in buckets.items():
        stacked = stack_jobs([jobs[i] for i in idxs], m_pad, n_pad)
        scripts, nedits = _pallas_device_batch(
            tuple(stacked[k] for k in STACK_KEYS), ss_cat,
            go=go, ge=ge, m_pad=m_pad, n_pad=n_pad, Wb=Wb,
        )
        scripts_np = np.asarray(scripts)
        nedits_np = np.asarray(nedits)
        for slot, idx in enumerate(idxs):
            A, B, _, _ = jobs[idx]
            ne = int(nedits_np[slot])
            if _mzcore is not None:
                M, K = A.shape
                N, L = B.shape
                merged = np.empty((ne, K + L), dtype=np.uint8)
                try:
                    _mzcore.replay_into(
                        scripts_np[slot], ne, True,
                        np.ascontiguousarray(A), M, K,
                        np.ascontiguousarray(B), N, L, merged,
                    )
                except ValueError as e:
                    raise YamaError(str(e))
                results[idx] = merged
            else:
                script = scripts_np[slot][:ne][::-1].copy()
                results[idx] = _replay(script, A, B)
    return results
