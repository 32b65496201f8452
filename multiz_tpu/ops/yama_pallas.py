"""Band-local Pallas TPU kernel for the yama DP.

The full-row JAX scan (`yama_jax.py`) wastes ~94% of its lanes: a DP row
is n_pad lanes wide while the radius-30 band is ~65 columns. This kernel
keeps the band-local formulation but fixes what made it slow under XLA
(per-step dynamic gathers): the dp state lives in a persistent VMEM
scratch in *absolute* column coordinates, so the per-row window
realignment is a VMEM load at a dynamic lane offset — a local address
computation, not an HBM gather.

Work split (the TPU-idiomatic one):
  * Everything that is a per-(row, band-lane) *function of the inputs* —
    quasi-natural gap corrections folded with their band/row gating, the
    substitution windows, the band masks, the I-chain prefix increments —
    is precomputed OUTSIDE the kernel by one fully-vectorized XLA gather
    pass over the column statistics (`_precompute`). XLA is excellent at
    this; it was only the *sequential* gathers that were pathological.
  * The kernel body does just the irreducibly sequential part: per row,
    three dynamic-offset VMEM window loads, three 3-way maxes with exact
    C>=D>I tie-breaking (mz_yama.c:138-154), a log-step prefix-max for
    the in-row I chain, flag packing, and the masked store back.

dp scratch layout: lane c+1 holds absolute dp column c (lane 0 is the
permanently-MININT "column -1"), so the diagonal window of row r is the
load at lane offset LB[r] and the vertical window at LB[r]+1. Stale
cells outside a row's stored window are exactly the cells the reference
never wrote either (band monotonicity, mz_yama.c:58-71); the single
exception — the diagonal read at col LB[r]-1 when LB[r]==LB[r-1] — is
killed at load time (`kill` flag), mirroring mz_yama.c:101-106.

Bit-identical to `yama_numpy` / `yama_jax` (same integer arithmetic,
same tie-breaking); traceback reuses the band-local flag walk.
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

ROW_CHUNK = 8  # rows per grid step (pipeline granularity)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Precompute: per-(row, band-lane) correction/mask windows, one XLA gather
# ---------------------------------------------------------------------------


def _precompute(histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L,
                ss_cat, go, ge, m_pad, n_pad, Wb):
    """Build the kernel operands for ONE problem (vmapped by caller).

    Returns dict of (m_pad+1, Wb) int32 windows + row-0 dp init + scalars.
    Row index r in [1, m_pad]; window lane j maps to absolute column
    cw = LB[r] + j.
    """
    rows = jnp.arange(m_pad + 1, dtype=jnp.int32)  # row 0 unused
    js = jnp.arange(Wb, dtype=jnp.int32)
    lb = LB
    lbm1 = jnp.concatenate([LB[:1], LB[:-1]])
    lbm2 = jnp.concatenate([LB[:1], LB[:1], LB[:-2]])
    rb = RB
    cw = lb[:, None] + js[None, :]  # (m_pad+1, Wb) absolute columns

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
    chain = (js[None, :] >= 1) & (cw <= rb[:, None])
    szw = jnp.where(chain, jnp.where(js[None, :] > 1, zI, 0) + e_w, 0)

    maskD = in_band & row_valid
    maskC = maskD & (cw > lbm1[:, None])
    maskI = maskD & (js[None, :] > 0)

    z = jnp.zeros_like
    prep = {
        "xD": xD, "yD": yD, "zD": zD,
        "xC": xC, "yC": yC, "zC": zC,
        "xI": xI, "yI": yI, "szw": szw, "e": e_w,
        "maskD": maskD.astype(jnp.int32),
        "maskC": maskC.astype(jnp.int32),
        "maskI": maskI.astype(jnp.int32),
    }
    # neutralize row 0 entries (never used; keeps padding harmless)
    prep = {k: jnp.where((rows >= 1)[:, None], v, z(v)) for k, v in prep.items()}

    # ---- row-0 dp init in absolute coordinates (mz_yama.c:82-94) ----
    npadl = _round_up(n_pad + 2, 128)
    cols = jnp.arange(npadl, dtype=jnp.int32) - 1  # lane c+1 = column c
    dp0C = jnp.where(cols == 0, 0, MININT).astype(jnp.int32)
    chain0 = (cols >= 1) & (cols <= RB[0])
    b0_pad = jnp.zeros(npadl, jnp.int32).at[1 : n_pad + 2].set(b0)
    i0 = -jnp.cumsum(jnp.where(chain0, b0_pad, 0)) * K * ge
    dp0I = jnp.where(chain0, i0, jnp.where(cols == 0, 0, MININT)).astype(
        jnp.int32
    )
    dp0 = jnp.stack([dp0C, dp0C, dp0I] + [dp0C] * 5, axis=0)  # (8, npadl)

    f0 = jnp.where(
        (js >= 1) & (js <= RB[0]), jnp.int32(FLAG_I << 4), 0
    ).astype(jnp.int32)

    kill = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (LB[1:] == LB[:-1]).astype(jnp.int32)]
    )
    return prep, dp0, f0, LB.astype(jnp.int32), kill, M, N


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

PREP_KEYS = (
    "xD", "yD", "zD", "xC", "yC", "zC", "xI", "yI", "szw", "e",
    "maskD", "maskC", "maskI",
)


def _log2_steps(w: int):
    s, out = 1, []
    while s < w:
        out.append(s)
        s *= 2
    return out


def _kernel(lb_ref, kill_ref, mn_ref, dp0_ref, f0_ref, *refs,
            m_pad, n_pad, Wb, npadl):
    prep_refs = refs[: len(PREP_KEYS)]
    flags_ref, last_ref = refs[len(PREP_KEYS) :][-2:]
    dp_ref = refs[len(PREP_KEYS)]  # scratch (8, npadl)

    rc = pl.program_id(1)
    nrc = pl.num_programs(1)
    js2 = lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    minint = jnp.int32(MININT)

    @pl.when(rc == 0)
    def _init():
        dp_ref[:, :] = dp0_ref[0]
        flags_ref[0, 0, :] = jnp.where(
            lax.broadcasted_iota(jnp.int32, (Wb,), 0) < Wb, f0_ref[0, 0], 0
        )

    M = mn_ref[0, 0]
    N = mn_ref[0, 1]

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

    def row_body(i, _):
        r = rc * ROW_CHUNK + i  # absolute dp row - 0 means row index r
        row = r  # rows 0.. ; row 0 handled by init, chunk0 row0 skipped

        @pl.when((row >= 1) & (row <= M))
        def _():
            lb = lb_ref[0, row]
            kill = kill_ref[0, row]
            upC = dp_ref[0:1, pl.ds(lb + 1, Wb)]
            upD = dp_ref[1:2, pl.ds(lb + 1, Wb)]
            upI = dp_ref[2:3, pl.ds(lb + 1, Wb)]
            diagC = dp_ref[0:1, pl.ds(lb, Wb)]
            diagD = dp_ref[1:2, pl.ds(lb, Wb)]
            diagI = dp_ref[2:3, pl.ds(lb, Wb)]
            killmask = (js2 == 0) & (kill == 1)
            diagC2 = jnp.where(killmask, minint, diagC)
            diagD2 = jnp.where(killmask, minint, diagD)
            diagI2 = jnp.where(killmask, minint, diagI)

            def P(k):
                return prep_refs[PREP_KEYS.index(k)][0, i, :][None, :]

            # D node
            xs_ = upC - P("xD")
            ys_ = upD - P("yD")
            zs_ = upI - P("zD")
            pickC = (xs_ >= ys_) & (xs_ >= zs_)
            pickD = (~pickC) & (ys_ > zs_)
            D_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_))
            flag_d = jnp.where(
                pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I)
            )
            D_row = jnp.where(P("maskD") != 0, D_new, minint)

            # C node
            xs_ = diagC2 - P("xC")
            ys_ = diagD2 - P("yC")
            zs_ = diagI2 - P("zC")
            pickC = (xs_ >= ys_) & (xs_ >= zs_)
            pickD = (~pickC) & (ys_ > zs_)
            C_new = jnp.where(pickC, xs_, jnp.where(pickD, ys_, zs_))
            flag_c = jnp.where(
                pickC, FLAG_C, jnp.where(pickD, FLAG_D, FLAG_I)
            )
            mc = P("maskC") != 0
            C_row = jnp.where(mc, C_new, minint)
            flag_c = jnp.where(mc, flag_c, 0)

            # I node: prefix-max chain
            e = P("e")
            xv = shift1(C_row, minint) - P("xI")
            yv = shift1(D_row, minint) - P("yI")
            Pofs = prefix_sum(P("szw"))
            from_y = xv < yv
            xy = jnp.maximum(xv, yv)
            V = xy - e + Pofs
            Vp = jnp.where(js2 == 0, minint, V)
            R = prefix_max(Vp)
            Wprev = shift1(R, NEG_HUGE)
            zwin = (Wprev > V) | ((Wprev == V) & from_y)
            I_chain = R - Pofs
            flag_i = jnp.where(
                js2 == 0, 0,
                jnp.where(zwin, FLAG_I,
                          jnp.where(~from_y, FLAG_C, FLAG_D)),
            )
            I_row = jnp.where(P("maskI") != 0, I_chain, minint)

            md = P("maskD") != 0
            frow = jnp.where(
                md, flag_c | (flag_d << 2) | (flag_i << 4), 0
            )
            flags_ref[0, i, :] = frow[0]

            dp_ref[0:1, pl.ds(lb + 1, Wb)] = C_row
            dp_ref[1:2, pl.ds(lb + 1, Wb)] = D_row
            dp_ref[2:3, pl.ds(lb + 1, Wb)] = I_row

        @pl.when((row > M) | ((row == 0) & (rc != 0)))
        def _zero():
            flags_ref[0, i, :] = jnp.zeros((Wb,), jnp.int32)

        return 0

    lax.fori_loop(0, ROW_CHUNK, row_body, 0)

    @pl.when(rc == nrc - 1)
    def _final():
        last_ref[0, 0] = dp_ref[0, N + 1]
        last_ref[0, 1] = dp_ref[1, N + 1]
        last_ref[0, 2] = dp_ref[2, N + 1]


def _pallas_dp(prep, dp0, f0, LBp, kill, M, N, m_pad, n_pad, Wb):
    """One-problem band DP via pallas_call over (1, row-chunks) grid.
    Batched by the caller with jax.vmap over the leading axis."""
    npadl = dp0.shape[-1]
    mp1 = m_pad + 1
    nrc = pl.cdiv(mp1, ROW_CHUNK)

    grid = (1, nrc)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, rc: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    in_specs = [
        smem((1, mp1)),  # lb
        smem((1, mp1)),  # kill
        smem((1, 2)),  # mn
        pl.BlockSpec((8, npadl), lambda b, rc: (0, 0),
                     memory_space=pltpu.VMEM),  # dp0
        pl.BlockSpec((1, 1, Wb), lambda b, rc: (0, 0, 0),
                     memory_space=pltpu.VMEM),  # f0
    ] + [
        pl.BlockSpec((1, ROW_CHUNK, Wb), lambda b, rc: (0, rc, 0),
                     memory_space=pltpu.VMEM)
        for _ in PREP_KEYS
    ]
    out_specs = [
        pl.BlockSpec((1, ROW_CHUNK, Wb), lambda b, rc: (0, rc, 0),
                     memory_space=pltpu.VMEM),  # flags
        pl.BlockSpec((1, 8), lambda b, rc: (0, 0),
                     memory_space=pltpu.VMEM),  # last
    ]
    mp_pad = nrc * ROW_CHUNK
    out_shapes = [
        jax.ShapeDtypeStruct((1, mp_pad, Wb), jnp.int32),
        jax.ShapeDtypeStruct((1, 8), jnp.int32),
    ]
    prep_pad = {
        k: jnp.zeros((1, mp_pad, Wb), jnp.int32).at[0, :mp1].set(v)
        for k, v in prep.items()
    }
    mn = jnp.stack([M, N]).astype(jnp.int32)[None, :]
    flags, last = pl.pallas_call(
        functools.partial(
            _kernel, m_pad=m_pad, n_pad=n_pad, Wb=Wb, npadl=npadl
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((8, npadl), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        LBp[None, :], kill[None, :], mn, dp0, f0[None, None, :],
        *[prep_pad[k] for k in PREP_KEYS],
    )
    return flags[0, :mp1], last[0]


def _traceback_band(flags, LB, RB, M, N, lastC, lastD, lastI,
                    m_pad, n_pad, Wb):
    """Band-local traceback: flags[row, col - LB[row]] (mz_yama.c:257-291)."""
    SELECT_CID = 3
    node0 = jnp.where(
        (lastC >= lastD) & (lastC >= lastI), jnp.int32(FLAG_C),
        jnp.where(lastD >= lastI, jnp.int32(FLAG_D), jnp.int32(FLAG_I)),
    )

    def step(carry, _):
        row, col, node, k = carry
        done = (row <= 0) & (col <= 0)
        j = col - LB[row]
        inb = (j >= 0) & (col <= RB[row]) & (j < Wb)
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

    def one(*args):
        prep, dp0, f0, LBp, kill, m, n = _precompute(
            *args, ss_cat, go, ge, m_pad, n_pad, Wb
        )
        flags, last = _pallas_dp(
            prep, dp0, f0, LBp, kill, m, n, m_pad, n_pad, Wb
        )
        lb, rb = args[8], args[9]
        return _traceback_band(
            flags, lb, rb, m, n, last[0], last[1], last[2],
            m_pad, n_pad, Wb,
        )

    return jax.vmap(one)(
        histA, a0, a1, pa, histB, b0, b1, pb, LB, RB, M, N, K, L
    )


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
        key = (_pad_to(M), _pad_to(N), _round_up(width, 128))
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
