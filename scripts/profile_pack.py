"""Stage-by-stage profile of the packed DP path on the bench workload.

Times, per bench iteration: host pack, H2D, prep, DP kernel, traceback,
packing epilogue, D2H, replay. Used to direct optimization (round 3,
VERDICT item 1). Run on the real chip: python scripts/profile_pack.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import functools

from multiz_tpu.ops.synth import band_cells, synth_jobs
from multiz_tpu.ops import yama_pack as yp
from multiz_tpu import scores as sc

N_PROBLEMS = int(os.environ.get("NPROB", "1024"))


def main():
    jobs = synth_jobs(N_PROBLEMS, m_lo=256, m_hi=1024, k_lo=1, k_hi=4,
                      radius=30, seed=42)
    cells = band_cells(jobs)
    print(f"{len(jobs)} jobs, {cells/1e6:.1f}M band cells")

    NPV = yp._np_active()
    sp = sc.current
    go, ge = int(sp.gap_open), int(sp.gap_extend)
    ss_cat = jnp.asarray(sp.ss_cat)

    # ---- bucket exactly like yama_batch_packed ----
    from multiz_tpu.ops.yama_jax import _pad_to
    buckets = {}
    band_d = {}
    for idx, (A, B, LB, RB) in enumerate(jobs):
        M, K = A.shape
        N, L = B.shape
        p = max(_pad_to(M), _pad_to(N))
        key = (p, p, yp._pad8(K), yp._pad8(L))
        buckets.setdefault(key, []).append(idx)
        import numpy as _np
        w = int((_np.asarray(RB)[: M + 1] - _np.asarray(LB)[: M + 1]).max())
        band_d[key] = max(band_d.get(key, 1), w)

    def pack_bucket(key, idxs):
        (m_pad, n_pad, Kp, Lp) = key
        NPv = yp._np_active()
        nb = yp._round_up(len(idxs), NPv)
        run = idxs + [idxs[-1]] * (nb - len(idxs))
        mp1 = m_pad + 1
        Kp2 = -(-Kp // 2)
        Lp2 = -(-Lp // 2)
        oA = 0
        oB = oA + nb * m_pad * Kp2
        oLB = oB + nb * n_pad * Lp2
        oRB = oLB + nb * mp1 * 2
        oS = oRB + nb * mp1 * 2
        buf = np.zeros(oS + nb * 16, np.uint8)
        Atex = buf[oA:oB].reshape(nb, Kp2, m_pad)
        Btex = buf[oB:oLB].reshape(nb, Lp2, n_pad)
        LBp = buf[oLB:oRB].view(np.uint16).reshape(nb, mp1)
        RBp = buf[oRB:oS].view(np.uint16).reshape(nb, mp1)
        MNKL = buf[oS:].view(np.int32).reshape(nb, 4)
        for slot, idx in enumerate(run):
            A, B, LB, RB = jobs[idx]
            M, K = A.shape
            N, L = B.shape
            yp._pack_cat_rows(Atex[slot], A, K, Kp2)
            yp._pack_cat_rows(Btex[slot], B, L, Lp2)
            LBp[slot, : M + 1] = LB[: M + 1]
            RBp[slot, : M + 1] = RB[: M + 1]
            LBp[slot, M + 1:] = LB[M]
            RBp[slot, M + 1:] = RB[M]
            MNKL[slot] = (M, N, K, L)
        return buf, nb

    # stage-split jits -------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("go", "ge", "m_pad",
                       "n_pad", "Kp", "Lp", "B"))
    def prep_only(buf, ss_cat, go, ge, m_pad, n_pad, Kp, Lp, B):
        mp1 = m_pad + 1
        nchunks = -(-mp1 // yp.ROW_CHUNK)
        mp_rows = nchunks * yp.ROW_CHUNK
        npadl = yp._round_up(n_pad + yp.CW + 2, 128)
        G = B // NPV
        Kp2 = -(-Kp // 2)
        Lp2 = -(-Lp // 2)
        oA = 0
        oB = oA + B * m_pad * Kp2
        oLB = oB + B * n_pad * Lp2
        oRB = oLB + B * mp1 * 2
        oS = oRB + B * mp1 * 2
        Atex = buf[oA:oB].reshape(B, Kp2, m_pad)
        Btex = buf[oB:oLB].reshape(B, Lp2, n_pad)
        LB = jax.lax.bitcast_convert_type(
            buf[oLB:oRB].reshape(B, mp1, 2), jnp.uint16).astype(jnp.int32)
        RB = jax.lax.bitcast_convert_type(
            buf[oRB:oS].reshape(B, mp1, 2), jnp.uint16).astype(jnp.int32)
        MNKL = jax.lax.bitcast_convert_type(buf[oS:oS + B * 16].reshape(B, 4, 4), jnp.int32)
        M, N, K, L = MNKL[:, 0], MNKL[:, 1], MNKL[:, 2], MNKL[:, 3]
        prep = jax.vmap(lambda at, btx, lb, rb, m, n, k, l: yp._prep_one(
            at, btx, lb, rb, m, n, k, l, ss_cat, go, ge,
            m_pad, n_pad, Kp, Lp, nchunks, npadl, mp_rows, yp.CW))(
            Atex, Btex, LB, RB, M, N, K, L)
        bst, astream, dp0, f0, W0c = prep
        bst_g = bst.reshape(G, NPV, yp.NBSTAT, npadl)
        astream_g = astream.reshape(G, NPV, nchunks, yp.ROW_CHUNK, yp.ASLOTS).transpose(0, 2, 3, 1, 4)
        dp0_g = dp0.reshape(G, NPV, 3, npadl).transpose(0, 2, 1, 3)
        f0_g = f0.reshape(G, 1, NPV, yp.CW)
        bases_g = W0c.reshape(G, NPV, nchunks).transpose(0, 2, 1)[:, :, None, :]
        mn = jnp.stack([M, N], axis=-1).astype(jnp.int32)[:, None, :]
        return bases_g, bst_g, astream_g, dp0_g, f0_g, W0c, mn

    @functools.partial(jax.jit, static_argnames=("go", "ge", "nchunks",
                       "npadl", "G", "pm_d"))
    def dp_only(bases_g, bst_g, astream_g, dp0_g, f0_g, go, ge, nchunks,
                npadl, G, pm_d):
        return yp._pallas_dp(bases_g, bst_g, astream_g, dp0_g, f0_g,
                             go, ge, nchunks, npadl, G, NPV, pm_d, yp.CW)

    @functools.partial(jax.jit, static_argnames=("mp_rows", "srows", "B"))
    def tb_only(flags, W0c, mn, last, mp_rows, srows, B):
        flags_b = flags.transpose(0, 3, 1, 2, 4).reshape(B, mp_rows, yp.CW)
        last_b = last.reshape(B, 1, 8)
        return yp._pallas_traceback(flags_b, W0c, mn, last_b, mp_rows, srows,
                                    NPV, yp.CW)

    ITERS = int(os.environ.get("ITERS", "5"))
    # warm + measure per bucket
    agg = {}
    packed_bufs = {}
    for key, idxs in sorted(buckets.items()):
        t0 = time.perf_counter()
        buf, nb = pack_bucket(key, idxs)
        t_pack = time.perf_counter() - t0
        packed_bufs[key] = (buf, nb)
        agg.setdefault("pack", 0.0)
        agg["pack"] += t_pack
        print(f"bucket {key} x{len(idxs)} (padded {nb}): pack {t_pack:.4f}s "
              f"buf {buf.nbytes/1e6:.1f}MB")

    def run_stages(measure):
        tot = dict(h2d=0.0, prep=0.0, dp=0.0, tb=0.0, full=0.0)
        for key, idxs in sorted(buckets.items()):
            (m_pad, n_pad, Kp, Lp) = key
            buf, nb = packed_bufs[key]
            mp1 = m_pad + 1
            nchunks = -(-mp1 // yp.ROW_CHUNK)
            mp_rows = nchunks * yp.ROW_CHUNK
            npadl = yp._round_up(n_pad + yp.CW + 2, 128)
            G = nb // NPV
            pm_d = 16
            while pm_d < min(band_d[key], yp.CW):
                pm_d *= 2
            srows = -(-(m_pad + n_pad + 1) // 128)

            t0 = time.perf_counter()
            dbuf = jax.device_put(buf)
            dbuf.block_until_ready()
            t1 = time.perf_counter()
            ops = prep_only(dbuf, ss_cat, go, ge, m_pad, n_pad, Kp, Lp, nb)
            jax.block_until_ready(ops)
            t2 = time.perf_counter()
            bases_g, bst_g, astream_g, dp0_g, f0_g, W0c, mn = ops
            fl = dp_only(bases_g, bst_g, astream_g, dp0_g, f0_g, go, ge,
                         nchunks, npadl, G, pm_d)
            jax.block_until_ready(fl)
            t3 = time.perf_counter()
            flags, last = fl
            tb = tb_only(flags, W0c, mn, last, mp_rows, srows, nb)
            jax.block_until_ready(tb)
            t4 = time.perf_counter()
            out = yp._device_batch(dbuf, ss_cat, go=go, ge=ge,
                                   m_pad=m_pad, n_pad=n_pad, Kp=Kp, Lp=Lp,
                                   B=nb, np_=NPV, pm_d=pm_d, cw=yp.CW)
            out.block_until_ready()
            t5 = time.perf_counter()
            if measure:
                tot["h2d"] += t1 - t0
                tot["prep"] += t2 - t1
                tot["dp"] += t3 - t2
                tot["tb"] += t4 - t3
                tot["full"] += t5 - t4
        return tot

    run_stages(False)  # warm
    best = None
    for it in range(ITERS):
        tot = run_stages(True)
        line = " ".join(f"{k}={v:.4f}" for k, v in tot.items())
        print(f"iter {it}: {line}")
        if best is None or sum(tot.values()) < sum(best.values()):
            best = tot
    print("BEST:", " ".join(f"{k}={v:.4f}" for k, v in best.items()))
    dp_rate = cells / best["dp"] / 1e6
    print(f"DP kernel alone: {dp_rate:.0f}M cells/s "
          f"({dp_rate*1e6/11468556:.1f}x C)")


if __name__ == "__main__":
    main()
