"""Bisect the packed kernel's time: run the DP pallas_call alone on one
bucket under different MZ_PERF_KNOB settings.

Usage: MZ_PERF_KNOB=noscan MZ_ROW_CHUNK=32 python scripts/pack_kernel_bisect.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from multiz_tpu.ops.synth import synth_jobs
    from multiz_tpu.ops import yama_pack as ypk
    from multiz_tpu import scores as sc

    sp = sc.current
    go, ge = int(sp.gap_open), int(sp.gap_extend)
    ss_cat = jnp.asarray(sp.ss_cat)
    jobs = synth_jobs(152, m_lo=513, m_hi=1024, k_lo=1, k_hi=4, radius=30,
                      seed=42)
    m_pad = 1024
    n_pad = 1280
    Kp = Lp = 8
    nb = 152
    mp1 = m_pad + 1
    nchunks = -(-mp1 // ypk.ROW_CHUNK)
    mp_rows = nchunks * ypk.ROW_CHUNK
    npadl = ypk._round_up(n_pad + ypk.CW + 2, 128)
    G = nb // 8

    Atex = np.zeros((nb, m_pad, Kp), np.uint8)
    Btex = np.zeros((nb, n_pad, Lp), np.uint8)
    LBp = np.zeros((nb, mp1), np.int32)
    RBp = np.zeros((nb, mp1), np.int32)
    Mv = np.zeros(nb, np.int32)
    Nv = np.zeros(nb, np.int32)
    Kv = np.zeros(nb, np.int32)
    Lv = np.zeros(nb, np.int32)
    for slot, (A, B, LB, RB) in enumerate(jobs):
        M, K = A.shape
        N, L = B.shape
        Atex[slot, :M, :K] = A
        Btex[slot, :N, :L] = B
        LBp[slot, : M + 1] = LB[: M + 1]
        RBp[slot, : M + 1] = RB[: M + 1]
        LBp[slot, M + 1 :] = LB[M]
        RBp[slot, M + 1 :] = RB[M]
        Mv[slot], Nv[slot], Kv[slot], Lv[slot] = M, N, K, L

    @jax.jit
    def prep(Atex, Btex, LB, RB, M, N, K, L):
        p = jax.vmap(
            lambda at, btx, lb, rb, m, n, k, l: ypk._prep_one(
                at, btx, lb, rb, m, n, k, l, ss_cat, go, ge,
                m_pad, n_pad, Kp, Lp, nchunks, npadl, mp_rows,
            )
        )(Atex, Btex, LB, RB, M, N, K, L)
        bst, astream, dp0, f0, W0c = p
        return (
            W0c.reshape(G, 8, nchunks).transpose(0, 2, 1)[:, :, None, :],
            bst.reshape(G, 8, 12, npadl),
            astream.reshape(G, 8, nchunks, ypk.ROW_CHUNK, ypk.ASLOTS)
            .transpose(0, 2, 3, 1, 4),
            dp0.reshape(G, 8, 3, npadl).transpose(0, 2, 1, 3),
            f0.reshape(G, 1, 8, ypk.CW),
        )

    args = prep(
        jnp.asarray(Atex), jnp.asarray(Btex), jnp.asarray(LBp),
        jnp.asarray(RBp), jnp.asarray(Mv), jnp.asarray(Nv),
        jnp.asarray(Kv), jnp.asarray(Lv),
    )
    jax.block_until_ready(args)

    dp = jax.jit(functools.partial(
        ypk._pallas_dp, go=go, ge=ge, nchunks=nchunks, npadl=npadl, G=G
    ))
    r = dp(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = dp(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 5
    grows = G * mp_rows
    print(
        "knob=%r RC=%d kernel: %.4fs  (%.1f us/chunk-step, %.0f ns/problem-row)"
        % (
            os.environ.get("MZ_PERF_KNOB", ""), ypk.ROW_CHUNK, dt,
            dt / (G * nchunks) * 1e6, dt / (grows * 8) * 1e9,
        ),
        flush=True,
    )


main()
