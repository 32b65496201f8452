"""Quick parity check of the Pallas band-local yama kernel.

Usage: python scripts/pallas_check.py [cpu|tpu] [njobs]
On cpu the kernel runs in interpret mode (see yama_pallas.INTERPRET).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax

    print("devices:", jax.devices())
    from multiz_tpu.ops.synth import synth_jobs
    from multiz_tpu.ops import yama_pallas
    from multiz_tpu.yama import yama_numpy

    if jax.devices()[0].platform != "tpu":
        yama_pallas.INTERPRET = True

    njobs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    jobs = synth_jobs(njobs, m_lo=40, m_hi=120, k_lo=1, k_hi=4, radius=8,
                      seed=11)
    outs = yama_pallas.yama_batch_pallas(jobs)
    nbad = 0
    for i, ((A, B, LB, RB), got) in enumerate(zip(jobs, outs)):
        want = yama_numpy(A, B, LB, RB)
        if got.shape != want.shape or not np.array_equal(got, want):
            nbad += 1
            print(f"job {i}: MISMATCH got {got.shape} want {want.shape}")
    print(f"{njobs - nbad}/{njobs} jobs bit-equal")
    return 1 if nbad else 0


if __name__ == "__main__":
    raise SystemExit(main())
