"""Select the DP execution backend for the multiz/tba pipeline.

The reference runs every overlap DP serially in-process
(multiz.c:149, mz_yama.c:50). Here the pipeline *plans* all DPs and
executes them through one of:

  * ``packed``  — sublane-packed band-local Pallas TPU kernel
                  (ops/yama_pack.py); picked automatically when a TPU
                  backend is attached.
  * ``jax``     — batched full-row XLA kernel (ops/yama_jax.py).
  * ``host``    — per-problem NumPy/C++ oracle loop (yama.py); used to
                  exercise the two-phase plan/execute/stitch machinery
                  without a device.
  * ``none``    — disable batching; the merge scan calls the oracle
                  inline (the reference's shape).

Override with MULTIZ_TPU_DEVICE=packed|jax|host|none (default: auto).
"""

from __future__ import annotations

import os
from typing import Callable, Optional


def host_batch(jobs, sp=None):
    """Per-problem host loop with the batch_fn signature."""
    from ..yama import yama_numpy

    return [yama_numpy(A, B, LB, RB, sp=sp) for (A, B, LB, RB) in jobs]


def default_batch_fn() -> Optional[Callable]:
    """Resolve the batch DP backend from MULTIZ_TPU_DEVICE / hardware."""
    mode = os.environ.get("MULTIZ_TPU_DEVICE", "auto").lower()
    if mode in ("0", "off", "none"):
        return None
    if mode == "host":
        return host_batch
    if mode == "jax":
        from .yama_jax import yama_batch

        return lambda jobs, sp=None: yama_batch(jobs, sp=sp)
    if mode == "packed":
        from .yama_pack import yama_batch_packed

        return yama_batch_packed
    # auto: use the Pallas path iff a real TPU is attached AND is the
    # default computation device (tests pin jax_default_device to a
    # virtual CPU even when the TPU plugin registered itself)
    try:
        import jax

        dev = jax.config.jax_default_device
        platform = (
            dev.platform if dev is not None else jax.devices()[0].platform
        )
    except Exception:
        return None
    if platform == "tpu":
        from .yama_pack import yama_batch_packed

        return yama_batch_packed
    return None
