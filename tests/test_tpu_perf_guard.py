"""Chip-gated pipeline perf guard (VERDICT r4 task 5).

The r4 regression class: host-side speedups silently inverted the
chip's value — bench_pipeline's packed mode became SLOWER than the
repo's own inline host path, and nothing failed. This guard runs a
fixed mid-size tba workload both ways on the live chip and asserts the
packed executor (streaming device dispatch + host DP lane) is not
slower than inline beyond tunnel-noise tolerance.

Run with `pytest -m tpu` on a host with a live chip.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

pytestmark = pytest.mark.tpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from sim import SimConfig, simulate

    from multiz_tpu.cli import single_cov2 as sc2_cli

    d = str(tmp_path_factory.mktemp("perf_guard"))
    cfg = SimConfig(
        seed=5, ref_len=200_000, species=("chimp", "mouse", "rat"),
        divergence=(0.03, 0.18, 0.22),
    )
    simulate(cfg, d)
    for s in cfg.species:
        with open(os.path.join(d, f"human.{s}.sing.maf"), "w") as fh:
            sc2_cli.main([os.path.join(d, f"human.{s}.orig.maf")], out=fh)
    return d


def _run(dataset, packed: bool) -> float:
    from multiz_tpu import scores as sc
    from multiz_tpu.multiz import MultizConfig
    from multiz_tpu.tree import tba_run

    sp = sc.init_scores70()
    batch_fn = None
    if packed:
        from multiz_tpu.ops.yama_pack import yama_batch_packed

        batch_fn = yama_batch_packed
    cfg = MultizConfig(batch_fn=batch_fn)
    tree = "(((human chimp) mouse) rat)"
    pairs = [f"human.{s}.sing.maf" for s in ("chimp", "mouse", "rat")]
    best = None
    for _ in range(2):  # first packed run may pay compile-cache loads
        t0 = time.perf_counter()
        tba_run(tree, pairs, src_dir=dataset, cfg=cfg, sp=sp)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def test_packed_not_slower_than_inline(dataset):
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU attached")
    t_inline = _run(dataset, packed=False)
    t_packed = _run(dataset, packed=True)
    # generous tolerance for tunnel noise: the r4 regression was 1.4x,
    # well outside this band
    assert t_packed <= t_inline * 1.25, (
        f"packed tba ({t_packed:.2f}s) slower than inline "
        f"({t_inline:.2f}s): the device path is subtracting value again"
    )
