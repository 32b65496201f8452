"""Pipeline benchmark: end-to-end TBA (BASELINE configs 3-4).

Simulates a 4-species dataset (human + chimp/mouse/rat, ~REF_LEN bases
of reference), runs single_cov2 to produce .sing.maf inputs, then times
the full in-memory tba pipeline (tree merges, projections, threading)
with the DP executed (a) inline on host (the reference's shape) and
(b) as batched device launches via the packed Pallas kernel.

Prints one JSON line per mode:
  {"metric": "tba_refbases_per_sec", "mode": ..., "value": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_LEN = int(os.environ.get("MZ_PIPE_REFLEN", "200000"))
CACHE = os.environ.get("MZ_PIPE_DIR", f"/tmp/mz_pipebench_{REF_LEN}")
TREE = "(((human chimp) mouse) rat)"
SPECIES = ("chimp", "mouse", "rat")


def build_dataset():
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )
    from sim import SimConfig, simulate

    from multiz_tpu.cli import single_cov2 as sc2_cli

    if os.path.exists(os.path.join(CACHE, "human.rat.sing.maf")):
        return
    simulate(SimConfig(seed=9, ref_len=REF_LEN), CACHE)
    for s in SPECIES:
        with open(os.path.join(CACHE, f"human.{s}.sing.maf"), "w") as fh:
            sc2_cli.main(
                [os.path.join(CACHE, f"human.{s}.orig.maf")], out=fh
            )


def run(mode: str):
    from multiz_tpu import scores as sc
    from multiz_tpu.multiz import MultizConfig
    from multiz_tpu.tree import tba_run

    sp = sc.init_scores70()
    batch_fn = None
    if mode == "packed":
        from multiz_tpu.ops.yama_pack import yama_batch_packed

        batch_fn = yama_batch_packed
    elif mode == "host-batched":
        from multiz_tpu.ops.dispatch import host_batch

        batch_fn = host_batch
    cfg = MultizConfig(batch_fn=batch_fn)
    pairs = [f"human.{s}.sing.maf" for s in SPECIES]
    t0 = time.perf_counter()
    blocks = tba_run(TREE, pairs, src_dir=CACHE, cfg=cfg, sp=sp)
    dt = time.perf_counter() - t0
    return blocks, dt


def main():
    build_dataset()
    modes = sys.argv[1:] or ["inline", "packed"]
    base = None
    for mode in modes:
        # two runs: the first pays per-bucket kernel compiles (no
        # persistent cache through the axon remote compiler)
        best = None
        for it in range(2 if mode != "inline" else 1):
            blocks, dt = run(mode)
            best = dt if best is None else min(best, dt)
        from multiz_tpu.maf import format_ali

        rendered = "".join(format_ali(a) for a in blocks)
        if base is None:
            base = rendered
        else:
            # full rendered-block byte equality across modes (rows,
            # texts, scores — not just counts/starts)
            assert rendered == base, f"mode {mode} output differs!"
        print(
            json.dumps(
                {
                    "metric": "tba_refbases_per_sec",
                    "mode": mode,
                    "value": round(REF_LEN / best, 1),
                    "blocks": len(blocks),
                    "seconds": round(best, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
