"""CLI mirroring single_cov2 (single_cov2.c:160-240).

args: pairwise.maf [R=species] [F=deleted.maf]
"""

from __future__ import annotations

import sys

from .. import scores as sc
from ..blocks import flip_comps, row_dash_rm, sort_by_top_start
from ..maf import read_maf, write_ali, write_end, write_start
from ..single_cov import STOP_CRITERIA, iterative_single_cov

VERSION = 11


def main(argv=None, out=None, err=None, argv0=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr
    cmd = f"single_cov2.v{VERSION}"
    if argv0 is None:
        argv0 = "single_cov2"

    if len(argv) < 1:
        raise SystemExit(f"{cmd}: args: pairwise.maf [R=species] [F=deleted.maf]")

    write_start(out, "single_cov2")
    out.write(f"# {cmd} {argv0} " + " ".join(argv) + "\n" if argv else f"# {cmd} {argv0}\n")

    log_fh = None
    reference = None
    if argv and argv[-1].startswith("F="):
        log_fh = open(argv.pop()[2:], "w")
    if argv and argv[-1].startswith("R="):
        reference = argv.pop()[2:]

    sp = sc.init_scores70()
    alis = read_maf(argv[0], verbose=True, echo=out)
    if not alis:
        write_end(out)
        return 0
    orig1 = sum(a.comps[0].size for a in alis)
    orig2 = sum(a.comps[1].size for a in alis)

    log = log_fh.write if log_fh else None
    if reference is None or alis[0].comps[0].name == reference:
        alis = iterative_single_cov(alis, log=log, sp=sp)
    flip_comps(alis)
    if reference is None or (alis and alis[0].comps[0].name == reference):
        alis = iterative_single_cov(alis, log=log, sp=sp)
    if log_fh:
        log_fh.close()
    flip_comps(alis)

    res1 = res2 = 0
    for a in sort_by_top_start(alis):
        a = row_dash_rm(a)
        if a is None or len(a.comps) < 2:
            continue
        a.score = sc.score_range(a, 0, a.text_size, sp=sp)
        write_ali(out, a)
        res1 += a.comps[0].size
        res2 += a.comps[1].size

    if (res1 + res2) / (orig1 + orig2) < STOP_CRITERIA:
        err.write(f"{orig1 + orig2 - res1 - res2} bases loss out of {orig1 + orig2}\n")
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
