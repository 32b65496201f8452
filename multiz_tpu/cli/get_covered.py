"""CLI mirroring get_covered (get_covered.c:79-117).

args: file1 file2 — intersect file1's blocks with the top-row intervals
covered by file2.
"""

from __future__ import annotations

import sys

from .. import scores as sc
from ..blocks import separate_by_src
from ..maf import read_maf, write_ali, write_end, write_start
from ..threading_tools import get_covered


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) != 2:
        raise SystemExit("arguments: file1 file2")
    write_start(out, "get_covered")
    sp = sc.init_scores70()
    cp1 = read_maf(argv[0], verbose=True, echo=out)
    cp2 = read_maf(argv[1], verbose=True, echo=out)
    while cp1 and cp2:
        chrom = cp2[0].comps[0].src
        cp2, wk2 = separate_by_src(cp2, chrom)
        cp1, wk1 = separate_by_src(cp1, chrom)
        get_covered(wk1, wk2, lambda a: write_ali(out, a), sp=sp)
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
