"""CLI mirroring pair2tb (pair2tb.c:16-42).

args: pairwise.maf seqfile1 seqfile2 — convert a single-coverage pairwise
MAF to a threaded blockset (copy blocks, then fill per-species gaps with
single-row blocks read from the sequence files).
"""

from __future__ import annotations

import sys

from ..blocks import flip_comps
from ..maf import read_maf, write_ali, write_end, write_start
from ..threading_tools import get_maf_between

VERSION = 11


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    cmd = f"pair2tb.v{VERSION}"
    if len(argv) != 3:
        raise SystemExit(f"{cmd}: args: pairwise.maf seqfile1 seqfile2")
    write_start(out, cmd)
    alis = read_maf(argv[0], verbose=True, echo=out)
    for a in alis:
        write_ali(out, a)
    alis = get_maf_between(alis, argv[1], lambda a: write_ali(out, a))
    flip_comps(alis)
    get_maf_between(alis, argv[2], lambda a: write_ali(out, a))
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
