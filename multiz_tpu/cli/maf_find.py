"""CLI mirroring mafFind (mafFind.c:22-83).

args: file.maf beg end [species-prefix] [slice]
"""

from __future__ import annotations

import sys

from .. import scores as sc
from ..blocks import maf_slice, row_dash_rm
from ..maf import read_maf, pos2col, write_ali, write_end, write_start

VERSION = 1


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    cmd = f"mafFind.v{VERSION}"
    orig = list(argv)
    do_slice = False
    species = None
    if len(argv) > 3 and argv[-1] == "slice":
        do_slice = True
        argv.pop()
    if len(argv) == 4:
        species = argv.pop()
    if len(argv) != 3:
        raise SystemExit(
            f"{cmd}: args: file.maf beg end [species-prefix] [slice]"
        )
    B, E = int(argv[1]), int(argv[2])
    write_start(out, cmd)
    out.write(f"# {cmd} " + " ".join(orig) + "\n")
    sp = sc.init_scores70()
    for a in read_maf(argv[0], verbose=False):
        c = None
        if species is not None:
            for cc in a.comps:
                if cc.src.startswith(species):
                    c = cc
                    break
        else:
            c = a.comps[0] if a.comps else None
        if c is None:
            continue
        b = c.start
        e = b + c.size - 1
        if e >= B and b <= E:
            if do_slice:
                bcol = pos2col(c, max(b, B))
                ecol = pos2col(c, min(e, E))
                A = maf_slice(a, bcol, ecol + 1)
                A = row_dash_rm(A)
                if A is None:
                    continue
                A.score = sc.score_range(A, 0, A.text_size, sp=sp)
                write_ali(out, A)
            else:
                write_ali(out, a)
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
