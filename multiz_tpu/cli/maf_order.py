"""CLI mirroring maf_order (maf_order_main.c:14-53).

args: maf-file species1 species2 .. [nohead] [all]
"""

from __future__ import annotations

import sys

from ..maf import read_maf, write_ali, write_end, write_start
from ..maf_order import order_ali


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) < 2:
        raise SystemExit(
            "args: maf-file species1 species2 .. [nohead] [all]"
        )
    all_ = False
    head = True
    if argv and argv[-1] == "all":
        all_ = True
        argv.pop()
    if argv and argv[-1] == "nohead":
        head = False
        argv.pop()
    if head:
        write_start(out, "maf_order")
    species = argv[1:]
    for a in read_maf(argv[0], verbose=True, echo=out):
        a = order_ali(a, species)
        if a is None:
            continue
        if all_ or len(a.comps) > 1:
            write_ali(out, a)
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
