"""CLI mirroring the reference ``multic`` executable (multic.c:260-403).

args: [s=?] [R=?] [M=?] [C=?] file1 file2 v [out1 out2] [nohead] [all]
"""

from __future__ import annotations

import sys

from .. import scores as sc
from ..maf import read_maf, write_end, write_start
from ..multic import MulticConfig, multic

VERSION = "12.1"


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    cmd = f"multic.v{VERSION}"
    args_line = cmd + " " + " ".join(argv) + " "

    cfg = MulticConfig()
    while argv and argv[0][:1] in "sRMC" and argv[0][1:2] == "=":
        key, val = argv[0][0], int(argv[0][2:])
        if key == "s":
            cfg.align_cate = val
        elif key == "R":
            if val < 0:
                raise SystemExit("radius cannot be negative")
            cfg.radius = val
        elif key == "M":
            if val < 0:
                raise SystemExit("MIN_OUTPUT_WID cannot be negative")
            cfg.min_output_wid = val
        elif key == "C":
            if val < 0 or val > 100:
                raise SystemExit(f"{cmd}: bad C= value")
            cfg.connection_threshold = val
        argv.pop(0)

    nohead = False
    if argv and argv[-1] == "all":
        cfg.row2 = 0
        argv.pop()
    if argv and argv[-1] == "nohead":
        nohead = True
        argv.pop()

    if len(argv) not in (3, 5):
        raise SystemExit(
            f"{cmd}: args: [R=?] [M=?] [C=?] file1 file2 v? [out1 out2] "
            "[nohead] [all]"
        )

    out1 = out2 = None
    close = []
    if len(argv) == 5:
        out1 = open(argv[3], "w")
        out2 = open(argv[4], "w")
        close = [out1, out2]
    v = int(argv[2])
    if v not in (0, 1):
        raise SystemExit(f"{cmd}: v can only be value of 0 or 1")

    if not nohead:
        write_start(out, "multih.c")
        out.write(f"# {args_line}\n")
    sp = sc.init_scores70()

    list1 = read_maf(argv[0], verbose=True, echo=out)
    list2 = read_maf(argv[1], verbose=True, echo=out)

    multic(list1, list2, v, out, out1, out2, cfg=cfg, sp=sp)

    for fh in close:
        fh.close()
    # Quirk shared with multiz: with no out1/out2 the reference fcloses
    # stdout before mafWriteEnd, so ##eof is only emitted in the 6-arg form
    # (multic.c:397-401).
    if close:
        write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
