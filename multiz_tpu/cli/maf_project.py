"""CLI mirroring maf_project (maf_project.c:550-781).

args: file.maf reference [from to] [filename-for-other-mafs]
      [species-guid-tree] [nohead]
"""

from __future__ import annotations

import sys

from .. import scores as sc
from ..maf import read_maf, write_ali, write_end, write_start
from ..maf_project import get_names, project

VERSION = 12


def _atoi(s: str) -> int:
    """C atoi: leading int prefix, else 0."""
    s = s.strip()
    i = 0
    if i < len(s) and s[i] in "+-":
        i += 1
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    return int(s[:j])


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    cmd = f"maf_project.v{VERSION}"
    orig = list(argv)
    nohead = False
    if argv and argv[-1] == "nohead":
        nohead = True
        argv.pop()

    species = None
    if len(argv) == 5 or (len(argv) == 3 and "(" in argv[2]):
        species = get_names(argv[1], argv[-1])
        argv.pop()
    beg = end = -1
    if len(argv) == 4:
        b, e = _atoi(argv[2]), _atoi(argv[3])
        if b >= 0 and e > b:
            beg, end = b, e
            argv = argv[:2]
    if len(argv) not in (2, 3):
        raise SystemExit(
            f"{cmd}: args: file.maf reference [from to] "
            "[filename-for-other-mafs] [species-guid-tree] [nohead]"
        )
    target = argv[1]
    other_path = argv[2] if len(argv) == 3 else None

    if not nohead:
        write_start(out, cmd)
        out.write(f"# {cmd} " + " ".join(orig) + "\n")

    alis = read_maf(argv[0], verbose=True, echo=out)
    sp = sc.init_scores70()
    written, others = project(
        alis, target, species=species, beg=beg, end=end,
        do_beautify=other_path is None, sp=sp,
    )
    if other_path is not None:
        with open(other_path, "w") as fh:
            for a in others:
                write_ali(fh, a)
    for a in written:
        write_ali(out, a)
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
