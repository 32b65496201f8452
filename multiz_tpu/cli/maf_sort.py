"""CLI mirroring maf_sort (maf_sort_main.c:6-35).

args: maf-file species-name [unused-ali-file]
"""

from __future__ import annotations

import sys

from ..blocks import maf_sort_list
from ..maf import read_maf, write_ali, write_end, write_start


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) < 2:
        raise SystemExit("args: maf-file species-name [unused-ali-file]")
    unused_path = argv[2] if len(argv) >= 3 else None

    alis = read_maf(argv[0], verbose=False)
    kept, unused = maf_sort_list(alis, argv[1], collect_unused=unused_path is not None)
    # quirk: the reference writes scoring=maf_project_simple (maf_sort_main.c:25)
    write_start(out, "maf_project_simple")
    for a in kept:
        write_ali(out, a)
    if unused_path is not None:
        with open(unused_path, "w") as fh:
            for a in unused:
                write_ali(fh, a)
    write_end(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
