"""CLI mirroring lav2maf (lav2maf.c:17-266).

args: blastz.output seq-file1 seq-file2 — convert blastz/lastz lav output
to a MAF on stdout.
"""

from __future__ import annotations

import sys

from ..lav import lav2maf


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) != 3:
        raise SystemExit(
            "lav2maf.v13: args: blastz.output seq-file1 seq-file2"
        )
    lav2maf(argv[0], argv[1], argv[2], out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
