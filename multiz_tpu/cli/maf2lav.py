"""CLI mirroring maf2lav (maf2lav.c:134-230).

args: align.maf seq1 seq2 — convert two rows of a MAF file to lav on stdout.
"""

from __future__ import annotations

import sys

from ..lav import maf2lav


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) != 3:
        raise SystemExit("maf2lav.v11: args = align.maf seq1 seq2")
    maf2lav(argv[0], argv[1], argv[2], out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
