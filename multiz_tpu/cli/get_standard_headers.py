"""CLI mirroring get_standard_headers (get_standard_headers.c:20-31):
print ``<header-line> ==>`` and the ``1-len:+:len`` skeleton per contig.
"""

from __future__ import annotations

import sys

from ..seqio import read_fasta_spec as read_fasta


def main(argv=None, out=None, err=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr
    if len(argv) < 1:
        err.write("get_standard_headers: args: seq-file\n")
        return 1
    for contig in read_fasta(argv[0]):
        n = int(contig.seq.shape[0])
        out.write(f"{contig.header} ==>\n")
        out.write(f"1-{n}:+:{n}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
