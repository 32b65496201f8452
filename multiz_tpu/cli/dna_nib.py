"""CLI mirroring dna_nib (dna_nib.c:19-64, unbuilt in the reference
Makefile but part of the toolkit): extract a range from a sequence file
(.nib or FASTA), reverse-complemented when from > to, as 50-column FASTA.

args: nib-file from to fasta-header
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from ..blocks import DNA_COMPL
from ..seqio import NIB_MAGIC, read_fasta, read_nib


def _read_seq(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        head = fh.read(4)
    for fmt in ("<I", ">I"):
        if len(head) == 4 and struct.unpack(fmt, head)[0] == NIB_MAGIC:
            return read_nib(path)
    return read_fasta(path)[0].seq


def main(argv=None, out=None, err=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr
    if len(argv) != 4:
        err.write("dna_nib.v1: args = nib-file from to fast-header\n")
        return 1
    s = _read_seq(argv[0])
    n = int(s.shape[0])
    frm = int(argv[1])
    if frm < 0 or frm >= n:
        frm = n - 1
    to = int(argv[2])
    if to < 0 or to >= n:
        to = n - 1
    out.write(f">{argv[3]}:{frm}-{to}:+:{n}\n")
    if frm < to:
        piece = s[frm : to + 1]
    else:
        piece = DNA_COMPL[s[to : frm + 1][::-1]]
    text = piece.tobytes().decode("latin-1")
    for i in range(0, len(text), 50):
        out.write(text[i : i + 50] + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
