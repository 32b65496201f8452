"""CLI mirroring maf2fasta (maf2fasta.c:108-168).

args: refseq-file maf-file [beg end] [fasta[2]][?] [iupac2n] [refsrc=src]
"""

from __future__ import annotations

import sys

from ..maf2fasta import INT_MAX, Maf2FastaError, VERSION, maf2fasta


def main(argv=None, out=None, err=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr

    fasta = 0
    star = "-"
    iupac2n = False
    ref_src = None
    rest = []
    # flag extraction with the reference's prefix matching and copyback
    # compaction (maf2fasta.c:125-158); fasta2 is tested before fasta.
    for a in argv:
        if a.startswith("fasta2"):
            if len(a) > 6:
                star = a[6]
            fasta = 2
            continue
        if a.startswith("fasta"):
            if len(a) > 5:
                star = a[5]
            fasta = 1
            continue
        if a.startswith("iupac2n"):
            iupac2n = True
            continue
        if a.startswith("refsrc="):
            ref_src = a[7:]
            if not ref_src:
                err.write(f"maf2fasta.v{VERSION}: refsrc argument missing\n")
                return 1
            continue
        rest.append(a)

    if len(rest) not in (2, 4):
        err.write(
            f"maf2fasta.v{VERSION}: args = refseq-file maf-file [beg end] "
            "[fasta[2]][?] [iupac2n] [refsrc=src]\n"
        )
        return 1
    def atoi32(s: str) -> int:
        # C atoi wraps at 32 bits (maf2fasta.c:164-165)
        v = int(s) & 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    BEG, END = 0, INT_MAX
    if len(rest) == 4:
        BEG = max(0, atoi32(rest[2]))
        END = atoi32(rest[3])
    if BEG > END:
        err.write(f"maf2fasta.v{VERSION}: BEG = {BEG} > END = {END}\n")
        return 1
    try:
        maf2fasta(
            rest[0], rest[1], BEG=BEG, END=END, fasta=fasta, star=star,
            iupac2n=iupac2n, ref_src=ref_src, out=out,
        )
    except Maf2FastaError as e:
        err.write(str(e) + "\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
