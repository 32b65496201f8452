"""blastzWrapper: adapt lastz to multi-contig FASTA inputs.

Port of blastzWrapper.c:29-147. Runs the external ``lastz`` on
(contig, file) pairs, rewriting the lav output's ``d``/``h``/``s``/``a``
stanzas to restore contig identity — and, when the two inputs were
swapped to put the file with fewer contigs first, swapping the two
sequences back in every stanza (replace_reverse_bz,
blastzWrapper.c:29-78).
"""

from __future__ import annotations

import subprocess
import sys
from typing import IO, List

from .seqio import read_fasta_spec as read_fasta

BZ = "lastz"  # blastzWrapper.c:14
VERSION = 11


def _count_contigs(path: str) -> int:
    return len(read_fasta(path))


def replace_reverse_bz(
    lines, fpw: IO[str], replace_str: str, contig: int, rev: int
) -> None:
    """Stanza rewriter (blastzWrapper.c:29-78). ``lines`` is an iterator
    of lav text lines (with newlines)."""
    it = iter(lines)
    for buf in it:
        if rev == 1 and buf.startswith("d {"):
            fpw.write(buf)
            buf = next(it)
            parts = buf.split()
            # sscanf '  "%s %s %s' -> first three whitespace tokens
            cmd, spe1, spe2 = parts[0].lstrip('"'), parts[1], parts[2]
            fpw.write(f'  "{cmd} {spe2} {spe1}\n')
        elif rev == 1 and buf.startswith("h {"):
            fpw.write(buf)
            buf1 = next(it)
            buf2 = next(it)
            fpw.write(buf2)
            fpw.write(buf1)
        elif buf.startswith("s {"):
            fpw.write(buf)
            buf1 = next(it)
            t = buf1.split()
            beg, end, dir_ = int(t[-4]), int(t[-3]), int(t[-2])
            buf1 = f'  "{replace_str}" {beg} {end} {dir_} {contig}\n'
            buf2 = next(it)
            if rev == 1:
                fpw.write(buf2)
                fpw.write(buf1)
            else:
                fpw.write(buf1)
                fpw.write(buf2)
        elif rev == 1 and buf.startswith("a {"):
            fpw.write(buf)
            buf = next(it)
            fpw.write(buf)  # s
            buf = next(it)  # b
            b1, b2 = map(int, buf.split()[1:3])
            fpw.write(f"  b {b2} {b1}\n")
            buf = next(it)  # e
            e1, e2 = map(int, buf.split()[1:3])
            fpw.write(f"  e {e2} {e1}\n")
            buf = next(it)
            while buf.startswith("  l"):
                b1, b2, e1, e2, pct = map(int, buf.split()[1:6])
                fpw.write(f"  l {b2} {b1} {e2} {e1} {pct}\n")
                buf = next(it)
            fpw.write(buf)
        elif not buf.startswith("#:eof"):
            fpw.write(buf)


def _run_bz(args: List[str], stdin_text: str | None = None) -> List[str]:
    """Run lastz, returning output lines (popen path)."""
    res = subprocess.run(
        args, input=stdin_text, capture_output=True, text=True
    )
    return res.stdout.splitlines(keepends=True)


def main(argv=None, out=None, err=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr
    if len(argv) < 2:
        err.write(
            f"blastzWrapper.v{VERSION}:  -- wrapper of blastz, passing all "
            "arguments to blastz.\nargs: seqfile1 seqfile2 [options]\n"
        )
        return 1
    extra = argv[2:]
    c1 = _count_contigs(argv[0])
    c2 = _count_contigs(argv[1])
    reverse = 0
    seq_file1, seq_file2 = argv[0], argv[1]
    if c1 > c2:
        reverse = 1
        seq_file1, seq_file2 = argv[1], argv[0]
        c1, c2 = c2, c1

    try:
        if c1 == 1:
            cmd = [BZ, seq_file1, seq_file2, *extra]
            if reverse == 0:
                # system(cmdline): lav passes through verbatim
                res = subprocess.run(cmd, capture_output=True, text=True)
                out.write(res.stdout)
                return 0
            lines = _run_bz(cmd)
            replace_reverse_bz(lines, out, seq_file1, 1, 1)
        else:
            contig = 1
            for c in read_fasta(seq_file1):
                text = c.header + "\n" + c.seq.tobytes().decode("latin-1")
                text += "\n"
                lines = _run_bz(
                    [BZ, "/dev/stdin", seq_file2, *extra], stdin_text=text
                )
                # the C pipes through `grep -v eof` (blastzWrapper.c:132)
                lines = [ln for ln in lines if "eof" not in ln]
                replace_reverse_bz(lines, out, seq_file1, contig, reverse)
                contig += 1
    except FileNotFoundError:
        err.write(f"blastzWrapper.v{VERSION}: {BZ}: command not found\n")
        return 127
    out.write("#:eof\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
