"""lav <-> MAF converters.

Re-implements the reference's ``lav2maf`` (lav2maf.c:17-266) and ``maf2lav``
(maf2lav.c:20-230) with vectorized NumPy text assembly instead of per-char
buffer walks. The lav format is blastz/lastz's native output: stanzas
``d{`` (description), ``s{`` (sequence files + orientation), ``h{``
(headers), ``a{`` (one alignment: score, begin/end, and gap-free ``l``
segments), ``x{``/``m{`` trailers.
"""

from __future__ import annotations

import io
from typing import List, Optional, TextIO

import numpy as np

from . import scores as sc
from .blocks import revcomp_text
from .maf import Ali, Comp, read_maf, write_ali, write_end, write_start
from .seqio import Contig, parse_header, read_fasta_spec as read_fasta

DASH = ord("-")


class _OrientedContigs:
    """Contig store with the reference's in-place orientation toggling.

    lav2maf.c:87-98 reverse-complements a contig's text in place whenever the
    requested lav orientation differs from the stored one; we keep the same
    statefulness (cheap: at most one revcomp per direction change).
    """

    def __init__(self, path: str):
        self.path = path
        self.contigs: List[Contig] = read_fasta(path)
        self.flipped = [False] * len(self.contigs)

    def get(self, idx: int, direction: int) -> np.ndarray:
        want = direction == 1
        if self.flipped[idx] != want:
            self.contigs[idx].seq = revcomp_text(self.contigs[idx].seq)
            self.flipped[idx] = want
        return self.contigs[idx].seq

    def meta(self, idx: int):
        return parse_header(self.path, self.contigs[idx])

    def length(self, idx: int) -> int:
        return int(self.contigs[idx].seq.shape[0])


def _parse_s_line(line: str) -> tuple[int, int]:
    """One line of an ``s {`` stanza -> (dir, contig0) (lav2maf.c:67-85)."""
    parts = line.split()
    if len(parts) < 5 or not parts[0].startswith('"'):
        raise ValueError(f"bad lav s-stanza line: {line!r}")
    return int(parts[3]), int(parts[4]) - 1


def _adjust_start_strand(strand: str, direction: int, start0: int, end0: int,
                         src_size: int) -> tuple[str, int]:
    """Header-strand x lav-orientation -> MAF strand/start (lav2maf.c:181-200).

    start0/end0 are the 0-based header range endpoints (after the ``--``).
    """
    if strand == "+" and direction == 0:
        return "+", start0
    if strand == "-" and direction == 1:
        return "+", src_size - 1 - end0
    if strand == "+" and direction == 1:
        return "-", src_size - 1 - end0
    return "-", start0  # strand=='-' && dir==0


def lav2maf(lav_path: str, seq1_path: str, seq2_path: str, out: TextIO,
            sp: Optional[sc.ScoreParams] = None) -> None:
    """Convert a blastz/lastz lav file to MAF (lav2maf.c:17-266)."""
    if sp is None:
        sp = sc.current
    write_start(out, "lav2maf.v13")
    with open(lav_path) as fh:
        lines = fh.read().split("\n")
    if not lines or lines[0] != "#:lav":
        raise ValueError(f"{lav_path} is not a blastz output file")

    # pre-scan to the second "#:lav", echoing any d-stanza (lav2maf.c:52-57)
    i = 1
    n = len(lines)
    while i < n and lines[i] != "#:lav":
        if lines[i] == "d {":
            out.write("#\n")
            i += 1
            while i < n and not lines[i].startswith("}"):
                out.write("#" + lines[i][1:] + "\n")
                i += 1
        i += 1

    sf1 = _OrientedContigs(seq1_path)
    sf2 = _OrientedContigs(seq2_path)

    contig1 = contig2 = -1
    s1 = s2 = None  # current oriented contig texts
    len1 = len2 = -1
    src1 = src2 = ""
    strand1 = strand2 = "+"
    start1 = start2 = 0
    srcsize1 = srcsize2 = 0

    while i < n:
        ln = lines[i]
        i += 1
        if ln == "s {":
            dir1, contig1 = _parse_s_line(lines[i])
            dir2, contig2 = _parse_s_line(lines[i + 1])
            i += 2
            s1 = sf1.get(contig1, dir1)
            len1 = sf1.length(contig1)
            s2 = sf2.get(contig2, dir2)
            len2 = sf2.length(contig2)
        elif ln == "h {":
            i += 2  # header echo lines are ignored (lav2maf.c:156-161)
            m1 = sf1.meta(contig1)
            m2 = sf2.meta(contig2)
            srcsize1, srcsize2 = m1.size, m2.size
            src1 = m1.name if m1.name == m1.contig else f"{m1.name}.{m1.contig}"
            src2 = m2.name if m2.name == m2.contig else f"{m2.name}.{m2.contig}"
            strand1, start1 = _adjust_start_strand(
                m1.strand, dir1, m1.start - 1, m1.end - 1, srcsize1
            )
            strand2, start2 = _adjust_start_strand(
                m2.strand, dir2, m2.start - 1, m2.end - 1, srcsize2
            )
        elif ln == "a {":
            e_parts = lines[i + 2].split()
            if e_parts[0] != "e":
                raise ValueError(f"cannot parse: {lines[i + 2]!r}")
            e1, e2 = int(e_parts[1]), int(e_parts[2])
            if e1 > len1:
                raise ValueError("first sequence length is incorrect")
            if e2 > len2:
                raise ValueError("second sequence length is incorrect")
            i += 3
            chunks1: List[np.ndarray] = []
            chunks2: List[np.ndarray] = []
            old_e1 = old_e2 = -1
            c1_start = c2_start = 0
            while i < n and not lines[i].startswith("}"):
                p = lines[i].split()
                i += 1
                if p[0] != "l":
                    raise ValueError(f"cannot read end-points: {lines[i-1]!r}")
                b1, b2, e1, e2 = int(p[1]), int(p[2]), int(p[3]), int(p[4])
                if old_e1 == -1:
                    c1_start = start1 + b1 - 1
                    c2_start = start2 + b2 - 1
                else:
                    # unaligned gap fill between l segments (lav2maf.c:225-232)
                    g1 = s1[old_e1 : b1 - 1]
                    g2 = s2[old_e2 : b2 - 1]
                    chunks1.append(g1)
                    chunks2.append(np.full(g1.shape[0], DASH, np.uint8))
                    chunks1.append(np.full(g2.shape[0], DASH, np.uint8))
                    chunks2.append(g2)
                chunks1.append(s1[b1 - 1 : e1])
                chunks2.append(s2[b2 - 1 : e2])
                old_e1, old_e2 = e1, e2
            i += 1  # past '}'
            t1 = np.concatenate(chunks1) if chunks1 else np.zeros(0, np.uint8)
            t2 = np.concatenate(chunks2) if chunks2 else np.zeros(0, np.uint8)
            c1 = Comp(src1, c1_start, start1 + e1 - c1_start, strand1,
                      srcsize1, t1)
            c2 = Comp(src2, c2_start, start2 + e2 - c2_start, strand2,
                      srcsize2, t2)
            a = Ali(comps=[c1, c2])
            a.score = sc.score_range_texts((t1, t2), 0, int(t1.shape[0]), sp)
            # drop the trivial whole-contig self-alignment (lav2maf.c:247-253)
            if (c1.start == c2.start and c1.size == c2.size
                    and c1.src_size == c2.src_size and c1.src == c2.src
                    and c1.size == len1 and c2.size == len2):
                continue
            write_ali(out, a)
    write_end(out)


# --------------------------------------------------------------------------
# maf2lav
# --------------------------------------------------------------------------


class _Pair:
    __slots__ = ("text_size", "score", "c1", "c2")

    def __init__(self, text_size: int, score: int, c1: Comp, c2: Comp):
        self.text_size = text_size
        self.score = score
        self.c1 = c1
        self.c2 = c2


def _print_pair(out: TextIO, pairs: List[_Pair]) -> None:
    """a-stanza emitter with gap-free l-segments (maf2lav.c:20-57)."""
    for p in pairs:
        b1 = p.c1.start + 1
        b2 = p.c2.start + 1
        out.write(
            "a {\n  s %d\n  b %d %d\n  e %d %d\n"
            % (p.score, b1, b2, b1 + p.c1.size - 1, b2 + p.c2.size - 1)
        )
        t1, t2 = p.c1.text, p.c2.text
        gap = True
        e1, e2 = b1 - 1, b2 - 1
        matches = 0
        up1 = np.char.upper(t1.view("S1"))
        up2 = np.char.upper(t2.view("S1"))
        for i in range(p.text_size + 1):
            at_end = i == p.text_size
            if not gap and (at_end or t1[i] == DASH or t2[i] == DASH):
                out.write(
                    "  l %d %d %d %d %d\n"
                    % (b1, b2, e1, e2, (100 * matches) // (e1 - b1 + 1))
                )
                gap = True
            elif gap and not at_end and t1[i] != DASH and t2[i] != DASH:
                b1, b2 = e1 + 1, e2 + 1
                matches = 0
                gap = False
            if at_end:
                break
            if t1[i] != DASH:
                e1 += 1
            if t2[i] != DASH:
                e2 += 1
            if not gap and up1[i] == up2[i]:
                matches += 1
        out.write("}\n")


def _record(a: Ali, c1: Comp, c2: Comp, forward: List[_Pair],
            backward: List[_Pair], sp: sc.ScoreParams) -> None:
    """Detach (c1,c2) from the block, squeeze double-dash columns, score,
    and append to the strand-appropriate pair list (maf2lav.c:90-132)."""
    a.comps = [c for c in a.comps if c is not c1 and c is not c2]
    keep = (c1.text != DASH) | (c2.text != DASH)
    t1 = c1.text[keep]
    t2 = c2.text[keep]
    c1.text, c2.text = t1, t2
    j = int(t1.shape[0])
    score = int(sc.score_range_texts((t1, t2), 0, j, sp)) if j else 0
    pair = _Pair(j, score, c1, c2)
    (forward if c2.strand == "+" else backward).append(pair)


def maf2lav(maf_path: str, seq1_path: str, seq2_path: str, out: TextIO,
            sp: Optional[sc.ScoreParams] = None) -> None:
    """Convert two rows of a MAF to lav (maf2lav.c:134-230).

    Faithful to the reference's quirks: blocks are consumed destructively
    across contig pairs, species match is "block src is a prefix of the
    contig name", and the c1 strand test keeps the reference's literal
    ``c->start=='-'`` comparison (maf2lav.c:193) rather than the obviously
    intended ``c->strand``.
    """
    if sp is None:
        sp = sc.current
    alis = read_maf(maf_path)
    out.write('#:lav\nd {\n  "mav2lav %s %s %s"\n}\n'
              % (maf_path, seq1_path, seq2_path))

    contigs1 = read_fasta(seq1_path)
    contigs2 = read_fasta(seq2_path)

    for ct1 in contigs1:
        m1 = parse_header(seq1_path, ct1)
        name1 = m1.name if m1.name == m1.contig else f"{m1.name}.{m1.contig}"
        offset1, end1 = m1.start, m1.end
        len1 = int(ct1.seq.shape[0])
        head1 = ct1.header
        n = 0
        for ct2 in contigs2:
            m2 = parse_header(seq2_path, ct2)
            name2 = (m2.name if m2.name == m2.contig
                     else f"{m2.name}.{m2.contig}")
            offset2, end2 = m2.start, m2.end
            n += 1
            len2 = int(ct2.seq.shape[0])
            head2 = ct2.header
            forward: List[_Pair] = []
            backward: List[_Pair] = []
            for a in alis:
                c1 = c2 = None
                for c in a.comps:
                    if (c1 is None and name1.startswith(c.src) and
                            ((c.strand == "+" and c.start + 1 >= offset1
                              and c.start + c.size - 1 < end1) or
                             (c.start == DASH and
                              c.src_size - c.start - c.size + 1 >= offset1
                              and c.src_size - c.start < end1))):
                        c1 = c
                    elif (name2.startswith(c.src) and
                          ((c.strand == "+" and c.start + 1 >= offset2
                            and c.start + c.size - 1 < end2) or
                           (c.strand == "-" and
                            c.src_size - c.start - c.size + 1 >= offset2
                            and c.src_size - c.start < end2))):
                        c2 = c
                if c1 is None or c2 is None:
                    continue
                if c1.strand == "-":
                    c1.start = c1.src_size - (c1.start + c1.size)
                    c1.strand = "+"
                    c1.text = revcomp_text(c1.text)
                    c2.start = c2.src_size - (c2.start + c2.size)
                    c2.strand = "+" if c2.strand == "-" else "-"
                    c2.text = revcomp_text(c2.text)
                if c2.strand == "+":
                    c2s = c2.start - offset2 + 1
                else:
                    c2s = c2.src_size - (c2.start + c2.size)
                    c2s -= offset2 - 1
                    c2s = len2 - (c2s + c2.size)
                if 0 <= c2s < len2:
                    c1.start -= offset1 - 1
                    c2.start = c2s
                    _record(a, c1, c2, forward, backward, sp)
            # make_lav (maf2lav.c:59-74)
            out.write("#:lav\ns {\n")
            out.write('  "%s" 1 %d 0 1\n  "%s" 1 %d 0 %d\n}\n'
                      % (seq1_path, len1, seq2_path, len2, n))
            out.write('h {\n  "%s"\n  "%s"\n}\n' % (head1, head2))
            _print_pair(out, forward)
            out.write('x {\n  n 0\n}\n#:lav\ns {\n')
            out.write('  "%s" 1 %d 0 1\n  "%s-" 1 %d 1 %d\n}\n'
                      % (seq1_path, len1, seq2_path, len2, n))
            out.write('h {\n  "%s"\n  "%s (reverse complement)"\n}\n'
                      % (head1, head2))
            _print_pair(out, backward)
            out.write("x {\n  n 0\n}\n")
    out.write("m {\n  n 0\n}\n#:eof\n")
