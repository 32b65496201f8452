"""maf2fasta: reference-threaded MAF -> MultiPipMaker text / FASTA rows.

Port of the reference tool (maf2fasta.c:108-372): per contig of the
reference sequence file, extract the blocks on that contig (chopping at
[beg, end] and at overlaps), topologically sort the species names with a
DFS over the observed row-adjacency graph (maf2fasta.c:68-83), verify the
MAF reference rows against the actual sequence (check_ref,
maf2fasta.c:86-106), then rasterize everything into an nrow x ncol byte
matrix. The matrix fill is vectorized (NumPy row assignments) instead of
the C's per-character loops.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from .blocks import maf_slice
from .maf import Ali, DASH, pos2col, read_maf
from .seqio import parse_header, read_fasta_spec as read_fasta

VERSION = 3
COL_WIDTH = 50
INT_MAX = 2**31 - 1

_WHITE, _GRAY, _BLACK = 0, 1, 2


class Maf2FastaError(Exception):
    pass


def _fatal(msg: str) -> None:
    raise Maf2FastaError(f"maf2fasta.v{VERSION}: {msg}")


class _NameGraph:
    """Linked-list name graph with prepended edge lists, matching the C's
    insertion order exactly (maf2fasta.c:239-283) so the DFS emits the
    identical row order."""

    def __init__(self) -> None:
        self.order: List[str] = []  # linked-list order (head = ref)
        self.follows: Dict[str, List[str]] = {}  # prepended edge lists

    def add_after(self, pred: str, name: str) -> None:
        i = self.order.index(pred)
        self.order.insert(i + 1, name)
        self.follows[name] = []

    def add_edge(self, frm: str, to: str) -> None:
        lst = self.follows[frm]
        if to not in lst:
            lst.insert(0, to)  # e->next = m->follows; m->follows = e


def _toposort(g: _NameGraph) -> List[str]:
    """dfs (maf2fasta.c:68-83): from the head only; GRAY hit => cycle."""
    color = {n: _WHITE for n in g.order}
    out: List[Optional[str]] = [None] * len(g.order)
    nxt = [len(g.order)]

    def dfs(n: str) -> None:
        if color[n] != _WHITE:
            _fatal("please apply the maf_order program")
        color[n] = _GRAY
        for m in g.follows[n]:
            if color[m] != _BLACK:
                dfs(m)
        if nxt[0] <= 0:
            _fatal("underflow in row names")
        nxt[0] -= 1
        out[nxt[0]] = n
        color[n] = _BLACK

    sys.setrecursionlimit(max(10000, len(g.order) * 4 + 100))
    dfs(g.order[0])
    if nxt[0] != 0:
        _fatal("not enough row names")
    return out  # type: ignore[return-value]


def _check_ref(
    c, s: np.ndarray, seq_len: int, ncol: int, start: int, iupac2n: bool
) -> None:
    """check_ref (maf2fasta.c:86-106); mutates ``s`` in place for iupac2n."""
    pos = c.start - (start - 1)
    text = c.text
    nd = text != DASH
    n_nd = int(np.count_nonzero(nd))
    if pos + n_nd > seq_len:
        # locate the first offending position for the exact message
        over = pos + n_nd - 1
        _fatal(f"maf position {max(pos, seq_len)} >= fa size {seq_len}")
    positions = pos + np.cumsum(nd) - 1  # seq position per column (nd only)
    cols = np.nonzero(nd)[0]
    seqpos = positions[cols]
    if iupac2n:
        window = s[seqpos]
        good = np.isin(window, np.frombuffer(b"ACGTNacgtn", dtype=np.uint8))
        bad = seqpos[~good]
        if bad.size:
            w = s[bad]
            isup = (w >= ord("A")) & (w <= ord("Z"))
            s[bad] = np.where(isup, ord("N"), ord("n")).astype(np.uint8)
    up = lambda x: np.where(  # noqa: E731
        (x >= ord("a")) & (x <= ord("z")), x - 32, x
    )
    mism = up(text[cols].astype(np.int32)) != up(s[seqpos].astype(np.int32))
    if np.any(mism):
        _fatal(f"ref-seq mismatch at position {int(seqpos[np.argmax(mism)])}")


def _extract_blocks(
    alis: List[Ali], first_src: Optional[str], beg: int, end: int
) -> Tuple[List[Ali], Optional[str]]:
    """The extraction loop (maf2fasta.c:195-229): keep blocks of the
    reference src intersecting [next_pos, end], chopping overlaps."""
    out: List[Ali] = []
    next_pos = beg
    for a in alis:
        if not a.comps:
            _fatal("empty maf entry")
        c = a.comps[0]
        if first_src is None:
            first_src = c.src
        if c.src != first_src:
            continue
        # header-coordinate range filter (maf2fasta.c:202-205); start/end of
        # the contig enter via the caller's clamped beg/end, but the raw
        # check also uses the 1-based header start, passed through as
        # beg+1 below by the caller's clamping — replicate with the
        # caller-provided raw (start, endref) pair instead.
        if c.start + c.size <= next_pos:
            continue
        if c.start > end:
            break
        a = a.copy()
        c = a.comps[0]
        if c.start < next_pos:
            j = pos2col(c, next_pos)
            a = maf_slice(a, j, a.text_size)
            c = a.comps[0]
        next_pos = c.start + c.size
        if c.start + c.size > end + 1:
            j = pos2col(c, end)
            a = maf_slice(a, 0, j + 1)
        out.append(a)
    return out, first_src


def maf2fasta(
    seq_path: str,
    maf_path: str,
    BEG: int = 0,
    END: int = INT_MAX,
    fasta: int = 0,
    star: str = "-",
    iupac2n: bool = False,
    ref_src: Optional[str] = None,
    out=None,
) -> None:
    """Full tool (maf2fasta.c:108-372). fasta: 0=MultiPipMaker text,
    1=single-line FASTA, 2=COL_WIDTH-wrapped FASTA."""
    if out is None:
        out = sys.stdout
    if BEG > END:
        _fatal(f"BEG = {BEG} > END = {END}")
    contigs = read_fasta(seq_path)
    star_b = ord(star)

    for contig in contigs:
        meta = parse_header(seq_path, contig)
        s = contig.seq.copy()
        seq_len = int(s.shape[0])
        start, tail = meta.start, meta.end
        beg = max(BEG, start - 1)
        end = min(END, tail - 1)

        alis = read_maf(maf_path, verbose=False)

        # strand/coordinate range pre-filter (maf2fasta.c:202-205)
        def in_range(c) -> bool:
            if c.strand == "+":
                return not (c.start + 1 > end or c.start + c.size < start)
            return not (
                c.src_size - (c.start + c.size - 1) > end
                or c.src_size - c.start < start
            )

        first_src = ref_src
        filt: List[Ali] = []
        for a in alis:
            if not a.comps:
                _fatal("empty maf entry")
            c = a.comps[0]
            if first_src is None:
                first_src = c.src
            if c.src != first_src:
                continue
            if not in_range(c):
                continue
            filt.append(a)
        blocks, _ = _extract_blocks(filt, first_src, beg, end)
        if not blocks:
            continue

        # pass 2: names graph + ncol (maf2fasta.c:237-285)
        g = _NameGraph()
        ncol = 0
        next_pos = beg
        for a in blocks:
            c = a.comps[0]
            if c.start < next_pos:
                _fatal(f"alignments out of order at pos {c.start}")
            _check_ref(c, s, seq_len, a.text_size, start, iupac2n)
            ncol += c.start - next_pos + a.text_size
            next_pos = c.start + c.size
            ref_name = c.name
            if not g.order:
                g.order = [ref_name]
                g.follows[ref_name] = []
            elif g.order[0] != ref_name:
                _fatal(
                    f"conflicting ref-seq names: {g.order[0]} and {ref_name}"
                )
            m = g.order[0]
            for d in a.comps[1:]:
                nm = d.name
                if nm not in g.follows:
                    g.add_after(m, nm)
                g.add_edge(m, nm)
                m = nm
        ncol += end - next_pos + 1

        row_name = _toposort(g)
        nrow = len(row_name)
        row_idx = {nm: i for i, nm in enumerate(row_name)}

        # rasterize (maf2fasta.c:296-334), vectorized
        row = np.full((nrow, ncol), star_b, dtype=np.uint8)
        col = 0
        next_pos = beg
        for a in blocks:
            c = a.comps[0]
            if c.start > next_pos:
                w = c.start - next_pos
                row[0, col : col + w] = s[
                    next_pos - start + 1 : next_pos - start + 1 + w
                ]
                col += w
            ts = a.text_size
            seen = set()
            for d in a.comps:
                i = row_idx[d.name]
                if i in seen:  # C takes the first matching comp per row
                    continue
                seen.add(i)
                row[i, col : col + ts] = d.text
            next_pos = c.start + c.size
            col += ts
        if ncol > col:
            w = ncol - col
            row[0, col:] = s[next_pos - start + 1 : next_pos - start + 1 + w]

        if beg != 0 or end != seq_len - 1:
            row_name = list(row_name)
            row_name[0] = f"{row_name[0]}:{beg}-{end}"

        if fasta == 1:
            for i in range(nrow):
                out.write(f">{row_name[i]}\n")
                out.write(row[i].tobytes().decode("latin-1") + "\n")
        elif fasta == 2:
            for i in range(nrow):
                out.write(f">{row_name[i]}\n")
                r = row[i].tobytes().decode("latin-1")
                for j in range(0, ncol, COL_WIDTH):
                    out.write(r[j : j + COL_WIDTH] + "\n")
        else:
            out.write(f"{nrow} {ncol}\n")
            for i in range(nrow):
                out.write(f"{row_name[i]}\n")
            for i in range(nrow):
                out.write(row[i].tobytes().decode("latin-1") + "\n")
