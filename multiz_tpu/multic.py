"""multic: align two reference-topped blocksets that may contain paralogs.

Port of multic.c (v12.1): same interface as multiz but the reference rows
may contain duplicates (no single-coverage requirement). Every overlap on
the reference is force-aligned via pre_yama (multic.c:57-122), per-column
``unused`` maps track which input columns were consumed, and leftover
unused runs are emitted at the end (multic.c:228-254). Paralog color marks
('a' amplifier / 'c' copy) propagate per multic.c:76-96.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from . import scores as sc
from .blocks import make_part_ali, separate_by_src
from .maf import Ali, pos2col
from .preyama import pre_yama
from .yama import yama_numpy

USED = ord("o")
UNUSED = ord("u")


@dataclass
class MulticConfig:
    radius: int = 30  # R=
    min_output_wid: int = 1  # M=
    align_cate: int = 0  # s= (ALIGN_CATE, multic.c:38)
    connection_threshold: int = 50  # C= (align_util.c:7; parsed, unused)
    row2: int = 0  # 'all' also sets 0 (multic.c:318-321)
    color_row_name: Optional[str] = None  # only settable via dead 'c' flag
    dp_fn: Callable = yama_numpy


@dataclass
class AliNode:
    """struct aliNode (multic.c:41-45): a block + per-column use map."""

    ali: Ali
    unused: np.ndarray = field(init=False)  # uint8 'u'/'o'

    def __post_init__(self):
        self.unused = np.full(self.ali.text_size, UNUSED, np.uint8)


def any_identical_species(comps_a, comps_b) -> bool:
    """multic.c:47-55."""
    names_b = {c.name for c in comps_b}
    return any(c.name in names_b for c in comps_a)


def overlap_wrapper(
    a: AliNode, b: AliNode, v: int, out, cfg: MulticConfig,
    sp: sc.ScoreParams | None = None,
) -> None:
    """Force-align the reference overlap of two blocks (multic.c:57-122)."""
    comp_a = a.ali.comps[0]
    comp_b = b.ali.comps[0]
    a_end = comp_a.start + comp_a.size - 1
    b_end = comp_b.start + comp_b.size - 1
    over_beg = max(comp_a.start, comp_b.start)
    over_end = min(a_end, b_end)
    if over_beg > over_end:
        raise RuntimeError(f"there is no overlapping! {over_beg} {over_end}")
    nali = pre_yama(
        a.ali, b.ali, over_beg, over_end, cfg.radius, v, sp=sp,
        dp_fn=cfg.dp_fn,
    )
    if nali is None:
        return

    pa = a.ali.comps[0].paralog
    pb = b.ali.comps[0].paralog
    if pa == pb:
        nali.comps[0].paralog = pa
    elif pa == "a" and pb == "c":
        has_red = any(c.paralog == "c" for c in a.ali.comps[1:])
        nali.comps[0].paralog = "a" if has_red else "c"
    elif pa == "c" and pb == "a":
        has_red = any(c.paralog == "c" for c in b.ali.comps[1:])
        nali.comps[0].paralog = "a" if has_red else "c"

    over_beg = nali.comps[0].start
    over_end = nali.comps[0].start + nali.comps[0].size - 1
    if nali.text_size >= cfg.min_output_wid:
        out(nali)

    # mark used reference columns on both inputs (multic.c:104-121)
    for node, comp in ((a, comp_a), (b, comp_b)):
        if (over_beg < comp.start or over_beg > comp.start + comp.size - 1
                or over_end < comp.start
                or over_end > comp.start + comp.size - 1):
            raise RuntimeError(
                f"index out of boundary: {over_beg}-{over_end}, "
                f"{comp.start}-{comp.start + comp.size - 1}"
            )
        cbeg = pos2col(comp, over_beg)
        cend = pos2col(comp, over_end)
        node.unused[cbeg : cend + 1] = USED


def multih(
    A: List[AliNode], B: List[AliNode], v: int, out, cfg: MulticConfig,
    sp: sc.ScoreParams | None = None,
) -> None:
    """All-pairs overlap scan (multic.c:124-196)."""
    bk = 0  # sliding frontier into B
    for a in A:
        if cfg.align_cate == 2 and a.ali.comps[0].paralog == "a":
            continue
        copy_a = sum(1 for c in a.ali.comps[1:] if c.paralog == "c")
        if cfg.align_cate != 0 and copy_a > 1:
            raise RuntimeError(
                f"A: each block shall contain at most one copy paralog: "
                f"{copy_a}"
            )
        a_beg = a.ali.comps[0].start
        a_end = a_beg + a.ali.comps[0].size - 1
        while bk < len(B):
            c = B[bk].ali.comps[0]
            if c.start + c.size - 1 >= a_beg:
                break
            bk += 1
        if bk >= len(B):
            return
        for b in B[bk:]:
            if cfg.align_cate == 2 and b.ali.comps[0].paralog == "a":
                continue
            copy_b = sum(1 for c in b.ali.comps[1:] if c.paralog == "c")
            if cfg.align_cate != 0 and copy_b > 1:
                raise RuntimeError(
                    f"B: each block shall contain at most one copy "
                    f"paralog: {copy_b}"
                )
            if cfg.align_cate != 0 and copy_a > 0 and copy_b > 0:
                continue  # two non-ref red rows
            if b.ali.comps[0].start > a_end:
                break

            comps_a = a.ali.comps if v == 1 else a.ali.comps[1:]
            comps_b = b.ali.comps[1:]
            if any_identical_species(comps_a, comps_b):
                # species conflict: optionally color, never align
                if cfg.align_cate != 0 and copy_a == 0 and copy_b == 0:
                    b.ali.comps[0].paralog = "a"
                    if cfg.color_row_name is None:
                        raise RuntimeError("No COLOR_ROW_NAME specified!")
                    for c in b.ali.comps[1:]:
                        if c.name == cfg.color_row_name:
                            c.paralog = "c"
                            break
                    else:
                        raise RuntimeError("COLOR_ROW_NAME specified wrong!")
                continue

            b_end = b.ali.comps[0].start + b.ali.comps[0].size - 1
            if a_beg > b_end or b.ali.comps[0].start > a_end:
                continue
            overlap_wrapper(a, b, v, out, cfg, sp=sp)


def print_unused_ali_multic(
    node: AliNode, sink, sp: sc.ScoreParams | None = None
) -> None:
    """Emit maximal unused column runs of a block (multic.c:228-254)."""
    if sink is None:
        return
    size = node.ali.text_size
    unused = node.unused
    i = 0
    while i < size:
        while i < size and unused[i] == USED:
            i += 1
        if i >= size:
            break
        j = i
        while j < size and unused[j] == UNUSED:
            j += 1
        j -= 1
        nali = make_part_ali(node.ali, i, j, sp=sp)
        if nali is not None:
            sink(nali)
        i = j + 1


def multic(
    list1: List[Ali],
    list2: List[Ali],
    v: int,
    out,
    out1=None,
    out2=None,
    cfg: MulticConfig | None = None,
    sp: sc.ScoreParams | None = None,
) -> None:
    """Per-chromosome driver (multic.c:358-395). ``out`` receives merged
    blocks; ``out1``/``out2`` the unused pieces (default: same as out)."""
    if cfg is None:
        cfg = MulticConfig()
    out = _as_sink(out)
    out1 = _as_sink(out1) if out1 is not None else out
    out2 = _as_sink(out2) if out2 is not None else out
    cp1, cp2 = list(list1), list(list2)
    while cp1 and cp2:
        chrom = cp1[0].comps[0].src
        cp1, wk1 = separate_by_src(cp1, chrom)
        cp2, wk2 = separate_by_src(cp2, chrom)
        A = [AliNode(a) for a in wk1]
        B = [AliNode(a) for a in wk2]
        if A and B:
            multih(A, B, v, out, cfg, sp=sp)
        for nodes, sink in ((A, out1), (B, out2)):
            for node in nodes:
                if sink is not None and node.ali.text_size >= cfg.min_output_wid:
                    print_unused_ali_multic(node, sink, sp=sp)
    # leftover chromosomes (multic.c:387-395): row2 rule, no MIN_OUTPUT_WID
    for a in cp1:
        if out1 is not None and (cfg.row2 == 0 or len(a.comps) > 1):
            out1(a)
    for a in cp2:
        if out2 is not None and (cfg.row2 == 0 or len(a.comps) > 1):
            out2(a)


def _as_sink(out):
    if out is None or callable(out):
        return out
    from .maf import write_ali

    return lambda a: write_ali(out, a)
