"""Sequence file I/O: multi-contig FASTA (and UCSC .nib) readers.

Replaces the reference seq layer (seq.c:139-495, nib.c:14-39) with
vectorized NumPy readers. Header metadata follows parseHeader
(multi_util.c:311-322): ``>name:chr:start-end:strand:size`` or
``>name:chr:start:strand:size``; otherwise the filename-based fallback of
parseMSAHeader (multi_util.c:300-305).
"""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np


@dataclass
class Contig:
    header: str  # full '>' line (without newline)
    seq: np.ndarray  # uint8


@dataclass
class ContigMeta:
    name: str
    contig: str
    start: int  # 1-based inclusive
    end: int  # inclusive
    strand: str
    size: int


_H6 = re.compile(r"^>([^:]+):([^:]+):(\d+)-(\d+):(.):(\d+)")
_H5 = re.compile(r"^>([^:]+):([^:]+):(\d+):(.):(\d+)")


def parse_header(fn: str, contig: Contig) -> ContigMeta:
    """parseHeader (multi_util.c:311-322) + filename fallback."""
    h = contig.header
    m = _H6.match(h)
    if m:
        return ContigMeta(
            m.group(1), m.group(2), int(m.group(3)), int(m.group(4)),
            m.group(5), int(m.group(6)),
        )
    m = _H5.match(h)
    if m:
        start = int(m.group(3))
        return ContigMeta(
            m.group(1), m.group(2), start,
            start + int(contig.seq.shape[0]) - 1, m.group(4), int(m.group(5)),
        )
    # 17-field ENCODE/MSA headers (multi_util.c:261-299) then plain fallback
    fields = h[1:].split("|")
    if len(fields) >= 18:
        a = fields
        if all(a[i] != "." for i in (0, 7, 8, 9, 10, 11)):
            start = int(a[8])
            return ContigMeta(
                a[0], a[7], start, start + int(contig.seq.shape[0]) - 1,
                a[11][0], int(a[10]),
            )
        if all(a[i] != "." for i in (0, 15, 13, 11)):
            end = int(a[13])
            return ContigMeta(a[0], a[15], 1, end, a[11][0], end)
    n = int(contig.seq.shape[0])
    base = fn
    return ContigMeta(base, base, 1, n, "+", n)


def read_fasta(path: str) -> List[Contig]:
    with open(path, "rb") as fh:
        data = fh.read()
    out: List[Contig] = []
    pos = 0
    if not data.lstrip().startswith(b">"):
        raise ValueError(f"{path}: not a FASTA file")
    chunks = data.split(b"\n>")
    for i, ch in enumerate(chunks):
        if i == 0:
            ch = ch.lstrip()
            if not ch.startswith(b">"):
                continue
            ch = ch[1:]
        nl = ch.find(b"\n")
        if nl < 0:
            header, body = ch, b""
        else:
            header, body = ch[:nl], ch[nl + 1 :]
        seq = np.frombuffer(
            body.replace(b"\n", b"").replace(b"\r", b""), dtype=np.uint8
        ).copy()
        out.append(Contig(">" + header.decode("latin-1"), seq))
    return out


# --------------------------------------------------------------------------
# UCSC .nib: 2 bases/byte; T/C/A/G/N = 0-4, high bit = repeat-masked
# (nib.c:14-39)
# --------------------------------------------------------------------------

NIB_MAGIC = 0x6BE93D3A
_NIB_CHARS = np.frombuffer(b"TCAGN---", dtype=np.uint8)
_NIB_LOWER = np.frombuffer(b"tcagn---", dtype=np.uint8)


def read_nib(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        magic, length = struct.unpack("<II", fh.read(8))
        if magic != NIB_MAGIC:
            magic, length = struct.unpack(">II", struct.pack("<II", magic, length))
            if magic != NIB_MAGIC:
                raise ValueError(f"{path}: bad nib signature")
        raw = np.frombuffer(fh.read((length + 1) // 2), dtype=np.uint8)
    hi = raw >> 4
    lo = raw & 0x0F
    codes = np.empty(raw.shape[0] * 2, dtype=np.uint8)
    codes[0::2] = hi
    codes[1::2] = lo
    codes = codes[:length]
    masked = (codes & 0x8) != 0
    base = codes & 0x7
    out = np.where(masked, _NIB_LOWER[base], _NIB_CHARS[base])
    return out.astype(np.uint8)


def write_nib(path: str, seq: np.ndarray) -> None:
    code_of = np.full(256, 4, dtype=np.uint8)  # default N
    for i, ch in enumerate(b"TCAGN"):
        code_of[ch] = i
    for i, ch in enumerate(b"tcagn"):
        code_of[ch] = i | 0x8
    codes = code_of[seq]
    if codes.shape[0] % 2:
        codes = np.concatenate([codes, np.zeros(1, dtype=np.uint8)])
    packed = (codes[0::2] << 4) | codes[1::2]
    with open(path, "wb") as fh:
        fh.write(struct.pack("<II", NIB_MAGIC, int(seq.shape[0])))
        fh.write(packed.tobytes())
