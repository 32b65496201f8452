"""CLI mirroring blastzWrapper (blastzWrapper.c:80-147).

args: seqfile1 seqfile2 [lastz options...] — run lastz per contig pair
of two multi-contig FASTA files, rewriting the lav output's s/h
stanzas to restore contig identity (and swapping the two sequences
back when the inputs were reordered to put the fewer-contig file
first). All argv tokens after the two sequence files pass through to
lastz verbatim, as the reference's system() command line does.
"""

from __future__ import annotations

import sys

from ..blastz_wrapper import main

if __name__ == "__main__":
    sys.exit(main())
