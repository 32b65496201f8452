"""CLI mirroring maf_checkThread (maf_checkThread.c:9-37): verify the
threading condition (each block's top start past the previous end)."""

from __future__ import annotations

import sys

from ..maf import read_maf


def check_threading(alis) -> list:
    """Library form: return [(src, start), ...] violations."""
    errors = []
    last_end = -1
    for b in alis:
        c = b.comps[0]
        if c.start < last_end + 1:
            errors.append((c.src, c.start))
        last_end = c.start + c.size - 1
    return errors


def main(argv=None, out=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    if len(argv) < 1:
        raise SystemExit("args: maf-file")
    errors = check_threading(read_maf(argv[0], verbose=False))
    for src, start in errors:
        out.write(f"{src} not threaded at {start} ")
    out.write(f"Total Errors: {len(errors)}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
