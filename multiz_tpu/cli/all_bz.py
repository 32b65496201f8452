"""CLI mirroring all_bz (all_bz.c:270-428).

args: [-+] [b=?] [A=?] [F=reference] [T=annotation-file] [h=?] [q=?]
      [D=?] [f=?] species-guide-tree [blastz_specfile]
"""

from __future__ import annotations

import sys

from ..all_bz import AllBz, AllBzError, Specs, VERSION


def main(argv=None, out=None, err=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    err = err or sys.stderr

    execute, verbose = True, False
    if argv and argv[0] == "-":
        execute, verbose = False, True
        argv.pop(0)
    elif argv and argv[0] == "+":
        verbose = True
        argv.pop(0)

    kw = dict(execute=execute, verbose=verbose)
    while argv and len(argv[0]) >= 2 and argv[0][1] == "=" and \
            argv[0][0] in "bAFThqscDf":
        k, v = argv[0][0], argv[0][2:]
        tok = argv.pop(0)
        if k == "b":
            kw["run_bz"] = int(v)
            if kw["run_bz"] not in (0, 1, 2):
                err.write("argument b can only be 0, 1, 2.\n")
                return 1
        elif k == "A":
            kw["post_proc"] = int(v)
            if kw["post_proc"] not in (0, 1, 2):
                err.write("argument A can only be 0, 1 or 2.\n")
                return 1
        elif k == "F":
            kw["reference"] = v
        elif k == "T":
            kw["annotation_file"] = "A=" + v
        elif k == "f":
            kw["inflation"] = tok
        elif k == "h":
            kw["min_chain"] = tok
        elif k == "q":
            kw["min_cluster"] = tok
        elif k == "s":
            kw["singleton"] = tok
        elif k == "D":
            kw["run_tba"] = int(v)
            if kw["run_tba"] not in (0, 1):
                err.write("argument D can only be 0, 1.\n")
                return 1
        elif k == "c":
            kw["close_alignment"] = tok

    if len(argv) == 2:
        with open(argv[1]) as fh:
            kw["specs"] = Specs.parse(fh.read())
        argv.pop()
    if len(argv) != 1:
        err.write(
            f"all_bz.v{VERSION}: args = [-+] [b=?] [A=?] [F=reference] "
            "[T=?] [h=?] [q=?] [D=?] [f=?] tree [specfile]\n"
        )
        return 1

    try:
        return AllBz(tree=argv[0], **kw).run(out=out, err=err)
    except AllBzError as e:
        err.write(f"all_bz.v{VERSION}: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
