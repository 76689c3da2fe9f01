"""Thin orchestrator commands: divide, consensus, phase (L6 wrappers).

The reference implements these as fork/exec wrappers around solve_DBG /
gap_close (divide.cpp:94-127, consensus.cpp:122-131, phase.cpp:112-139);
here they are in-process calls.
"""

from __future__ import annotations

import os

from ..utils.errors import ArgError, IOError_
from ..utils.log import LOG


def _lib_argv(libspecs) -> list[str]:
    out = []
    for spec in libspecs:
        for kind, files in spec.entries:
            out.append(f"-{kind}{spec.lib_id}")
            out.extend(files)
    return out


def _call(argv, stage):
    from .main import main as cli_main
    rc = cli_main(argv)
    if rc != 0:
        raise IOError_(f"{stage} failed with code {rc}")


def add_parsers(sub) -> None:
    d = sub.add_parser("divide", help="divide erroneous sequences")
    d.add_argument("-o", default="out")
    d.add_argument("-c", nargs="+", default=[])
    d.add_argument("-p", nargs="+", default=[])
    d.add_argument("-ont", nargs="+", default=[])
    d.add_argument("-gc", nargs="+", default=[])
    d.add_argument("-t", type=int, default=1)
    d.add_argument("-tmp", default=".")
    d.set_defaults(func=run_divide)

    c = sub.add_parser("consensus", help="consensus scaffolding wrapper")
    c.add_argument("-o", default="out")
    c.add_argument("-c", nargs="+", default=[])
    c.add_argument("-p", nargs="+", default=[])
    c.add_argument("-ont", nargs="+", default=[])
    c.add_argument("-l", type=int, default=3)
    c.add_argument("-u", type=float, default=0.0)
    c.add_argument("-t", type=int, default=1)
    c.add_argument("-tmp", default=".")
    c.add_argument("-reduce_redundancy", action="store_true")
    c.set_defaults(func=run_consensus)

    p = sub.add_parser("phase", help="phasing rounds (consensus subset)")
    p.add_argument("-o", default="out")
    p.add_argument("-c", nargs="+", default=[])
    p.add_argument("-i", type=int, default=2)
    p.add_argument("-p", nargs="+", default=[])
    p.add_argument("-ont", nargs="+", default=[])
    p.add_argument("-t", type=int, default=1)
    p.add_argument("-tmp", default=".")
    p.set_defaults(func=run_phase)


def run_divide(args) -> int:
    """divide.cpp:94-127: wrapper over solve_DBG -divide_only."""
    if not args.c:
        raise ArgError("divide: no contig file given (-c)")
    argv = (["solve_dbg", "-divide_only", "-c"] + args.c
            + ["-o", args.o] + _lib_argv(getattr(args, "libspecs", [])))
    _call(argv, "divide")
    LOG.info("divide completed!")
    return 0


def run_consensus(args) -> int:
    """consensus.cpp:122-131: wrapper over solve_DBG -unphase."""
    if not args.c:
        raise ArgError("consensus: no contig file given (-c)")
    argv = (["solve_dbg", "-unphase", "-c"] + args.c
            + ["-o", args.o, "-l", str(args.l), "-u", str(args.u)]
            + (["-reduce_redundancy"] if args.reduce_redundancy else [])
            + _lib_argv(getattr(args, "libspecs", [])))
    _call(argv, "consensus")
    LOG.info("consensus completed!")
    return 0


def run_phase(args) -> int:
    """phase.cpp:112-139: rounds of solve_DBG + gap_close.

    Round-1 deviation (documented): uses the consensus (-unphase) flow;
    haplotype phasing outputs (_primaryBubble.fa etc.) are not produced.
    """
    if not args.c:
        raise ArgError("phase: no contig file given (-c)")
    libargv = _lib_argv(getattr(args, "libspecs", []))
    current = args.c
    for t in range(1, args.i + 1):
        prefix = f"{args.o}_phase{t}"
        _call(["solve_dbg", "-unphase", "-reduce_redundancy", "-c"]
              + current + ["-o", prefix] + libargv, f"phase round {t}")
        _call(["gap_close", "-reduce_redundancy",
               "-c", f"{prefix}_consensusScaffold.fa",
               "-o", prefix] + libargv, f"phase gap_close {t}")
        current = [f"{prefix}_gapClosed_consensusScaffold.fa"]
    import shutil
    shutil.copyfile(current[0], f"{args.o}_finalSeq.fa")
    LOG.info("phase completed!")
    return 0
