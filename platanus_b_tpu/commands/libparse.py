"""Numbered paired-library CLI syntax: -IP{n}/-ip{n}/-OP{n}/-op{n}.

Reproduces BaseCommand's pair-file option handling (baseCommand.h:52-68,
baseCommand.cpp divideArgvInt): the numeric suffix is the library ID,
-IP/-OP take fwd/rev file pairs, -ip/-op take interleaved files, and
-op/-OP (outward mate pairs) are reverse-complemented at load time into
innie orientation (seqlib.cpp:398-401).

argparse cannot express dynamic flag names, so callers pre-extract these
tokens from argv with extract_library_args() before argparse runs.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np

from ..io.fasta import iter_reads, seq_to_codes
from ..io.reads import pack_reads, revcomp_codes
from ..models.seqlib import PairLibrary
from ..utils.errors import ArgError, IOError_

PAIR_FLAG_RE = re.compile(r"^-(IP|ip|OP|op)(\d+)$")


@dataclass
class LibrarySpec:
    lib_id: int
    entries: list = field(default_factory=list)  # (type, [files...])


def extract_library_args(argv: list[str]) -> tuple[list[str], list[LibrarySpec]]:
    """Split argv into (argparse-able remainder, ordered library specs)."""
    rest: list[str] = []
    by_id: dict[int, LibrarySpec] = {}
    i = 0
    while i < len(argv):
        m = PAIR_FLAG_RE.match(argv[i])
        if not m:
            rest.append(argv[i])
            i += 1
            continue
        kind, lid = m.group(1), int(m.group(2))
        files = []
        i += 1
        while i < len(argv) and not argv[i].startswith("-"):
            files.append(argv[i])
            i += 1
        if not files:
            raise ArgError(f"-{kind}{lid}: no files given")
        if kind in ("IP", "OP") and len(files) % 2 != 0:
            raise ArgError(f"-{kind}{lid}: needs fwd/rev file pairs")
        spec = by_id.setdefault(lid, LibrarySpec(lib_id=lid))
        spec.entries.append((kind, files))
    return rest, [by_id[k] for k in sorted(by_id)]


def _load_seqs(path: str) -> list[np.ndarray]:
    if not os.path.exists(path):
        raise IOError_(f"cannot open file: {path}")
    from ..io.fasta import bulk_fasta_codes
    bulk = bulk_fasta_codes(path)
    if bulk is not None:
        mat, lengths = bulk
        return [mat[i, : lengths[i]] for i in range(len(lengths))]
    return [seq_to_codes(s) for _n, s in iter_reads(path)]


def load_pair_library(spec: LibrarySpec) -> PairLibrary:
    """Load all entries of one library ID into a single PairLibrary."""
    fwd: list[np.ndarray] = []
    rev: list[np.ndarray] = []
    for kind, files in spec.entries:
        mate = kind in ("op", "OP")
        if kind in ("ip", "op"):
            for path in files:
                seqs = _load_seqs(path)
                if len(seqs) % 2 != 0:
                    raise ArgError(f"{path}: the number of read is odd in file.")
                fwd.extend(seqs[0::2])
                rev.extend(seqs[1::2])
                if mate:
                    n = len(seqs) // 2
                    fwd[-n:] = [_rc(s) for s in fwd[-n:]]
                    rev[-n:] = [_rc(s) for s in rev[-n:]]
        else:
            for f1, f2 in zip(files[0::2], files[1::2]):
                s1, s2 = _load_seqs(f1), _load_seqs(f2)
                if len(s1) != len(s2):
                    raise ArgError(f"{f1}/{f2}: unequal pair counts")
                if mate:
                    s1 = [_rc(s) for s in s1]
                    s2 = [_rc(s) for s in s2]
                fwd.extend(s1)
                rev.extend(s2)
    fb = pack_reads(fwd)
    rb = pack_reads(rev)
    return PairLibrary(fb.codes, fb.lengths, rb.codes, rb.lengths)


def _rc(codes: np.ndarray) -> np.ndarray:
    out = codes[::-1].copy()
    mask = out < 4
    out[mask] = 3 - out[mask]
    return out


def load_libraries(specs: list[LibrarySpec]) -> list[PairLibrary]:
    return [load_pair_library(s) for s in specs]
