"""Shared test-data simulator: genomes, shotgun PE reads, long reads."""

import numpy as np

BASES = np.array(list("ACGT"))
COMP = str.maketrans("ACGTN", "TGCAN")


def rc(s: str) -> str:
    return s.translate(COMP)[::-1]


def canon(s: str) -> str:
    return min(s, rc(s))


def random_genome(rng, n: int) -> str:
    return "".join(rng.choice(BASES, size=n))


def mutate(rng, seq: str, rate: float) -> str:
    if rate <= 0:
        return seq
    arr = np.array(list(seq))
    mask = rng.random(len(arr)) < rate
    subs = rng.choice(BASES, size=mask.sum())
    # force a real substitution
    same = subs == arr[mask]
    while same.any():
        subs[same] = rng.choice(BASES, size=same.sum())
        same = subs == arr[mask]
    arr[mask] = subs
    return "".join(arr)


def shotgun_reads(rng, genome: str, read_len: int, coverage: float,
                  error_rate: float = 0.0, circular: bool = False) -> list[str]:
    """Uniform single-end shotgun reads from both strands."""
    g = genome + genome[:read_len] if circular else genome
    n_reads = int(len(genome) * coverage / read_len)
    max_start = len(g) - read_len
    starts = rng.integers(0, max_start + 1, size=n_reads)
    out = []
    for s in starts:
        r = g[s:s + read_len]
        if rng.random() < 0.5:
            r = rc(r)
        out.append(mutate(rng, r, error_rate))
    return out


def paired_reads(rng, genome: str, read_len: int, insert: int, sd: int,
                 coverage: float, error_rate: float = 0.0,
                 circular: bool = False) -> tuple[list[str], list[str]]:
    """Innie PE pairs (fwd read + revcomp of fragment end), platanus -IP style."""
    g = genome + genome[:insert + 4 * sd] if circular else genome
    n_pairs = int(len(genome) * coverage / (2 * read_len))
    fwd, rev = [], []
    for _ in range(n_pairs):
        ins = max(2 * read_len, int(rng.normal(insert, sd)))
        start = int(rng.integers(0, max(len(g) - ins, 1)))
        frag = g[start:start + ins]
        if len(frag) < 2 * read_len:
            continue
        r1, r2 = frag[:read_len], rc(frag[-read_len:])
        if rng.random() < 0.5:
            r1, r2 = r2, r1
        fwd.append(mutate(rng, r1, error_rate))
        rev.append(mutate(rng, r2, error_rate))
    return fwd, rev


def long_reads(rng, genome: str, mean_len: int, coverage: float,
               error_rate: float = 0.05) -> list[str]:
    n = max(1, int(len(genome) * coverage / mean_len))
    out = []
    for _ in range(n):
        L = max(500, int(rng.exponential(mean_len)))
        L = min(L, len(genome))
        s = int(rng.integers(0, len(genome) - L + 1))
        r = genome[s:s + L]
        if rng.random() < 0.5:
            r = rc(r)
        out.append(mutate(rng, r, error_rate))
    return out


def write_fasta(path, seqs, prefix="r"):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{prefix}{i}\n{s}\n")
