"""Read batches: padded 2-bit arrays with N masks.

Replaces the reference's SEQ records dealt round-robin into per-thread
temporary files (common.h:401-485, seqlib.cpp:365-741). On TPU the natural
layout is a dense ``(num_reads, max_len)`` uint8 code array (0..3 bases,
4 = N / padding) plus a length vector — ready to feed vectorized k-mer
extraction without any host-side re-parsing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Iterator, Sequence

import numpy as np

from .fasta import iter_reads, seq_to_codes
from ..utils.constants import BASE_N


@dataclass
class ReadBatch:
    """A dense batch of reads.

    codes:   (n, max_len) uint8, values 0..3 for ACGT, 4 for N or padding
    lengths: (n,) int32 true read lengths
    """

    codes: np.ndarray
    lengths: np.ndarray
    _packed: tuple | None = field(default=None, repr=False, compare=False)
    _has_n: bool | None = field(default=None, repr=False, compare=False)

    @property
    def has_n(self) -> bool:
        """True if any read contains an N base WITHIN its length (padding
        beyond the length does not count). N-free batches can skip the
        nmask upload (ops.count.count_packed_lens_hier)."""
        if self._has_n is None:
            L = self.codes.shape[1]
            in_read = np.arange(L)[None, :] < self.lengths[:, None]
            self._has_n = bool(((self.codes > 3) & in_read).any())
        return self._has_n

    @property
    def num_reads(self) -> int:
        return int(self.codes.shape[0])

    @property
    def max_len(self) -> int:
        return int(self.codes.shape[1])

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())

    def __len__(self) -> int:
        return self.num_reads

    def packed(self) -> tuple[np.ndarray, np.ndarray]:
        """2-bit packed upload form: (words, nmask) uint32 arrays.

        words (R2, L2//16): 16 bases per u32 word, base 0 in the top two
        bits; nmask (R2, L2//32): per-base N/padding flag, bit 31 first.
        R2 = pow2 row capacity (min 256), L2 = cols padded to a multiple
        of 32, padding marked N. This quarters host->device bytes — the
        dominant ingest cost over the device tunnel — and matches the
        reference's own 2-bit read storage (binstr.h:36-281). Cached, so
        packing is paid once per batch.
        """
        if self._packed is None:
            from ..ops.padding import next_pow2
            r, l = self.codes.shape
            r2 = next_pow2(r, minimum=256)
            l2 = -(-max(l, 1) // 32) * 32
            c = np.full((r2, l2), BASE_N, dtype=np.uint8)
            c[:r, :l] = self.codes
            isn = c > 3
            c2 = np.where(isn, 0, c).astype(np.uint32)
            v = c2.reshape(r2, l2 // 16, 16)
            words = np.zeros((r2, l2 // 16), dtype=np.uint32)
            for i in range(16):
                words |= v[:, :, i] << np.uint32(30 - 2 * i)
            b = isn.reshape(r2, l2 // 32, 32).astype(np.uint32)
            nmask = np.zeros((r2, l2 // 32), dtype=np.uint32)
            for i in range(32):
                nmask |= b[:, :, i] << np.uint32(31 - i)
            self._packed = (words, nmask)
        return self._packed


def pack_reads(seqs: Sequence[str | np.ndarray], max_len: int | None = None,
               pad_multiple: int = 1) -> ReadBatch:
    """Pack variable-length sequences into one padded code array."""
    codes_list = [seq_to_codes(s) if isinstance(s, str) else np.asarray(s, np.uint8)
                  for s in seqs]
    lengths = np.array([len(c) for c in codes_list], dtype=np.int32)
    if max_len is None:
        max_len = int(lengths.max()) if len(lengths) else 0
    if pad_multiple > 1:
        max_len = -(-max_len // pad_multiple) * pad_multiple
    out = np.full((len(codes_list), max_len), BASE_N, dtype=np.uint8)
    for i, c in enumerate(codes_list):
        out[i, : len(c)] = c[:max_len]
    lengths = np.minimum(lengths, max_len)
    return ReadBatch(out, lengths)


def load_read_batches(paths: Iterable[str], batch_size: int = 1 << 16,
                      max_len: int | None = None) -> Iterator[ReadBatch]:
    """Stream reads from files as dense batches.

    This is the data-loader half of the reference's ReadFasta*MT loaders
    (seqlib.cpp:365-741); decode + 2-bit encode runs in the native C++
    module when available; sharding across devices happens downstream via
    jax.sharding, not via per-thread files.
    """
    from . import fasta as fa
    from .. import native
    for path in paths:
        # multi-host ingest plan entries are (path, byte_start, byte_end)
        # (multihost.host_read_plan); plain paths read the whole file
        if isinstance(path, tuple):
            path, b0, b1 = path
            codes, starts = fa.load_codes(path, b0, b1)
        else:
            codes, starts = fa.load_codes(path)
        n = len(starts) - 1
        for b0 in range(0, max(n, 0), batch_size):
            b1 = min(b0 + batch_size, n)
            lens = (starts[b0 + 1: b1 + 1] - starts[b0: b1]).astype(np.int32)
            if len(lens) == 0:
                continue
            lmax = int(lens.max()) if max_len is None else max_len
            sub_codes = codes[starts[b0]: starts[b1]]
            sub_starts = (starts[b0: b1 + 1] - starts[b0]).astype(np.int64)
            mat = native.pack_rows(np.ascontiguousarray(sub_codes),
                                   sub_starts, lmax)
            yield ReadBatch(mat, np.minimum(lens, lmax))


def load_paired_batches(fwd_path: str, rev_path: str | None,
                        batch_size: int = 1 << 16,
                        max_len: int | None = None) -> Iterator[tuple[ReadBatch, ReadBatch]]:
    """Paired-end loader.

    Supports the reference's two layouts (baseCommand.h:52-68): separate
    -IP file pairs (fwd/rev files) and interleaved -ip files (rev_path None).
    """
    if rev_path is None:
        it = iter_reads(fwd_path)
        fwd_buf: list[str] = []
        rev_buf: list[str] = []
        while True:
            try:
                _n1, s1 = next(it)
                _n2, s2 = next(it)
            except StopIteration:
                break
            fwd_buf.append(s1)
            rev_buf.append(s2)
            if len(fwd_buf) >= batch_size:
                yield pack_reads(fwd_buf, max_len), pack_reads(rev_buf, max_len)
                fwd_buf, rev_buf = [], []
        if fwd_buf:
            yield pack_reads(fwd_buf, max_len), pack_reads(rev_buf, max_len)
    else:
        it1, it2 = iter_reads(fwd_path), iter_reads(rev_path)
        fwd_buf, rev_buf = [], []
        for (_n1, s1), (_n2, s2) in zip(it1, it2):
            fwd_buf.append(s1)
            rev_buf.append(s2)
            if len(fwd_buf) >= batch_size:
                yield pack_reads(fwd_buf, max_len), pack_reads(rev_buf, max_len)
                fwd_buf, rev_buf = [], []
        if fwd_buf:
            yield pack_reads(fwd_buf, max_len), pack_reads(rev_buf, max_len)


def revcomp_codes(codes: np.ndarray, lengths: np.ndarray | None = None) -> np.ndarray:
    """Reverse-complement padded code rows in place of their true lengths."""
    if lengths is None:
        comp = np.where(codes < 4, 3 - codes, codes)
        return comp[..., ::-1]
    out = np.full_like(codes, BASE_N)
    for i, L in enumerate(np.asarray(lengths)):
        L = int(L)
        seg = codes[i, :L]
        out[i, :L] = np.where(seg < 4, 3 - seg, seg)[::-1]
    return out
