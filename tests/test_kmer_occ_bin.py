"""kmer_occ.bin reference-format codec (counter.h:955-993 +
doubleHash.h:118-146,266-293 semantics)."""

import numpy as np

from platanus_b_tpu.ops import count as cnt


def _find_any(table_key, table_val, key, table_len):
    """Reference find_any (doubleHash.h:170-185) reimplemented verbatim."""
    L, S = cnt._doublehash_params(table_len)
    mask = np.uint64(table_len - 1)
    k = np.uint64(key)
    v = (k + (k >> np.uint64(L)) + (k >> np.uint64(S))) & mask
    if table_val[v] == 0 or table_key[v] == k:
        return int(v)
    step = (~k ^ (k >> np.uint64(L)) ^ (k >> np.uint64(S))) | np.uint64(1)
    v = (v + step) & mask
    while table_val[v] != 0:
        if table_key[v] == k:
            return int(v)
        v = (v + step) & mask
    return int(v)


def test_reference_format_roundtrip_and_probe(tmp_path):
    rng = np.random.default_rng(3)
    k = 32
    n = 5000
    key64 = np.unique(rng.integers(0, 1 << 63, n, dtype=np.uint64))
    keys = np.stack([(key64 >> np.uint64(32)).astype(np.uint32),
                     (key64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                    axis=1)
    counts = rng.integers(1, 1000, len(key64)).astype(np.uint32)
    path = str(tmp_path / "occ.bin")
    cnt.write_occurrence_table_binary(path, keys, counts, k)

    # round-trip through our reader
    k2, keys2, counts2 = cnt.read_occurrence_table_binary(path)
    assert k2 == k
    got = {int(cnt.pack_key64(keys2[i:i+1])[0]): int(counts2[i])
           for i in range(len(keys2))}
    want = {int(a): int(b) for a, b in zip(key64, counts)}
    assert got == want

    # the written table must be probe-consistent with the reference's
    # find_any: rebuild the sparse table and look every key up
    with open(path, "rb") as f:
        raw = f.read()
    assert int(np.frombuffer(raw[:8], np.uint64)[0]) == k
    table_len = int(np.frombuffer(raw[8:16], np.uint64)[0]) + 1
    assert table_len & (table_len - 1) == 0
    rec = np.frombuffer(raw[16:], dtype=np.dtype(
        [("slot", "<u8"), ("key", "<u8"), ("val", "<u2")], align=False))
    assert len(rec) == len(key64)
    assert (rec["val"] > 0).all()
    tk = np.zeros(table_len, np.uint64)
    tv = np.zeros(table_len, np.uint32)
    tk[rec["slot"]] = rec["key"]
    tv[rec["slot"]] = rec["val"]
    # load factor bound (common.cpp:34)
    assert len(rec) <= 0.9 * table_len
    for key, val in list(zip(key64, counts))[:500]:
        slot = _find_any(tk, tv, key, table_len)
        assert tv[slot] == val and tk[slot] == key


def test_internal_format_large_k(tmp_path):
    rng = np.random.default_rng(4)
    k = 48
    keys = rng.integers(0, 1 << 32, (100, 3)).astype(np.uint32)
    counts = rng.integers(1, 100, 100).astype(np.uint32)
    path = str(tmp_path / "occ48.bin")
    cnt.write_occurrence_table_binary(path, keys, counts, k)
    k2, keys2, counts2 = cnt.read_occurrence_table_binary(path)
    assert k2 == k
    assert np.array_equal(keys2, keys)
    assert np.array_equal(counts2, counts)
