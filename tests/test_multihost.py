"""Multi-host runtime utilities (parallel/multihost.py).

The collective paths are passthroughs at process_count()==1; the sharding
and merge logic is pure and testable by passing explicit (index, count).
"""

import numpy as np

from platanus_b_tpu.parallel import multihost as mh


def test_host_shard_partition():
    items = [f"f{i}" for i in range(10)]
    parts = [mh.host_shard(items, index=i, count=3) for i in range(3)]
    # disjoint cover
    flat = sorted(x for p in parts for x in p)
    assert flat == sorted(items)
    # balanced within 1
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_host_shard_single_process_identity():
    items = list(range(5))
    assert mh.host_shard(items) == items


def test_host_read_plan_small_files_round_robin(tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"r{i}.fa"
        p.write_text(">a\nACGT\n")
        paths.append(str(p))
    plans = [mh.host_read_plan(paths, index=i, count=2) for i in range(2)]
    got = sorted(p for plan in plans for (p, s, e) in plan)
    assert got == sorted(paths)
    assert all(s == 0 and e == -1 for plan in plans for (_, s, e) in plan)


def test_host_read_plan_splits_large_file(tmp_path):
    p = tmp_path / "big.fa"
    p.write_bytes(b"x" * 1000)
    plans = [mh.host_read_plan([str(p)], min_chunk=100, index=i, count=4)
             for i in range(4)]
    ranges = sorted((s, e) for plan in plans for (_, s, e) in plan)
    # contiguous byte-range partition of [0, 1000)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == 1000
    for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
        assert e0 == s1


def test_global_count_merge_sums_duplicates():
    # two "hosts" counted overlapping k-mer sets; with process_count()==1
    # the gather is identity, so feed the pre-concatenated tables
    keys = np.array([[1, 0], [2, 0], [2, 0], [3, 0], [1, 0]], np.uint32)
    counts = np.array([5, 7, 2, 1, 4], np.uint32)
    mk, mc = mh.global_count_merge(keys, counts)
    assert mk.tolist() == [[1, 0], [2, 0], [3, 0]]
    assert mc.tolist() == [9, 9, 1]
    assert mc.dtype == np.uint32


def test_global_count_merge_saturates():
    keys = np.array([[9, 9], [9, 9]], np.uint32)
    counts = np.array([0xFFFF - 2, 0xFFFF - 2], np.uint32)
    _, mc = mh.global_count_merge(keys, counts)
    assert mc.tolist() == [0xFFFF - 1]


def test_global_count_merge_empty():
    keys = np.zeros((0, 2), np.uint32)
    counts = np.zeros((0,), np.uint32)
    mk, mc = mh.global_count_merge(keys, counts)
    assert len(mk) == 0 and len(mc) == 0


def test_single_process_collectives_identity():
    x = np.arange(6).reshape(2, 3)
    assert np.array_equal(mh.host0_gather(x), x)
    assert np.array_equal(mh.all_hosts_concat(x), x)
    assert np.array_equal(mh.broadcast_from_host0(x), x)
    assert np.array_equal(mh.psum_histogram(x), x)
    assert mh.process_count() == 1
    assert mh.process_index() == 0
    assert mh.initialize() is False
