"""Multi-chip sharded k-mer counting == single-device counting (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simdata

from platanus_b_tpu.models.assemble_core import count_reads
from platanus_b_tpu.io.reads import pack_reads
from platanus_b_tpu.parallel.sharding import count_reads_sharded, make_mesh


@pytest.mark.parametrize("k", [15, 32, 48])
def test_sharded_count_matches_single_device(rng, k):
    genome = simdata.random_genome(rng, 3000)
    batch = pack_reads(simdata.shotgun_reads(rng, genome, 80, 12.0))
    codes = batch.codes
    mesh = make_mesh()
    assert mesh.devices.size == 8

    keys_s, counts_s, hist_s, dropped = count_reads_sharded(mesh, codes, k)
    assert dropped == 0

    table, hist = count_reads([batch], k)
    np.testing.assert_array_equal(keys_s, table.keys)
    np.testing.assert_array_equal(counts_s, table.counts)
    np.testing.assert_array_equal(hist_s[: len(hist)], hist)


def test_sharded_count_disjoint_ownership(rng):
    # each shard owns a disjoint hash slice: no key appears on two shards
    genome = simdata.random_genome(rng, 2000)
    codes = pack_reads(simdata.shotgun_reads(rng, genome, 60, 6.0)).codes
    mesh = make_mesh()
    keys_s, counts_s, _, dropped = count_reads_sharded(mesh, codes, 21)
    assert dropped == 0
    uniq = {tuple(row) for row in keys_s}
    assert len(uniq) == len(keys_s)
