"""platanus_b_tpu — TPU-native de novo bacterial genome assembler.

A from-scratch re-design of the capabilities of Platanus_B v1.3.2
(reference: rkajitani/Platanus_B) for TPU hardware using JAX/XLA/Pallas.

Architecture (TPU-first, not a port):

- Reads live as padded 2-bit arrays with N-masks (``io.reads``) instead of
  per-thread temporary files (reference: seqlib.cpp:365-741).
- K-mers are width-parametric little arrays of uint32 words (``ops.kmer``)
  instead of Kmer31/KmerN template ladders (reference: kmer.h:34-310).
- Counting is deterministic sort-and-segment-reduce on device (``ops.count``)
  instead of a lock-striped open-addressing hash with out-of-core spill
  passes (reference: counter.h:276-383, doubleHash.h).
- The de Bruijn graph is an array-of-nodes with adjacency computed by bulk
  table lookups, and unitigs are traced with pointer-doubling list ranking
  (``models.dbg``) instead of a sequential DFS (reference: graph.h:290-579).
- Graph cleaning (tips, bubbles, low-coverage nodes) is masked bulk rounds
  iterated to a fixed point (``models.clean``), mirroring the reference's
  *Iterative loops (graph.h:1830-1870) without locks.
- Multi-chip scale-out shards k-mer space by hashed prefix with an
  all-to-all shuffle over a jax.sharding.Mesh (``parallel``), replacing
  OpenMP threads + tmp-file spill (reference: counter.h:341-364).
"""

__version__ = "0.1.0"
REFERENCE_VERSION = "1.3.2"  # platanus_b version we reproduce (common.cpp:26)
