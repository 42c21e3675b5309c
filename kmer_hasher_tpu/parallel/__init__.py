"""Multi-chip / multi-host parallelism.

Imports are lazy so that ``kmer_hasher_tpu.parallel.distributed`` can be
used to call ``jax.distributed.initialize`` *before* anything initialises
the XLA backend (a hard requirement of multi-host bring-up).
"""

__all__ = ["make_mesh", "make_hierarchical_mesh", "ShardedKmerIndex",
           "ShardedCountStore", "kmer_pairs_sharded",
           "iter_kmer_pairs_sharded_chunks"]


def __getattr__(name):
    if name in ("make_mesh", "make_hierarchical_mesh"):
        from . import mesh

        return getattr(mesh, name)
    if name in ("ShardedKmerIndex", "ShardedCountStore",
                "kmer_pairs_sharded", "iter_kmer_pairs_sharded_chunks"):
        from . import sharded

        return getattr(sharded, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
