"""kmer_hasher_tpu — a TPU-native k-mer indexing and counting engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lmjakt/kmer_hasheR (an R/C extension built on khash): 2-bit packed k-mer
position indexes and dot-plot coordinate extraction, cross-sequence queries,
quality-aware canonical k-mer counting over FASTA/FASTQ, k-mer spectra and
per-position depth tracks — replacing pointer-chasing hash tables with
sort-based segmented grouping over dense arrays, sharded across TPU meshes
by k-mer key.

Public API lives in :mod:`kmer_hasher_tpu.api` and mirrors the reference's R
surface (kmer_hash.R:5-96) with typed configs instead of positional int
vectors.
"""

__version__ = "0.1.0"

from . import refsem  # noqa: F401  (parity oracle, import-light)

__all__ = ["refsem", "__version__"]
