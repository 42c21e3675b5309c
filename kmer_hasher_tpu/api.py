"""Public API — mirrors the reference's R surface (kmer_hash.R:5-96) with
typed arguments instead of positional integer vectors.

R name                      -> here
make.kmer.hash(seq,k,sort)  -> make_kmer_hash(seq, k, do_sort=False)
kmer.pos(ptr, opt.flag)     -> kmer_pos(index, opt_flag)
seq.kmer.pos(ptr, seq, k)   -> seq_kmer_pos(index, seq, k)
kmer.pairs(a, b)            -> kmer_pairs(a, b)
count.kmers(seq, params)    -> count_kmers(seqs, k, source, source_n, store)
count.kmers.fq(file, p)     -> count_kmers_fq(file, ...)      [kmer-tree mode]
count.kmers.fq.sh(file, p)  -> count_kmers_fq_sh(file, ...)
count.kmers.fq.sh.rp(...)   -> count_kmers_fq_sh_rp(file, ...)  [flagship]
seq.kmer.depth.sh(ptr,s,k)  -> seq_kmer_depth(store, seq, k)
kmer.spec.kt/sh(ptr, max)   -> kmer_spectrum(store, max_count)
kmer.spec.sh.n(...)         -> kmer_spectrum_n(store, max_count, comb, ...)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .index import KmerIndex
from .index.query import iter_seq_kmer_pos_chunks, kmer_pairs, seq_kmer_pos

__all__ = [
    "KmerIndex",
    "make_kmer_hash",
    "kmer_pos",
    "seq_kmer_pos",
    "iter_seq_kmer_pos_chunks",
    "kmer_pairs",
]


def make_kmer_hash(seq, k: int, do_sort: bool = False) -> KmerIndex:
    """Build a k-mer position index (``make.kmer.hash``,
    src/kmer_hash.c:506-540). ``do_sort`` accepted for parity; positions are
    always sorted here."""
    return KmerIndex(seq, k, do_sort=do_sort)


def kmer_pos(index: KmerIndex, opt_flag: int,
             max_pairs: Optional[int] = None) -> Dict:
    """Extract kmer/pos/pair.pos/count tables (``kmer.pos``,
    src/kmer_hash.c:1054-1147). Set ``max_pairs`` to guard against pair
    blow-ups, or use ``index.iter_pair_chunks()`` to stream."""
    return index.tables(opt_flag, max_pairs=max_pairs)
