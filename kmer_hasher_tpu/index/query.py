"""Cross-sequence queries against a KmerIndex.

``seq_kmer_pos``: the dot-plot query (src/kmer_pos.c:101-136,
src/kmer_hash.c:1151-1172) — stream a query sequence, and for every query
k-mer present in the index emit one (i, j) row per indexed position, where
``i`` is the 1-based position of the window's LAST base in the query (the
reference pushes the post-window index, src/kmer_pos.c:127,131-132) and
``j`` the 1-based start in the indexed sequence. Row order is query-stream
order with ascending j within a window — bitwise identical to the C output.

``kmer_pairs``: positions cross-product for k-mers shared by two indexes
(intended semantics of the reference's crash-prone ``kmer_pair_pos``,
src/kmer_hash.c:1174-1203).

Both emit through fixed-capacity chunks: hit counts are data-dependent, so
a cumulative-offset + binary-search gather maps each output slot to its
source window — XLA-friendly static shapes, host drains chunk by chunk.
"""
from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encode as enc
from ..ops import expand as exp
from ..ops import sort as srt
from .position_index import KmerIndex

I32 = jnp.int32
I64 = jnp.int64


@functools.partial(jax.jit, static_argnames=("k",))
def _query_ranges(s_hi, s_lo, n_valid, query_u8, k: int, true_len):
    """Encode the query and find each window's (lb, count) in the index."""
    hi, lo, valid = enc.encode_stream(
        query_u8, k, true_len, canonical=False, drop_trailing_exact_k=True
    )
    lb, ub = srt.lookup_bounds(s_hi, s_lo, n_valid, hi, lo)
    c = jnp.where(valid, ub - lb, 0).astype(I32)
    cum_c = jnp.cumsum(c.astype(I64))
    return lb, c, cum_c


@functools.partial(jax.jit, static_argnames=("k", "capacity"))
def _hit_chunk(s_pos, lb, c, cum_c, k: int, start, capacity: int):
    g = start + jnp.arange(capacity, dtype=I64)
    L = lb.shape[0]
    w = srt.expand_rank_i64(cum_c, g, L)
    t = (g - (cum_c[w] - c[w])).astype(I32)
    i_col = w + k  # 1-based query position of the window's last base
    j_col = s_pos[jnp.clip(lb[w] + t, 0, s_pos.shape[0] - 1)]
    ok = g < cum_c[L - 1]
    return jnp.stack([i_col, j_col], axis=1), ok


def iter_seq_kmer_pos_chunks(
    index: KmerIndex, query, k: int, capacity: int = 1 << 20
) -> Iterator[np.ndarray]:
    """Stream (i, j) hit rows in chunks."""
    if isinstance(query, str):
        query = np.frombuffer(query.encode(), np.uint8)
    elif isinstance(query, (bytes, bytearray)):
        query = np.frombuffer(bytes(query), np.uint8)
    query = np.asarray(query, np.uint8)
    if query.shape[-1] <= k or k > 31:
        raise ValueError(
            "the sequence should be longer than k and k should not be longer"
            " than 31"
        )
    true_len = query.shape[0]
    L_pad = 1 << max(6, (true_len - 1).bit_length())
    if L_pad != true_len:
        query = np.concatenate(
            [query, np.full(L_pad - true_len, ord("N"), np.uint8)]
        )
    lb, c, cum_c = _query_ranges(
        index.s_hi, index.s_lo, jnp.asarray(index.n_valid, I32),
        jnp.asarray(query), k, true_len,
    )
    total = int(cum_c[-1])
    capacity = srt.clamp_chunk_capacity(capacity, total)
    if total and exp.use_plan(total, lb.shape[0], capacity):
        plan = exp.ExpansionPlan(c, (lb,), capacity)
        total_d = jnp.asarray(total, I64)
        start = 0
        while start < total:
            rows, ok = exp.hit_chunk_planned(
                index.s_pos, plan.cum, plan.run_start, plan.w,
                plan.cols[0], total_d, k, jnp.asarray(start, I64), capacity,
            )
            n_ok = int(np.asarray(ok).sum())
            yield np.asarray(rows)[:n_ok]
            start += capacity
        return
    start = 0
    while start < total:
        rows, ok = _hit_chunk(index.s_pos, lb, c, cum_c, k,
                              jnp.asarray(start, I64), capacity)
        n_ok = int(np.asarray(ok).sum())
        yield np.asarray(rows)[:n_ok]
        start += capacity
    if total == 0:
        yield np.zeros((0, 2), np.int32)


def seq_kmer_pos(index: KmerIndex, query, k: int) -> np.ndarray:
    """R entry ``seq.kmer.pos``: full (i, j) matrix."""
    return np.concatenate(list(iter_seq_kmer_pos_chunks(index, query, k)),
                          axis=0)


@jax.jit
def _pair_ranges(a_hi, a_lo, a_nv, b_hi, b_lo, b_nv):
    """For each live position of index a (sorted order), the matching range
    in index b."""
    lb, ub = srt.lookup_bounds(b_hi, b_lo, b_nv, a_hi, a_lo)
    live = jnp.arange(a_hi.shape[0], dtype=I32) < a_nv
    c = jnp.where(live, ub - lb, 0).astype(I32)
    cum_c = jnp.cumsum(c.astype(I64))
    return lb, c, cum_c


@functools.partial(jax.jit, static_argnames=("capacity",))
def _pair_hit_chunk(a_pos, b_pos, lb, c, cum_c, start, capacity: int):
    g = start + jnp.arange(capacity, dtype=I64)
    L = lb.shape[0]
    w = srt.expand_rank_i64(cum_c, g, L)
    t = (g - (cum_c[w] - c[w])).astype(I32)
    rows = jnp.stack(
        [a_pos[w], b_pos[jnp.clip(lb[w] + t, 0, b_pos.shape[0] - 1)]], axis=1
    )
    ok = g < cum_c[L - 1]
    return rows, ok


def iter_kmer_pairs_chunks(a: KmerIndex, b: KmerIndex,
                           capacity: int = 1 << 20,
                           _ranges=None) -> Iterator[np.ndarray]:
    """Stream the ``kmer.pairs`` cross-product in bounded chunks: the
    (a, b) position table of two repeat-rich indexes reproduces the
    reference's n*(n-1)/2 blow-up (README.md:80-89 on
    src/kmer_hash.c:1174-1203) if materialised — this iterator never
    holds more than one ``capacity``-row chunk."""
    lb, c, cum_c = _ranges if _ranges is not None else _pair_ranges(
        a.s_hi, a.s_lo, jnp.asarray(a.n_valid, I32),
        b.s_hi, b.s_lo, jnp.asarray(b.n_valid, I32),
    )
    total = int(cum_c[-1])
    capacity = srt.clamp_chunk_capacity(capacity, total)
    start = 0
    if total and exp.use_plan(total, lb.shape[0], capacity):
        plan = exp.ExpansionPlan(c, (lb, a.s_pos), capacity)
        total_d = jnp.asarray(total, I64)
        while start < total:
            rows, ok = exp.pair_hit_chunk_planned(
                b.s_pos, plan.cum, plan.run_start, plan.cols[1],
                plan.cols[0], total_d, jnp.asarray(start, I64), capacity,
            )
            n_ok = int(np.asarray(ok).sum())
            yield np.asarray(rows)[:n_ok]
            start += capacity
    while start < total:
        rows, ok = _pair_hit_chunk(a.s_pos, b.s_pos, lb, c, cum_c,
                                   jnp.asarray(start, I64), capacity)
        n_ok = int(np.asarray(ok).sum())
        yield np.asarray(rows)[:n_ok]
        start += capacity
    if total == 0:
        yield np.zeros((0, 2), np.int32)


def kmer_pairs(a: KmerIndex, b: KmerIndex, capacity: int = 1 << 20,
               max_pairs: "int | None" = None) -> np.ndarray:
    """R entry ``kmer.pairs``: (a, b) position cross-product over shared
    k-mers, sorted-key order, ascending positions. Thin collector over
    :func:`iter_kmer_pairs_chunks`; ``max_pairs`` guards against the
    blow-up (use the iterator to stream past it)."""
    ranges = _pair_ranges(
        a.s_hi, a.s_lo, jnp.asarray(a.n_valid, I32),
        b.s_hi, b.s_lo, jnp.asarray(b.n_valid, I32),
    )
    if max_pairs is not None:
        total = int(ranges[2][-1])
        if total > max_pairs:
            raise MemoryError(
                f"kmer.pairs has {total} rows > max_pairs={max_pairs}; "
                "stream them with iter_kmer_pairs_chunks instead")
    return np.concatenate(
        list(iter_kmer_pairs_chunks(a, b, capacity, _ranges=ranges)),
        axis=0)


def kmer_pairs_total(a: KmerIndex, b: KmerIndex) -> int:
    """Row count of the ``kmer.pairs`` table without materialising it."""
    _lb, _c, cum_c = _pair_ranges(
        a.s_hi, a.s_lo, jnp.asarray(a.n_valid, I32),
        b.s_hi, b.s_lo, jnp.asarray(b.n_valid, I32),
    )
    return int(cum_c[-1])
