"""Multi-source k-mer count store — sorted-array replacement for the
reference's counting backends (``kmer_tree`` src/kmer_tree.c, ``suffix_hash``
/ ``suffix_hash_n`` src/suffix_hash.c).

The reference keeps 2-level prefix->khash structures mutated one k-mer at a
time. Here counts live in a sorted unique-key table merged batch-at-a-time:
encode a batch of reads, sort, segment-reduce, and merge with the store
(concat + sort + segment-reduce again) — a log-structured merge that
replaces incremental ``kh_put``. Capacities grow in power-of-two buckets so
XLA recompilation stays rare.

Count semantics match ``suffix_hash_n`` (src/suffix_hash.c:180-281): up to
``counts_n`` per-source uint32 counters per k-mer. The ``kmer_tree`` mode
difference is observable only in spectra: its dense blocks contribute their
zero cells (src/kmer_tree.c:85-99), modelled here by prefix-block
accounting, not dense allocation.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sort as srt

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32


def _next_pow2(n: int) -> int:
    return 1 << max(6, int(n - 1).bit_length()) if n > 1 else 64


@functools.partial(jax.jit, static_argnames=("k",))
def _merge(s_hi, s_lo, s_cnt, n_store, b_hi, b_lo, b_valid, b_src_onehot, k: int):
    """Merge the store's (keys, counts) with a batch of single-count
    observations. Returns dense (keys, counts, n_unique) of combined size."""
    cap_s = s_hi.shape[0]
    cap_b = b_hi.shape[0]
    C = s_cnt.shape[1]
    live_s = jnp.arange(cap_s, dtype=I32) < n_store
    hi = jnp.concatenate([s_hi, b_hi])
    lo = jnp.concatenate([s_lo, b_lo])
    valid = jnp.concatenate([live_s, b_valid])
    idx = jnp.arange(cap_s + cap_b, dtype=I32)
    o_hi, o_lo, o_idx = srt.sort_windows(hi, lo, idx, valid, k)
    n_valid = valid.sum().astype(I32)
    live = jnp.arange(cap_s + cap_b, dtype=I32) < n_valid
    starts = srt.segment_starts(o_hi, o_lo, live)
    seg = srt.segment_ids(starts)
    cnt_all = jnp.concatenate(
        [s_cnt, jnp.broadcast_to(b_src_onehot[None, :], (cap_b, C)).astype(U32)]
    )
    rows = cnt_all[o_idx] * live[:, None].astype(U32)
    N = cap_s + cap_b
    tgt = jnp.where(live, seg, N - 1)
    new_cnt = jnp.zeros((N, C), U32).at[tgt].add(rows, mode="drop")
    stgt = jnp.where(starts, seg, N - 1)
    u_hi = jnp.zeros(N, U32).at[stgt].set(o_hi, mode="drop")
    u_lo = jnp.zeros(N, U32).at[stgt].set(o_lo, mode="drop")
    n_unique = starts.sum().astype(I32)
    return u_hi, u_lo, new_cnt, n_unique


@jax.jit
def _distinct_prefixes(u_hi, u_lo, n_unique, suffix_bits):
    """Number of distinct prefixes (kmer >> suffix_bits) among the sorted
    unique keys — the reference's allocated-block count."""
    key = (u_hi.astype(jnp.uint64) << jnp.uint64(32)) | u_lo.astype(jnp.uint64)
    pref = key >> suffix_bits.astype(jnp.uint64)
    live = jnp.arange(u_hi.shape[0], dtype=I32) < n_unique
    first = jnp.zeros(u_hi.shape, bool).at[0].set(True)
    changed = pref != jnp.roll(pref, 1)
    return ((first | changed) & live).sum().astype(I32)


@functools.partial(jax.jit, static_argnames=("max_count", "include_zeros"))
def _spectrum(cnt0, live, n_alloc_blocks, suffix_bits, n_unique,
              max_count: int, include_zeros: bool):
    c = jnp.minimum(cnt0.astype(I64), max_count)
    c = jnp.where(live, c, max_count + 1)  # park dead rows out of range
    spec = jnp.zeros(max_count + 2, jnp.float64).at[c].add(1.0)
    spec = spec[: max_count + 1]
    if include_zeros:
        total_cells = n_alloc_blocks.astype(I64) << suffix_bits.astype(I64)
        spec = spec.at[0].add((total_cells - n_unique).astype(jnp.float64))
    return spec


@functools.partial(jax.jit, static_argnames=("max_count", "comb_n"))
def _spectrum_nc(cnt, live, max_count: int, comb, comb_inner, source_min,
                 comb_n: int):
    """Combinatorial multi-source spectrum (sh_count_spectrum_nc,
    src/suffix_hash.c:335-425)."""
    C = cnt.shape[1]
    flags = ((cnt >= source_min[None, :].astype(U32)).astype(I32)
             * (1 << jnp.arange(C, dtype=I32))[None, :]).sum(axis=1)
    cl = jnp.minimum(cnt.astype(I64), max_count)  # [N, C]
    out = jnp.zeros((comb_n * C, max_count + 2), jnp.float64)
    for jj in range(comb_n):
        sel = jnp.where(
            comb_inner[jj] == 1,
            flags == comb[jj],
            (flags & comb[jj]) > 0,
        ) & live
        for s in range(C):
            col = jnp.where(sel, cl[:, s], max_count + 1)
            out = out.at[jj * C + s].add(
                jnp.zeros(max_count + 2, jnp.float64).at[col].add(1.0)
            )
    return out[:, : max_count + 1]


@jax.jit
def _lookup_counts(u_hi, u_lo, cnt, n_unique, q_hi, q_lo):
    lb = srt.searchsorted2(u_hi, u_lo, n_unique, q_hi, q_lo, "left")
    lb_c = jnp.clip(lb, 0, u_hi.shape[0] - 1)
    found = (lb < n_unique) & (u_hi[lb_c] == q_hi) & (u_lo[lb_c] == q_lo)
    rows = jnp.where(found[:, None], cnt[lb_c], 0)
    return rows.astype(I32)


class CountStore:
    """Sorted multi-source count table (``suffix_hash_n`` analogue).

    mode: 'sh' (suffix_hash / suffix_hash_n semantics — spectra over present
    k-mers), 'ktree' (kmer_tree — spectra include the zero cells of
    allocated prefix blocks), or 'khash' (the in-memory ``count.kmers``
    store — no prefix structure).
    """

    def __init__(self, k: int, counts_n: int = 1, prefix_bits: int = 0,
                 suffix_bits: Optional[int] = None, mode: str = "sh",
                 max_size_bytes: Optional[int] = None):
        if not 1 <= k <= 32:
            raise ValueError("k must be in 1..32")
        if counts_n < 1:
            raise ValueError("counts_n must be >= 1")
        if mode not in ("sh", "ktree", "khash"):
            raise ValueError(f"unknown mode {mode!r}")
        self.k = int(k)
        self.counts_n = int(counts_n)
        self.prefix_bits = int(prefix_bits)
        self.suffix_bits = int(
            2 * k - prefix_bits if suffix_bits is None else suffix_bits
        )
        # suffix_hash caps (src/suffix_hash.h:14-16); a negative suffix
        # would corrupt ktree spectra / block accounting downstream
        if not 0 <= self.prefix_bits <= 36:
            raise ValueError("prefix_bits must be in 0..36")
        if not 0 <= self.suffix_bits <= 32:
            raise ValueError(
                "suffix_bits must be in 0..32 (got "
                f"{self.suffix_bits}; clamp prefix_bits for small k)"
            )
        self.mode = mode
        self.max_size_bytes = max_size_bytes
        cap = 64
        self.u_hi = jnp.zeros(cap, U32)
        self.u_lo = jnp.zeros(cap, U32)
        self.cnt = jnp.zeros((cap, counts_n), U32)
        self.n_unique = 0
        self.total_added = np.zeros(counts_n, np.int64)
        self._pending = []
        self._pending_n = 0

    @property
    def capacity(self) -> int:
        return int(self.u_hi.shape[0])

    def add_kmers(self, hi, lo, valid, source: int = 0,
                  defer: bool = False) -> "CountStore":
        """Merge a batch of observed k-mers (device arrays, any shape;
        flattened) into the store. ``valid`` masks real observations.

        With ``defer=True`` the batch is queued and merged lazily (one sort
        amortised over many batches — a log-structured merge replacing the
        reference's per-k-mer ``kh_put``); any query/flush folds the
        pending runs in first. Deferred adds also avoid the per-batch
        host-device sync, letting input IO overlap device compute.
        """
        if not 0 <= source < self.counts_n:
            raise ValueError("source out of range")
        hi = jnp.ravel(hi)
        lo = jnp.ravel(lo)
        valid = jnp.ravel(valid)
        if defer:
            self._pending.append((hi, lo, valid, source))
            self._pending_n += int(hi.shape[0])
            # flush when pending work rivals the store size, keeping the
            # amortised cost of each element O(log) merges
            if self._pending_n >= max(1 << 16, self.capacity):
                self.flush()
            return self
        self._merge_batch(hi, lo, valid, source)
        return self

    def flush(self) -> "CountStore":
        """Fold all deferred batches into the sorted store."""
        if not self._pending:
            return self
        by_source: dict = {}
        for hi, lo, valid, source in self._pending:
            by_source.setdefault(source, []).append((hi, lo, valid))
        self._pending = []
        self._pending_n = 0
        for source, runs in by_source.items():
            hi = jnp.concatenate([r[0] for r in runs])
            lo = jnp.concatenate([r[1] for r in runs])
            valid = jnp.concatenate([r[2] for r in runs])
            self._merge_batch(hi, lo, valid, source)
        return self

    def _merge_batch(self, hi, lo, valid, source: int) -> None:
        cap_b = _next_pow2(int(hi.shape[0]))
        if cap_b != hi.shape[0]:  # bucket batch shapes for compile reuse
            pad = cap_b - hi.shape[0]
            hi = jnp.pad(hi, (0, pad))
            lo = jnp.pad(lo, (0, pad))
            valid = jnp.pad(valid, (0, pad))
        onehot = jnp.zeros(self.counts_n, U32).at[source].set(1)
        u_hi, u_lo, cnt, n_unique = _merge(
            self.u_hi, self.u_lo, self.cnt, jnp.asarray(self.n_unique, I32),
            hi, lo, valid, onehot, self.k,
        )
        self.n_unique = int(n_unique)
        self.total_added[source] += int(valid.sum())
        new_cap = _next_pow2(self.n_unique)  # keep capacity a power of two
        if new_cap < u_hi.shape[0]:
            u_hi, u_lo, cnt = u_hi[:new_cap], u_lo[:new_cap], cnt[:new_cap]
        elif new_cap > u_hi.shape[0]:
            pad = new_cap - u_hi.shape[0]
            u_hi = jnp.pad(u_hi, (0, pad))
            u_lo = jnp.pad(u_lo, (0, pad))
            cnt = jnp.pad(cnt, ((0, pad), (0, 0)))
        self.u_hi, self.u_lo, self.cnt = u_hi, u_lo, cnt
        self._check_budget()
        return self

    def _check_budget(self):
        """Soft memory budget like kmer_tree's max_size (kmer_tree.c:57-67):
        estimated dense-block footprint must stay under the cap."""
        if self.max_size_bytes is None or self.mode != "ktree":
            return
        est = int(self.n_alloc_blocks()) * 4 * (1 << self.suffix_bits)
        if est > self.max_size_bytes:
            raise MemoryError(
                f"kmer_tree budget exceeded: estimated {est} bytes > "
                f"max_size {self.max_size_bytes}"
            )

    def n_alloc_blocks(self) -> int:
        self.flush()
        return int(
            _distinct_prefixes(
                self.u_hi, self.u_lo, jnp.asarray(self.n_unique, I32),
                jnp.asarray(self.suffix_bits, I64),
            )
        )

    # -- queries ------------------------------------------------------------
    def lookup(self, q_hi, q_lo) -> np.ndarray:
        """Per-query count rows [n, counts_n]; zeros for absent k-mers
        (sh_kmer_count_n semantics, src/suffix_hash.c:283-332)."""
        self.flush()
        rows = _lookup_counts(
            self.u_hi, self.u_lo, self.cnt, jnp.asarray(self.n_unique, I32),
            jnp.ravel(q_hi), jnp.ravel(q_lo),
        )
        return np.asarray(rows)

    def counts_dict(self) -> dict:
        """Host export: packed kmer -> count row (tests / small stores)."""
        self.flush()
        u_hi = np.asarray(self.u_hi)[: self.n_unique].astype(np.uint64)
        u_lo = np.asarray(self.u_lo)[: self.n_unique].astype(np.uint64)
        keys = (u_hi << np.uint64(32)) | u_lo
        cnt = np.asarray(self.cnt)[: self.n_unique]
        return {int(kk): cnt[i].tolist() for i, kk in enumerate(keys)}

    # -- spectra ------------------------------------------------------------
    def spectrum(self, max_count: int) -> np.ndarray:
        """kmer.spec.kt / kmer.spec.sh (src/kmer_hash.c:975-1008): histogram
        of source-0 counts, clamped into the last bin."""
        if not 1 <= max_count <= (1 << 30):
            raise ValueError("Unsuitable value of max_count")
        self.flush()
        include_zeros = self.mode == "ktree"
        n_alloc = (jnp.asarray(self.n_alloc_blocks(), I32) if include_zeros
                   else jnp.asarray(0, I32))
        live = jnp.arange(self.capacity, dtype=I32) < self.n_unique
        return np.asarray(
            _spectrum(
                self.cnt[:, 0], live, n_alloc,
                jnp.asarray(self.suffix_bits, I64),
                jnp.asarray(self.n_unique, I64), max_count, include_zeros,
            )
        )

    def spectrum_n(self, max_count: int, comb: Sequence[int],
                   comb_inner: Sequence[int],
                   source_min: Sequence[int]) -> np.ndarray:
        """kmer.spec.sh.n (src/kmer_hash.c:1010-1038): (comb_n*counts_n) x
        (max_count+1) combination spectra."""
        comb = np.asarray(comb, np.int32)
        comb_inner = np.asarray(comb_inner, np.int32)
        source_min = np.asarray(source_min, np.int64)
        if comb_inner.shape != comb.shape:
            raise ValueError("comb_inner must match comb in length")
        if len(source_min) != self.counts_n:
            raise ValueError("source_min must have counts_n entries")
        if ((comb_inner < 0) | (comb_inner > 1)).any():
            raise ValueError("comb_inner values must be 0 or 1")
        if (comb >= (1 << self.counts_n)).any():
            raise ValueError("comb values must be < 2^counts_n")
        self.flush()
        live = jnp.arange(self.capacity, dtype=I32) < self.n_unique
        return np.asarray(
            _spectrum_nc(
                self.cnt, live, max_count, jnp.asarray(comb),
                jnp.asarray(comb_inner), jnp.asarray(source_min),
                int(len(comb)),
            )
        )
