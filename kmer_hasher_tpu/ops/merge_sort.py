"""Hierarchical merge sort for (u64 key, u32 payload) pairs — the
replacement for XLA's monolithic variadic sort on the index-build hot path
(ROADMAP §1, VERDICT round-1 item 1).

Why this shape: XLA's sort costs ~60 HBM-resident compare-exchange passes
at 2^26 (measured ~4.8 ns/elem, PERF.md), and a radix sort is off the
table on TPU (scatter ~115 M elem/s regardless of index pattern). What is
fast: (a) batched row sorts over VMEM-sized tiles, (b) merge rounds whose
only HBM traffic is bulk sequential reads/writes.

  phase 1   reshape [N] -> [R, Lt], lax.sort rows (VMEM-local tiles)
  phase 2   log2(R) rounds; round r merges adjacent run pairs [A|B] into
            one sorted run of twice the length.

Phase 2 comes in two flavours:

* ``_merge_round_bitonic`` (pure XLA, runs everywhere): concat(A,
  reverse(B)) is bitonic, so log2(2L)+1 static-stride compare-exchange
  stages merge it. Large strides cost HBM passes, so this is a
  correctness/fallback path, not the fast one.
* the merge-path Pallas kernel (TPU): output tiles of T elements; the
  exact split of each tile between A and B is found *outside* the kernel
  by a vectorised binary search; the kernel DMA-loads the two input
  ranges, bitonic-merges 2T elements in VMEM, and writes one static
  output tile. Per round: ~2x12 B/elem of bulk HBM traffic.
  (Kernel lands behind the chip probes in tools/chip_probes/.)

Comparator: lexicographic (key u64, payload u32). With a unique payload
(index build: payload = position) keys are 96-bit unique, merge-path
splits are exact, and the result equals a stable sort by key with
payload-ascending ties — exactly ops.sort.sort_windows semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32
U64 = jnp.uint64


def _leq(ak, ap, bk, bp):
    """Lexicographic (u64 key, u32 payload) <=."""
    return (ak < bk) | ((ak == bk) & (ap <= bp))


@functools.partial(jax.jit, static_argnames=("T",))
def merge_path_splits(a_key, a_pay, b_key, b_pay, T: int):
    """Exact merge-path boundaries for merging equal-length sorted runs A
    and B: for each output boundary r = t*T (t = 0..2L/T), the count i_t
    of A-elements among the first r merged elements, such that
    A[:i_t] and B[:r-i_t] are exactly the first r of the merge.

    i_t = number of A-elements <= the r-th smallest overall; found by
    binary search on i with predicate A[i] <= B[r-i-1], vectorised over
    all boundaries (log2(L) rounds of [n_b] gathers — noise next to the
    data movement it steers).
    """
    L = a_key.shape[0]
    n_b = (2 * L) // T + 1
    r = jnp.arange(n_b, dtype=I32) * T
    lo = jnp.maximum(0, r - L)
    hi = jnp.minimum(L, r)
    iters = max(1, int(L).bit_length())

    def body(_, state):
        lo_i, hi_i = state
        active = lo_i < hi_i
        mid = (lo_i + hi_i) // 2
        bj = jnp.clip(r - mid - 1, 0, L - 1)
        take_a = _leq(a_key[mid], a_pay[mid], b_key[bj], b_pay[bj])
        lo_i = jnp.where(active & take_a, mid + 1, lo_i)
        hi_i = jnp.where(active & ~take_a, mid, hi_i)
        return lo_i, hi_i

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def bitonic_merge_rows(key, pay):
    """Merge rows that are bitonic sequences: [..., M] -> sorted rows.
    log2(M) static-stride compare-exchange stages (pure jnp: runs as XLA
    or inside a Pallas kernel body)."""
    M = key.shape[-1]
    lead = key.shape[:-1]
    stride = M // 2
    while stride >= 1:
        k2 = key.reshape(lead + (-1, 2, stride))
        p2 = pay.reshape(lead + (-1, 2, stride))
        xk, yk = k2[..., 0, :], k2[..., 1, :]
        xp, yp = p2[..., 0, :], p2[..., 1, :]
        x_le = _leq(xk, xp, yk, yp)
        lo_k = jnp.where(x_le, xk, yk)
        hi_k = jnp.where(x_le, yk, xk)
        lo_p = jnp.where(x_le, xp, yp)
        hi_p = jnp.where(x_le, yp, xp)
        key = jnp.stack([lo_k, hi_k], axis=-2).reshape(lead + (M,))
        pay = jnp.stack([lo_p, hi_p], axis=-2).reshape(lead + (M,))
        stride //= 2
    return key, pay


@jax.jit
def _merge_round_bitonic(key, pay):
    """One merge round, pure XLA: [R, L] sorted rows -> [R/2, 2L].
    concat(A, reverse(B)) per pair is bitonic."""
    R, L = key.shape
    k2 = key.reshape(R // 2, 2, L)
    p2 = pay.reshape(R // 2, 2, L)
    cat_k = jnp.concatenate([k2[:, 0], k2[:, 1, ::-1]], axis=1)
    cat_p = jnp.concatenate([p2[:, 0], p2[:, 1, ::-1]], axis=1)
    return bitonic_merge_rows(cat_k, cat_p)


@functools.partial(jax.jit, static_argnames=("Lt",))
def _phase1(key, pay, Lt: int):
    R = key.shape[0] // Lt
    return jax.lax.sort(
        (key.reshape(R, Lt), pay.reshape(R, Lt)), dimension=-1, num_keys=2
    )


def sort_kmers_merge(key: jax.Array, pay: jax.Array, Lt: int = 1 << 15,
                     use_kernel: str = "auto"):
    """Sort (u64 key, u32 payload) lexicographically; equivalent to
    ``lax.sort((key, pay), num_keys=2)``. N must be a power of two and a
    multiple of 2*Lt to take the merge path; otherwise falls back to
    lax.sort."""
    n = key.shape[0]
    if n < 2 * Lt or n % Lt:
        return jax.lax.sort((key, pay), dimension=-1, num_keys=2)
    k, p = _phase1(key, pay, Lt)
    while k.shape[0] > 1:
        k, p = _merge_round_bitonic(k, p)
    return k.reshape(-1), p.reshape(-1)
