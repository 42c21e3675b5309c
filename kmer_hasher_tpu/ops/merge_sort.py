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


# ---------------------------------------------------------------------------
# Pallas merge-path kernel (TPU): one output tile per grid step; exact
# input ranges DMA'd at 1024-element granularity, aligned with decomposed
# static rolls, merged by a bitonic network of static XOR-partner rolls.
# ---------------------------------------------------------------------------

_G = 1024  # DMA granule: 8 sublanes x 128 lanes of u32
_INF = 0xFFFFFFFF


def _i32(v: int):
    """Strong-i32 constant: Python ints inside kernel bodies otherwise
    trace as weak i64 under jax_enable_x64, and Mosaic's lowering of the
    resulting i64->i32 truncations recurses forever (observed on-chip)."""
    return jnp.int32(v)


def _roll_flat_left(arrs, shift, W_rows):
    """Roll [W_rows, 128] arrays left by a *traced* flat element count in
    [0, W) using static power-of-two rolls gated by pl.when-free where()s
    (wheres keep all three arrays on one shared predicate)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    row_shift = shift // _i32(128)
    lane_shift = shift % _i32(128)
    d = 1
    while d < W_rows:
        bit = (row_shift & _i32(d)) != 0
        arrs = tuple(
            jnp.where(bit, pltpu.roll(a, _i32(W_rows - d), axis=0), a)
            for a in arrs
        )
        d *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (W_rows, 128), 1)
    b = 64
    while b >= 1:
        bit = (lane_shift & _i32(b)) != 0
        rolled = tuple(
            jnp.where(
                lane < _i32(128 - b),
                pltpu.roll(a, _i32(128 - b), axis=1),
                pltpu.roll(pltpu.roll(a, _i32(W_rows - 1), axis=0),
                           _i32(128 - b), axis=1),
            )
            for a in arrs
        )
        arrs = tuple(jnp.where(bit, r, a) for r, a in zip(rolled, arrs))
        b //= 2
    return arrs


def _reverse_tile(a, rows):
    """Full reversal of a [rows, 128] tile in flat row-major order (rows
    and 128 powers of two): index -> index XOR (rows*128-1), composed from
    one XOR-partner exchange per bit — static rolls only (Mosaic has no
    rev/flip lowering)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    d = 1
    while d < rows:
        up = (row_idx & _i32(d)) == 0
        a = jnp.where(up, pltpu.roll(a, _i32(rows - d), axis=0),
                      pltpu.roll(a, _i32(d), axis=0))
        d *= 2
    b = 1
    while b < 128:
        up = (lane & _i32(b)) == 0
        a = jnp.where(up, pltpu.roll(a, _i32(128 - b), axis=1),
                      pltpu.roll(a, _i32(b), axis=1))
        b *= 2
    return a


def _leq3(akh, akl, app, bkh, bkl, bpp):
    return ((akh < bkh)
            | ((akh == bkh)
               & ((akl < bkl) | ((akl == bkl) & (app <= bpp)))))


def _bitonic_merge_tile(kh, kl, pp, rows):
    """Bitonic merge of a bitonic [rows, 128] tile (flat order row-major)
    via static XOR-partner rolls — no reshapes, Mosaic-friendly."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    s = (rows * 128) // 2
    while s >= 1:
        if s >= 128:
            d = s // 128
            up = (row_idx & _i32(d)) == 0

            def partner(a, d=d, up=up, rows=rows):
                return jnp.where(up, pltpu.roll(a, _i32(rows - d), axis=0),
                                 pltpu.roll(a, _i32(d), axis=0))
        else:
            up = (lane & _i32(s)) == 0

            def partner(a, s=s, up=up):
                return jnp.where(up, pltpu.roll(a, _i32(128 - s), axis=1),
                                 pltpu.roll(a, _i32(s), axis=1))
        pkh, pkl, ppp = partner(kh), partner(kl), partner(pp)
        x_le = _leq3(kh, kl, pp, pkh, pkl, ppp)
        # up lanes keep min, down lanes keep max; select on i1 vectors is
        # unsupported in Mosaic, so keep = up ? x_le : ~x_le == (up == x_le)
        keep = up == x_le
        kh = jnp.where(keep, kh, pkh)
        kl = jnp.where(keep, kl, pkl)
        pp = jnp.where(keep, pp, ppp)
        s //= 2
    return kh, kl, pp


def _merge_round_kernel(kh, kl, pp, splits, L: int, T: int,
                        interpret: bool = False):
    """One merge round on flat [N(+pad)] u32 arrays: runs of length L
    merged pairwise into runs of 2L. ``splits`` = [n_pairs, 2L/T + 1]
    exact merge-path boundaries. Inputs must carry >= _G elements of tail
    padding (read-overrun headroom)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = kh.shape[0] - _G
    n_pairs = N // (2 * L)
    n_tiles = (2 * L) // T
    W = T + _G
    W_rows, T_rows = W // 128, T // 128

    def kernel(splits_ref, kh_hbm, kl_hbm, pp_hbm, okh, okl, opp,
               a_bufs, b_bufs, sems):
        p = pl.program_id(0)
        t = pl.program_id(1)
        i0 = splits_ref[p, t]
        i1 = splits_ref[p, t + 1]
        r0 = t * _i32(T)
        j0 = r0 - i0
        j1 = r0 + _i32(T) - i1
        base_a = p * _i32(2 * L)
        base_b = base_a + _i32(L)

        def load(bufs, base, start, sem_off):
            s = jnp.maximum(jnp.minimum(start, _i32(L - T)), _i32(0))
            s = (s // _i32(_G)) * _i32(_G)
            row0 = (base + s) // _i32(128)
            cps = [
                # explicit i32 ref indices: Python-int indices lower as
                # i64 under jax_enable_x64 and fail Mosaic verification
                pltpu.make_async_copy(
                    hbm.at[pl.ds(row0, W_rows), :], bufs.at[_i32(i)],
                    sems.at[_i32(sem_off + i)],
                )
                for i, hbm in enumerate((kh_hbm, kl_hbm, pp_hbm))
            ]
            for cp in cps:
                cp.start()
            return cps, s

        a_cps, sa = load(a_bufs, base_a, i0, 0)
        b_cps, sb = load(b_bufs, base_b, j0, 3)
        for cp in a_cps + b_cps:
            cp.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (W_rows, 128), 1)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (W_rows, 128), 0)
        flat = row_idx * _i32(128) + lane

        def window(bufs, s, lo, hi):
            arrs = _roll_flat_left(
                tuple(bufs[_i32(i)] for i in range(3)), lo - s, W_rows
            )
            n_real = hi - lo
            return tuple(
                jnp.where(flat < n_real, a, jnp.uint32(_INF))[:T_rows]
                for a in arrs
            )

        akh, akl, app = window(a_bufs, sa, i0, i1)
        bkh, bkl, bpp = window(b_bufs, sb, j0, j1)
        # concat(A, reverse(B)) is bitonic; reverse via XOR-partner rolls
        cat = tuple(
            jnp.concatenate([x, _reverse_tile(y, T_rows)], axis=0)
            for x, y in ((akh, bkh), (akl, bkl), (app, bpp))
        )
        mkh, mkl, mpp = _bitonic_merge_tile(*cat, rows=2 * T_rows)
        okh[...] = mkh[:T_rows]
        okl[...] = mkl[:T_rows]
        opp[...] = mpp[:T_rows]

    out_shape = [jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32)] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            # p*0 (not literal 0) keeps the index tuple uniformly i32
            # under jax_enable_x64
            pl.BlockSpec((T_rows, 128),
                         lambda p, t, splits: (p * n_tiles + t, p * 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, W_rows, 128), jnp.uint32),
            pltpu.VMEM((3, W_rows, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    okh, okl, opp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(splits, kh.reshape(-1, 128), kl.reshape(-1, 128),
      pp.reshape(-1, 128))
    return okh.reshape(-1), okl.reshape(-1), opp.reshape(-1)


@functools.partial(jax.jit, static_argnames=("Lt", "T", "interpret"))
def _sort_merge_kernel_path(key, pay, Lt: int, T: int, interpret: bool):
    n = key.shape[0]
    k, p = _phase1(key, pay, Lt)
    kh = (k >> jnp.uint64(32)).astype(U32).reshape(-1)
    kl = k.astype(U32).reshape(-1)
    pp = p.reshape(-1)
    pad = jnp.full(_G, _INF, U32)
    kh = jnp.concatenate([kh, pad])
    kl = jnp.concatenate([kl, pad])
    pp = jnp.concatenate([pp, pad])
    L = Lt
    R = n // Lt
    while R > 1:
        kk = ((kh[:n].astype(U64) << jnp.uint64(32))
              | kl[:n].astype(U64)).reshape(R // 2, 2, L)
        pv = pp[:n].reshape(R // 2, 2, L)
        splits = jax.vmap(
            lambda a, b: merge_path_splits(a[0], b[0], a[1], b[1], T)
        )((kk[:, 0], kk[:, 1]), (pv[:, 0], pv[:, 1]))
        okh, okl, opp = _merge_round_kernel(kh, kl, pp, splits, L, T,
                                            interpret)
        kh = jnp.concatenate([okh, pad])
        kl = jnp.concatenate([okl, pad])
        pp = jnp.concatenate([opp, pad])
        L *= 2
        R //= 2
    key_out = (kh[:n].astype(U64) << jnp.uint64(32)) | kl[:n].astype(U64)
    return key_out, pp[:n]


def sort_kmers_merge(key: jax.Array, pay: jax.Array, Lt: int = 1 << 15,
                     T: int = 1 << 13, use_kernel: bool = False,
                     interpret: bool = False):
    """Sort (u64 key, u32 payload) lexicographically; equivalent to
    ``lax.sort((key, pay), num_keys=2)``. N must be a power of two and a
    multiple of 2*Lt to take the merge path; otherwise falls back to
    lax.sort. ``use_kernel`` routes merge rounds through the Pallas
    merge-path kernel (TPU; ``interpret=True`` for CPU validation)."""
    n = key.shape[0]
    if n < 2 * Lt or n % Lt or (n & (n - 1)):
        return jax.lax.sort((key, pay), dimension=-1, num_keys=2)
    if use_kernel:
        return _sort_merge_kernel_path(key, pay, Lt, T, interpret)
    k, p = _phase1(key, pay, Lt)
    while k.shape[0] > 1:
        k, p = _merge_round_bitonic(k, p)
    return k.reshape(-1), p.reshape(-1)
