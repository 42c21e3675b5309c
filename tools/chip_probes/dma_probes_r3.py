"""Round-3 follow-up probes: pipelined dynamic-offset DMA bandwidth and
2-D in-kernel gather — the go/no-go numbers for a distribution-pass radix.

  D1  double-buffered dynamic-offset HBM->VMEM->HBM copy at several copy
      sizes — the distribution pass's bandwidth ceiling.
  D2  static-offset control with the same manual-DMA structure (isolates
      dynamic-offset cost from grid/DMA-chain overhead).
  D3  take_along_axis 2-D gather inside a kernel (per-lane LUT pattern).
  D4  flat bitonic_merge_lanes (current LSM tier merge) vs a row-fused
      variant that reshapes the small-stride tail into one pass.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=3):
    fn(*args)
    sync(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t) / iters


def d1_pipelined_dyn_dma(n, rows_per_copy, dynamic=True):
    """Double-buffered read at traced row offsets + write at traced row
    offsets, 2 slots each way, grid pipelined."""
    R = rows_per_copy
    rows_total = n // 128
    tiles = rows_total // R

    def kern(off_ref, x_hbm, o_hbm, scratch, sem_i, sem_o):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        def roff(i):
            return off_ref[i] if dynamic else i * R

        def woff(i):
            return off_ref[nt - 1 - i] if dynamic else (nt - 1 - i) * R

        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t == 0)
        def _first():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(roff(0), R), :], scratch.at[0],
                sem_i.at[0]).start()

        @pl.when(t + 1 < nt)
        def _next():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(roff(t + 1), R), :], scratch.at[nxt],
                sem_i.at[nxt]).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(roff(t), R), :], scratch.at[slot],
            sem_i.at[slot]).wait()
        # write previous step's buffer out (fire and wait next step)
        pltpu.make_async_copy(
            scratch.at[slot], o_hbm.at[pl.ds(woff(t), R), :],
            sem_o.at[slot]).start()
        pltpu.make_async_copy(
            scratch.at[slot], o_hbm.at[pl.ds(woff(t), R), :],
            sem_o.at[slot]).wait()

    @jax.jit
    def run(x, offs):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.VMEM((2, R, 128), jnp.uint32),
                                pltpu.SemaphoreType.DMA((2,)),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offs, x)

    x = jnp.arange(n, dtype=jnp.uint32).reshape(rows_total, 128)
    perm = np.random.default_rng(0).permutation(tiles)
    offs = (perm * R).astype(np.int32)
    out = run(x, jnp.asarray(offs))
    i = int(np.where(perm == tiles - 1)[0][0])  # out rows [(nt-1-i)*R] got x[offs[i]]
    ok = (np.asarray(out[: R]) == np.asarray(
        x[offs[tiles - 1]:offs[tiles - 1] + R])).all()
    dt = timeit(run, x, jnp.asarray(offs))
    byts = 4 * n * 2 * 2  # read+write through VMEM, both legs
    kind = "dyn" if dynamic else "static"
    print(f"D1 {kind} pipelined DMA rows/copy={R} ({R*512} B): ok={ok} "
          f"{dt*1e3:.2f} ms ({byts/dt/1e9:.0f} GB/s)")


def d3_gather_2d():
    """take_along_axis inside a kernel: per-lane LUT (axis=0) and
    per-sublane (axis=1)."""
    T, L = 1024, 128
    N = 1 << 20

    def kern0(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    @jax.jit
    def run0(tab, idx):
        rows = idx.shape[0]
        blk = 1 << 10
        return pl.pallas_call(
            kern0,
            grid=(rows // blk,),
            in_specs=[
                pl.BlockSpec((T, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
        )(tab, idx)

    tab = (jnp.arange(T * L, dtype=jnp.uint32).reshape(T, L) * 7)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, T, size=(N // L, L), dtype=np.int32))
    out = run0(tab, idx)
    want = np.take_along_axis(
        np.asarray(tab), np.asarray(idx) % T, axis=0)
    ok = (np.asarray(out) == want).all()
    dt = timeit(run0, tab, idx)
    print(f"D3 take_along_axis axis=0 (tab [{T},{L}]): ok={ok} "
          f"{dt*1e3:.2f} ms ({dt/N*1e9:.2f} ns/elem)")


def _merge_flat(k1, k2):
    """Current LSM shape: flat compare-exchange stages over the whole
    array (mirrors ops.sort.bitonic_merge_lanes, 2 lanes u32-like)."""
    M = k1.shape[0]
    stride = M // 2
    while stride >= 1:
        v1 = k1.reshape(-1, 2, stride)
        v2 = k2.reshape(-1, 2, stride)
        x1, y1 = v1[:, 0, :], v1[:, 1, :]
        x2, y2 = v2[:, 0, :], v2[:, 1, :]
        le = x1 <= y1
        k1 = jnp.stack([jnp.where(le, x1, y1),
                        jnp.where(le, y1, x1)], 1).reshape(M)
        k2 = jnp.stack([jnp.where(le, x2, y2),
                        jnp.where(le, y2, x2)], 1).reshape(M)
        stride //= 2
    return k1, k2


def _merge_rowfused(k1, k2, log_tail=13):
    """Same network; strides < 2^log_tail run on a [R, 2^log_tail] view so
    XLA can fuse them into one VMEM-resident pass per lane."""
    M = k1.shape[0]
    Lt = 1 << log_tail
    stride = M // 2
    while stride >= Lt:
        v1 = k1.reshape(-1, 2, stride)
        v2 = k2.reshape(-1, 2, stride)
        x1, y1 = v1[:, 0, :], v1[:, 1, :]
        x2, y2 = v2[:, 0, :], v2[:, 1, :]
        le = x1 <= y1
        k1 = jnp.stack([jnp.where(le, x1, y1),
                        jnp.where(le, y1, x1)], 1).reshape(M)
        k2 = jnp.stack([jnp.where(le, x2, y2),
                        jnp.where(le, y2, x2)], 1).reshape(M)
        stride //= 2
    R = M // Lt
    k1 = k1.reshape(R, Lt)
    k2 = k2.reshape(R, Lt)
    while stride >= 1:
        v1 = k1.reshape(R, -1, 2, stride)
        v2 = k2.reshape(R, -1, 2, stride)
        x1, y1 = v1[:, :, 0, :], v1[:, :, 1, :]
        x2, y2 = v2[:, :, 0, :], v2[:, :, 1, :]
        le = x1 <= y1
        k1 = jnp.stack([jnp.where(le, x1, y1),
                        jnp.where(le, y1, x1)], 2).reshape(R, Lt)
        k2 = jnp.stack([jnp.where(le, x2, y2),
                        jnp.where(le, y2, x2)], 2).reshape(R, Lt)
        stride //= 2
    return k1.reshape(M), k2.reshape(M)


def d4_merge_variants(n):
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(0, 2 ** 63, n // 2, np.uint64))
    b = np.sort(rng.integers(0, 2 ** 63, n // 2, np.uint64))
    k1 = jnp.asarray(np.concatenate([a, b[::-1]]))
    k2 = jnp.arange(n, dtype=jnp.uint32)
    flat = jax.jit(_merge_flat)
    fused = jax.jit(functools.partial(_merge_rowfused, log_tail=13))
    o1 = flat(k1, k2)
    o2 = fused(k1, k2)
    ok = (np.asarray(o1[0]) == np.asarray(o2[0])).all() and bool(
        (np.diff(np.asarray(o2[0])) >= 0).all())
    t1 = timeit(flat, k1, k2)
    t2 = timeit(fused, k1, k2)
    print(f"D4 merge 2^{int(np.log2(n))} (u64,u32): flat {t1*1e3:.1f} ms "
          f"({t1/n*1e9:.2f} ns/elem) | row-fused {t2*1e3:.1f} ms "
          f"({t2/n*1e9:.2f} ns/elem) ok={ok}")


if __name__ == "__main__":
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for probe in (
        lambda: d1_pipelined_dyn_dma(n, 512, dynamic=True),
        lambda: d1_pipelined_dyn_dma(n, 512, dynamic=False),
        lambda: d1_pipelined_dyn_dma(n, 64, dynamic=True),
        lambda: d1_pipelined_dyn_dma(n, 8, dynamic=True),
        d3_gather_2d,
        lambda: d4_merge_variants(n),
        lambda: d4_merge_variants(n >> 2),
    ):
        try:
            probe()
        except Exception as e:  # noqa: BLE001 — probe failures are data
            print(f"PROBE FAIL: {type(e).__name__}: {str(e)[:400]}")
        sys.stdout.flush()
