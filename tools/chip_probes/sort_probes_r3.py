"""Round-3 sort-gate probes (VERDICT.md next-round item 1).

Reopens the sort gate with the decompositions round 2 left untried:
  R1  u32-key stable sorts with 1/2 payload lanes — the two-pass LSD
      arithmetic: LSD wins iff one u32-key pass < 1.81 ns/elem (half the
      measured 3.62 u64 1-key-stable floor).
  R2  dynamic-offset DMA from/to 2-D refs (row granularity) — the round-2
      compile-helper crash was specifically 1-D ANY-space dynamic DMA; a
      working 2-D path gates any Mosaic bucket-staging radix.
  R2b small-transfer DMA rate — a distribution pass needs many ~512 B
      row transfers; measures transfers/s to bound segment-DMA designs.
  R3  1-D dynamic-offset DMA retest (toolchain may have moved).
  R4  in-kernel VMEM vector gather (table[idx] with a vector idx) — gates
      in-VMEM radix histogram/offset lookups.
  R5  batched bitonic CLEAN of presorted rows (log L stages) vs full row
      sort — the per-merge-level cost of any row-merge scheme.

Run under tools/chip_worker.py or directly: python sort_probes_r3.py [logn]
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


def r1_u32_key_sorts(n):
    """u32-key 1-key-stable sorts with 1 and 2 u32 payload lanes.

    Two-pass LSD of the (u64 key, u32 pos) sort = 2x the 2-payload form.
    """
    rng = np.random.default_rng(0)
    k32 = jnp.asarray(rng.integers(0, 2 ** 32, n, np.uint64).astype(np.uint32))
    p1 = jnp.arange(n, dtype=jnp.uint32)
    p2 = jnp.asarray(rng.integers(0, 2 ** 32, n, np.uint64).astype(np.uint32))

    @jax.jit
    def s_1pay(k, a):
        return jax.lax.sort((k, a), dimension=-1, num_keys=1, is_stable=True)

    @jax.jit
    def s_2pay(k, a, b):
        return jax.lax.sort((k, a, b), dimension=-1, num_keys=1,
                            is_stable=True)

    @jax.jit
    def s_u64_1pay(k, a):  # control: the current floor form
        kk = (k.astype(jnp.uint64) << jnp.uint64(32)) | a.astype(jnp.uint64)
        return jax.lax.sort((kk, a), dimension=-1, num_keys=1,
                            is_stable=True)

    for name, fn, args in (
        ("u32key+1pay", s_1pay, (k32, p1)),
        ("u32key+2pay", s_2pay, (k32, p1, p2)),
        ("u64key+1pay (control)", s_u64_1pay, (k32, p1)),
    ):
        dt = timeit(fn, *args)
        print(f"R1 {name} 2^{int(np.log2(n))}: {dt*1e3:.1f} ms "
              f"({dt/n*1e9:.2f} ns/elem)")


def r2_dyn_dma_2d(n, rows_per_copy):
    """HBM->VMEM read at a traced ROW offset from a 2-D ANY ref, then
    VMEM->HBM write at a traced row offset into a 2-D output."""
    R = rows_per_copy
    rows_total = n // 128

    def kern(off_ref, x_hbm, o_hbm, scratch, sem_i, sem_o):
        t = pl.program_id(0)
        off = off_ref[t]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, R), :], scratch, sem_i)
        cp.start()
        cp.wait()
        # write back to a DIFFERENT dynamic row offset (reversed tiles)
        woff = off_ref[pl.num_programs(0) - 1 - t]
        cp2 = pltpu.make_async_copy(
            scratch, o_hbm.at[pl.ds(woff, R), :], sem_o)
        cp2.start()
        cp2.wait()

    @jax.jit
    def run(x, offs):
        grid = (offs.shape[0],)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.VMEM((R, 128), jnp.uint32),
                                pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offs, x)

    x = jnp.arange(n, dtype=jnp.uint32).reshape(rows_total, 128)
    tiles = 64
    offs = (np.random.default_rng(0).integers(
        0, rows_total - R, size=tiles)).astype(np.int32)
    out = run(x, jnp.asarray(offs))
    got = np.asarray(out[offs[-1]:offs[-1] + R])
    want = np.asarray(x[offs[0]:offs[0] + R])
    ok = (got == want).all()
    dt = timeit(run, x, jnp.asarray(offs))
    byts = 4 * tiles * R * 128 * 2 * 2  # r+w on both legs
    print(f"R2 2-D dyn-DMA rows/copy={R}: ok={ok} {dt*1e3:.2f} ms "
          f"({byts/dt/1e9:.0f} GB/s)")


def r2b_small_dma_rate(n):
    """Many small (4-row, 2 KB) dynamic-offset copies: transfers/s bound
    for segment-granularity distribution passes."""
    R = 4
    rows_total = n // 128
    per_step = 64  # DMAs issued per grid step, batched waits

    def kern(off_ref, x_hbm, o_ref, scratch, sems):
        t = pl.program_id(0)
        for j in range(per_step):
            off = off_ref[t * per_step + j]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(off, R), :],
                scratch.at[pl.ds(j * R, R), :], sems.at[j],
            ).start()
        for j in range(per_step):
            off = off_ref[t * per_step + j]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(off, R), :],
                scratch.at[pl.ds(j * R, R), :], sems.at[j],
            ).wait()
        o_ref[...] = scratch[...]

    @jax.jit
    def run(x, offs):
        steps = offs.shape[0] // per_step
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((per_step * R, 128),
                                       lambda t, off: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((per_step * R, 128), jnp.uint32),
                                pltpu.SemaphoreType.DMA((per_step,))],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (offs.shape[0] * R, 128), jnp.uint32),
        )(offs, x)

    x = jnp.arange(n, dtype=jnp.uint32).reshape(rows_total, 128)
    n_dma = 4096
    offs = (np.random.default_rng(0).integers(
        0, rows_total - R, size=n_dma)).astype(np.int32)
    out = run(x, jnp.asarray(offs))
    ok = (np.asarray(out[:R]) == np.asarray(x[offs[0]:offs[0] + R])).all()
    dt = timeit(run, x, jnp.asarray(offs))
    print(f"R2b small dyn-DMA (2KB each): ok={ok} {dt*1e3:.2f} ms for "
          f"{n_dma} -> {n_dma/dt/1e6:.2f} M transfers/s "
          f"({4*R*128*n_dma*2/dt/1e9:.0f} GB/s)")


def r3_dyn_dma_1d(n, granule):
    """Round-2 crasher retest: 1-D ANY-space dynamic-offset DMA."""
    CH = 1 << 13

    def kern(off_ref, x_hbm, o_ref, scratch, sem):
        t = pl.program_id(0)
        off = off_ref[t]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, CH)], scratch, sem)
        cp.start()
        cp.wait()
        o_ref[...] = scratch[...]

    @jax.jit
    def run(x, offs):
        grid = (offs.shape[0],)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((CH,), lambda t, off: (t,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((CH,), jnp.uint32),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((grid[0] * CH,), jnp.uint32),
        )(offs, x)

    x = jnp.arange(n, dtype=jnp.uint32)
    tiles = 64
    offs = (np.random.default_rng(0).integers(
        0, (n - CH) // max(granule, 1), size=tiles) * granule).astype(
            np.int32)
    out = run(x, jnp.asarray(offs))
    got = np.asarray(out[:CH])
    ok = (got == np.arange(offs[0], offs[0] + CH, dtype=np.uint32)).all()
    dt = timeit(run, x, jnp.asarray(offs))
    print(f"R3 1-D dyn-DMA granule={granule}: ok={ok} {dt*1e3:.2f} ms")


def r4_vmem_gather(n):
    """In-kernel dynamic vector gather from a VMEM table: t[idx] with a
    traced [8,128] idx block. Gates in-VMEM radix offset lookups."""
    T = 1 << 10

    def kern(t_ref, i_ref, o_ref):
        idx = i_ref[...]
        tab = t_ref[...]
        o_ref[...] = jnp.take(tab.reshape(-1), idx, axis=0)

    @jax.jit
    def run(tab, idx):
        blk = 1 << 10
        rows = idx.shape[0]
        return pl.pallas_call(
            kern,
            grid=(rows // (blk // 128),),
            in_specs=[
                pl.BlockSpec((T // 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
        )(tab, idx)

    tab = jnp.arange(T, dtype=jnp.uint32).reshape(T // 128, 128) * 7
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, T, size=n, dtype=np.int32)).reshape(n // 128, 128)
    out = run(tab, idx)
    ok = (np.asarray(out).ravel()
          == np.asarray(tab).ravel()[np.asarray(idx).ravel()]).all()
    dt = timeit(run, tab, idx)
    print(f"R4 VMEM vector gather (table 2^10): ok={ok} {dt*1e3:.2f} ms "
          f"({dt/n*1e9:.2f} ns/elem)")


def r5_bitonic_clean_rows(n):
    """Batched bitonic CLEAN (log L in-row stages on bitonic rows) vs the
    full row sort — the incremental cost of one row-merge level."""
    for logL in (13, 15):
        L = 1 << logL
        R = n // L

        @jax.jit
        def clean(k1, k2):
            k1 = k1.reshape(R, L)
            k2 = k2.reshape(R, L)
            stride = L // 2
            while stride >= 1:
                v1 = k1.reshape(R, -1, 2, stride)
                v2 = k2.reshape(R, -1, 2, stride)
                x1, y1 = v1[:, :, 0, :], v1[:, :, 1, :]
                x2, y2 = v2[:, :, 0, :], v2[:, :, 1, :]
                le = x1 <= y1
                k1 = jnp.stack([jnp.where(le, x1, y1),
                                jnp.where(le, y1, x1)], 2).reshape(R, L)
                k2 = jnp.stack([jnp.where(le, x2, y2),
                                jnp.where(le, y2, x2)], 2).reshape(R, L)
                stride //= 2
            return k1, k2

        rng = np.random.default_rng(0)
        a = np.sort(rng.integers(0, 2 ** 63, (R, L // 2), np.uint64), -1)
        b = np.sort(rng.integers(0, 2 ** 63, (R, L // 2), np.uint64), -1)
        k1 = jnp.asarray(np.concatenate([a, b[:, ::-1]], -1).reshape(-1))
        k2 = jnp.arange(n, dtype=jnp.uint32)
        out = clean(k1, k2)
        ok = bool((np.diff(np.asarray(out[0]).reshape(R, L), axis=-1)
                   >= 0).all())
        dt = timeit(clean, k1, k2)
        print(f"R5 bitonic clean rows [{R}, 2^{logL}] (u64,u32): ok={ok} "
              f"{dt*1e3:.1f} ms ({dt/n*1e9:.2f} ns/elem)")


if __name__ == "__main__":
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
    print("jax", jax.__version__, "jaxlib", getattr(
        __import__("jaxlib"), "__version__", "?"), flush=True)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for probe in (
        lambda: r1_u32_key_sorts(n),
        lambda: r5_bitonic_clean_rows(n),
        lambda: r2_dyn_dma_2d(n, 512),
        lambda: r2_dyn_dma_2d(n, 8),
        lambda: r2b_small_dma_rate(n),
        lambda: r4_vmem_gather(1 << 22),
        lambda: r3_dyn_dma_1d(n, 1024),
        lambda: r3_dyn_dma_1d(n, 1),
    ):
        try:
            probe()
        except Exception as e:  # noqa: BLE001 — probe failures are data
            print(f"PROBE FAIL: {type(e).__name__}: {str(e)[:400]}")
        sys.stdout.flush()
