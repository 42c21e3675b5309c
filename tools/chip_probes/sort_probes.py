"""Chip probes for the merge-sort kernel design (ROADMAP §1).

Answers, on the real v5e, the questions that gate the kernel design:
  E1  raw HBM->HBM copy bandwidth through a trivial Pallas kernel
  E2  dynamic-offset DMA loads: what offset granularity compiles/runs
  E3  pltpu.roll with a traced (non-static) shift
  E4  batched row sort [R, L] vs flat sort: is phase-1 tile sorting cheap
  E5  comparator width: (u64,u32) vs single-u64 sort cost

Run: python tools/chip_probes/sort_probes.py [2^log_n]
Each probe prints one line; failures print the exception head. Timings
chain iterations in one jit where possible and force a readback (axon
block_until_ready is unreliable).
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


def e1_copy_bandwidth(n):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    @jax.jit
    def copy(x):
        blk = 1 << 13
        return pl.pallas_call(
            kern,
            grid=(x.shape[0] // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    x = jnp.arange(n, dtype=jnp.uint32).reshape(-1, 128)
    dt = timeit(copy, x)
    gbs = 2 * 4 * n / dt / 1e9
    print(f"E1 copy: {dt*1e3:.2f} ms for 2^{int(np.log2(n))} u32 "
          f"-> {gbs:.0f} GB/s")


def e2_dynamic_dma(n, granule):
    """Load CH elements from a 1-D HBM ref at a traced offset (multiple of
    ``granule``), double-buffered over a grid."""
    CH = 1 << 13

    def kern(off_ref, x_hbm, o_ref, scratch, sem):
        t = pl.program_id(0)
        off = off_ref[t]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, CH)], scratch, sem
        )
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
    want = np.arange(offs[0], offs[0] + CH, dtype=np.uint32)
    ok = (got == want).all()
    dt = timeit(run, x, jnp.asarray(offs))
    gbs = 2 * 4 * tiles * CH / dt / 1e9
    print(f"E2 dyn-DMA granule={granule}: ok={ok} {dt*1e3:.2f} ms "
          f"({gbs:.0f} GB/s)")


def e3_traced_roll():
    def kern(sh_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], shift=sh_ref[0], axis=0)

    @jax.jit
    def run(x, sh):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(sh, x)

    x = jnp.arange(1 << 13, dtype=jnp.uint32).reshape(-1, 128)
    out = run(x, jnp.asarray([5], jnp.int32))
    want = np.roll(np.asarray(x), 5, axis=0)
    print(f"E3 traced roll(axis=0): ok={(np.asarray(out) == want).all()}")


def e3b_traced_roll_flat():
    def kern(sh_ref, x_ref, o_ref):
        flat = x_ref[...].reshape(-1)
        o_ref[...] = pltpu.roll(flat, shift=sh_ref[0], axis=0).reshape(
            x_ref.shape
        )

    @jax.jit
    def run(x, sh):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(sh, x)

    x = jnp.arange(1 << 13, dtype=jnp.uint32).reshape(-1, 128)
    out = run(x, jnp.asarray([777], jnp.int32))
    want = np.roll(np.asarray(x).reshape(-1), 777).reshape(x.shape)
    print(f"E3b traced roll(flat): ok={(np.asarray(out) == want).all()}")


def e4_batched_row_sort(n):
    for logL in (13, 15, 17):
        L = 1 << logL
        R = n // L

        @jax.jit
        def srt(k1, k2):
            k1 = k1.reshape(R, L)
            k2 = k2.reshape(R, L)
            return jax.lax.sort((k1, k2), dimension=-1, num_keys=2)

        k1 = jnp.asarray(
            np.random.default_rng(0).integers(0, 2 ** 63, n, np.uint64)
        )
        k2 = jnp.arange(n, dtype=jnp.uint32)
        dt = timeit(srt, k1, k2)
        print(f"E4 row sort [{R}, 2^{logL}] (u64,u32): {dt*1e3:.1f} ms "
              f"({dt/n*1e9:.2f} ns/elem)")


def e5_flat_sort(n):
    @jax.jit
    def s2(k1, k2):
        return jax.lax.sort((k1, k2), dimension=-1, num_keys=2)

    @jax.jit
    def s1(k1, k2):
        a, b = jax.lax.sort((k1, k2), dimension=-1, num_keys=1,
                            is_stable=True)
        return a, b

    k1 = jnp.asarray(
        np.random.default_rng(0).integers(0, 2 ** 63, n, np.uint64)
    )
    k2 = jnp.arange(n, dtype=jnp.uint32)
    for name, fn in (("2key", s2), ("1key-stable", s1)):
        dt = timeit(fn, k1, k2)
        print(f"E5 flat sort {name} 2^{int(np.log2(n))}: {dt*1e3:.1f} ms "
              f"({dt/n*1e9:.2f} ns/elem)")


if __name__ == "__main__":
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for probe in (
        lambda: e1_copy_bandwidth(n),
        lambda: e2_dynamic_dma(n, 1024),
        lambda: e2_dynamic_dma(n, 8),
        lambda: e2_dynamic_dma(n, 1),
        e3_traced_roll,
        e3b_traced_roll_flat,
        lambda: e4_batched_row_sort(n),
        lambda: e5_flat_sort(n),
    ):
        try:
            probe()
        except Exception as e:  # noqa: BLE001 — probe failures are data
            print(f"PROBE FAIL: {type(e).__name__}: {str(e)[:300]}")
        sys.stdout.flush()
