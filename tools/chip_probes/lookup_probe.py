"""Chip probe: batch lookup bounds — binary search (searchsorted2) vs the
gather-free merge-join (lookup_bounds_merge) at query-path-realistic sizes.

Run SOLO: python tools/chip_probes/lookup_probe.py [log_T log_Q ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from kmer_hasher_tpu.ops import sort as srt  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t) / iters


def main():
    logs = [int(a) for a in sys.argv[1:]] or [24, 22, 24, 24]
    pairs = list(zip(logs[::2], logs[1::2]))
    rng = np.random.default_rng(0)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for log_t, log_q in pairs:
        T, Q = 1 << log_t, 1 << log_q
        keys = np.sort(rng.integers(0, 1 << 42, T, dtype=np.uint64))
        q = rng.integers(0, 1 << 42, Q, dtype=np.uint64)
        s_hi = jnp.asarray((keys >> 32).astype(np.uint32))
        s_lo = jnp.asarray((keys & 0xFFFFFFFF).astype(np.uint32))
        q_hi = jnp.asarray((q >> 32).astype(np.uint32))
        q_lo = jnp.asarray((q & 0xFFFFFFFF).astype(np.uint32))
        nv = jnp.asarray(T, jnp.int32)

        def bs(sh, sl, n, qh, ql):
            return (srt.searchsorted2(sh, sl, n, qh, ql, "left"),
                    srt.searchsorted2(sh, sl, n, qh, ql, "right"))

        bs_j = jax.jit(bs)
        dt_b = timeit(bs_j, s_hi, s_lo, nv, q_hi, q_lo)
        dt_m = timeit(srt.lookup_bounds_merge, s_hi, s_lo, nv, q_hi, q_lo)
        print(f"T=2^{log_t} Q=2^{log_q}: binary {dt_b*1e3:8.1f} ms "
              f"({dt_b/Q*1e9:6.1f} ns/q) | merge {dt_m*1e3:8.1f} ms "
              f"({dt_m/Q*1e9:6.1f} ns/q) | speedup {dt_b/dt_m:5.2f}x",
              flush=True)
        lb_b, ub_b = bs_j(s_hi, s_lo, nv, q_hi, q_lo)
        lb_m, ub_m = srt.lookup_bounds_merge(s_hi, s_lo, nv, q_hi, q_lo)
        same = (bool(jnp.array_equal(lb_b, lb_m))
                and bool(jnp.array_equal(ub_b, ub_m)))
        print(f"  equal: {same}", flush=True)


if __name__ == "__main__":
    main()
