"""Minimal on-chip repro for the Pallas merge-path kernel: one merge
round at small size, full traceback, optional recursion-limit bump.

Run: python tools/chip_probes/kernel_repro.py [log_n] [recursion_limit]
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from kmer_hasher_tpu.ops import merge_sort as ms  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    if len(sys.argv) > 2:
        sys.setrecursionlimit(int(sys.argv[2]))
    n = 1 << log_n
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2 ** 64 - 1, n, dtype=np.uint64))
    pay = jnp.asarray(rng.permutation(n).astype(np.uint32))
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    want = jax.lax.sort((key, pay), dimension=-1, num_keys=2)
    try:
        t0 = time.perf_counter()
        got = ms.sort_kmers_merge(key, pay, Lt=1 << 13, T=1 << 13,
                                  use_kernel=True)
        sync(got)
        print(f"compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
        ok = bool((np.asarray(got[0]) == np.asarray(want[0])).all()
                  and (np.asarray(got[1]) == np.asarray(want[1])).all())
        print(f"ok={ok}", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            got = ms.sort_kmers_merge(key, pay, Lt=1 << 13, T=1 << 13,
                                      use_kernel=True)
        sync(got)
        dt = (time.perf_counter() - t0) / 3
        print(f"steady: {dt*1e3:.1f} ms ({dt/n*1e9:.2f} ns/elem)",
              flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
