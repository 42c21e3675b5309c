"""Chip probe: the pure-XLA hierarchical merge tree (ops/merge_sort.py)
vs flat lax.sort at bench-relevant sizes, plus tile-size sensitivity.

Run: python tools/chip_probes/merge_tree_probe.py [log_n]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from kmer_hasher_tpu.ops import merge_sort as ms  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=3):
    sync(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t) / iters


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << log_n
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2 ** 64 - 1, n, dtype=np.uint64))
    pay = jnp.asarray(rng.permutation(n).astype(np.uint32))
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)

    @jax.jit
    def flat(k, p):
        return jax.lax.sort((k, p), dimension=-1, num_keys=2)

    dt = timeit(flat, key, pay)
    print(f"flat lax.sort 2^{log_n}: {dt*1e3:.1f} ms "
          f"({dt/n*1e9:.2f} ns/elem)", flush=True)

    for logLt in (13, 15, 17):
        Lt = 1 << logLt

        @jax.jit
        def tree(k, p, Lt=Lt):
            return ms.sort_kmers_merge(k, p, Lt=Lt)

        try:
            got = tree(key, pay)
            ok = bool((np.asarray(got[0][:1 << 16])
                       == np.asarray(flat(key, pay)[0][:1 << 16])).all())
            dt = timeit(tree, key, pay)
            print(f"merge tree Lt=2^{logLt}: {dt*1e3:.1f} ms "
                  f"({dt/n*1e9:.2f} ns/elem) ok={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"merge tree Lt=2^{logLt} FAIL: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
