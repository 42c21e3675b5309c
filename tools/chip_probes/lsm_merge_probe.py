"""Chip probe: LSM tier merge — bitonic merge of two sorted runs vs the
full-re-sort merge, at counting-relevant sizes (each run N rows, counts_n=1).

The tier merge is the steady-state cost of the end-to-end counting path
(PERF.md "Round 2: end-to-end counting un-bottlenecked"); the bitonic merge
replaces ~60-90 comparator passes of lax.sort with log2(2N) fused
compare-exchange passes (index/count_store.py `_merge_runs_bitonic`).

Run SOLO (one chip process): python tools/chip_probes/lsm_merge_probe.py [log_n ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from kmer_hasher_tpu.index import count_store as cs  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t) / iters


def mkrun(rng, n, k, fill=0.9):
    """Sorted shadow-run: ~fill live sorted keys + dead tail."""
    live = int(n * fill)
    if 2 * k < 32:
        keys = np.sort(rng.integers(0, 1 << (2 * k), live, dtype=np.uint64))
    else:
        keys = np.sort(rng.integers(0, 1 << min(63, 2 * k), live,
                                    dtype=np.uint64))
    hi = np.full(n, 0xFFFFFFFF, np.uint32)
    lo = np.full(n, 0xFFFFFFFF, np.uint32)
    hi[:live] = (keys >> 32).astype(np.uint32)
    lo[:live] = (keys & 0xFFFFFFFF).astype(np.uint32)
    cnt = np.zeros((n, 1), np.uint32)
    cnt[:live, 0] = 1
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)


def main():
    logs = [int(a) for a in sys.argv[1:]] or [22, 24]
    rng = np.random.default_rng(0)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for k in (21, 12):
        for log_n in logs:
            n = 1 << log_n
            a = mkrun(rng, n, k)
            b = mkrun(rng, n, k)
            dt_s = timeit(lambda *x: cs._merge_runs_resort(*x, k=k), *a, *b)
            dt_b = timeit(lambda *x: cs._merge_runs_bitonic(*x, k=k), *a, *b)
            dt_k = timeit(
                lambda ah, al, bh, bl: cs._merge_runs_keyonly(
                    ah, al, bh, bl, k=k),
                a[0], a[1], b[0], b[1])
            m = 2 * n
            print(f"k={k} 2^{log_n}+2^{log_n}: resort {dt_s*1e3:7.1f} ms "
                  f"({dt_s/m*1e9:5.2f} ns/elem) | bitonic {dt_b*1e3:7.1f} ms "
                  f"({dt_b/m*1e9:5.2f} ns/elem, {dt_s/dt_b:4.2f}x) | "
                  f"keyonly {dt_k*1e3:7.1f} ms ({dt_k/m*1e9:5.2f} ns/elem, "
                  f"{dt_s/dt_k:4.2f}x)",
                  flush=True)
            # correctness spot check on-device output
            oh_s, ol_s, oc_s = cs._merge_runs_resort(*a, *b, k=k)
            oh_b, ol_b, oc_b = cs._merge_runs_bitonic(*a, *b, k=k)
            fs = cs._finalize_run_resort(oh_s, ol_s, oc_s, k=k)
            fb = cs._finalize_run_sorted(oh_b, ol_b, oc_b, k=k)
            same = (int(fs[3]) == int(fb[3]) and
                    bool(jnp.array_equal(fs[0], fb[0])) and
                    bool(jnp.array_equal(fs[2], fb[2])))
            print(f"  finalize-equal: {same} (n_unique={int(fb[3])})",
                  flush=True)


if __name__ == "__main__":
    main()
