"""On-chip validation + timing of the Pallas merge kernel and the k=32
single-key-sort branch, followed by a bench.py-equivalent headline check.

Run: python tools/chip_probes/kernel_bench.py
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
    def flat2(k, p):
        return jax.lax.sort((k, p), dimension=-1, num_keys=2)

    want = flat2(key, pay)
    dt_flat = timeit(flat2, key, pay)
    print(f"flat 2key 2^{log_n}: {dt_flat*1e3:.1f} ms "
          f"({dt_flat/n*1e9:.2f} ns/elem)", flush=True)

    # Pallas merge kernel path: correctness then rate, over tile sizes
    for Lt, T in ((1 << 13, 1 << 13), (1 << 15, 1 << 13),
                  (1 << 13, 1 << 14)):
        label = f"kernel Lt=2^{Lt.bit_length()-1} T=2^{T.bit_length()-1}"
        try:
            @jax.jit
            def kpath(k, p, Lt=Lt, T=T):
                return ms.sort_kmers_merge(k, p, Lt=Lt, T=T,
                                           use_kernel=True)

            got = kpath(key, pay)
            ok = bool(
                (np.asarray(got[0][:1 << 18])
                 == np.asarray(want[0][:1 << 18])).all()
                and (np.asarray(got[1][:1 << 18])
                     == np.asarray(want[1][:1 << 18])).all()
            )
            dt = timeit(kpath, key, pay)
            print(f"{label}: {dt*1e3:.1f} ms ({dt/n*1e9:.2f} ns/elem) "
                  f"ok={ok} speedup={dt_flat/dt:.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001 — probe data
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # headline preview: build_index_arrays at k=32 (single-key branch)
    from kmer_hasher_tpu.index.position_index import build_index_arrays

    NUC = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
    L = 1 << 25

    @jax.jit
    def gen(seed):
        return NUC[jax.random.randint(jax.random.PRNGKey(seed), (L,), 0, 4)]

    seq = gen(0)

    @jax.jit
    def build8(seq):
        def body(i, carry):
            seq, acc = carry
            seq = seq.at[i].set(NUC[i % 4])
            s_hi, _sl, _sp, n_valid, _st, _sg = build_index_arrays(
                seq, 32, L
            )
            return seq, acc + n_valid + s_hi[0].astype(jnp.int32)

        _, acc = jax.lax.fori_loop(0, 8, body, (seq, jnp.int32(0)))
        return acc

    dt = timeit(build8, seq, iters=2) / 8
    print(f"index build k=32 2^25: {dt*1e3:.1f} ms -> "
          f"{L/dt/1e6:.0f} Mkmers/s", flush=True)


if __name__ == "__main__":
    main()
