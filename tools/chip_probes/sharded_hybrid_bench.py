"""Sharded hybrid-vs-fast e2e bench on the real chip (VERDICT r3 item 2).

Round 3's sharded hybrid re-ran a shard's WHOLE row block in emulated f64
under lax.cond whenever any read flagged; round 4 ports the single-chip
compaction (flagged rows gather into a 256-row exact sub-batch per
shard). This bench prices the result: ShardedCountStore.add_reads on a
1-chip mesh over identical pre-staged batches in fast / hybrid / exact
modes. Bar: hybrid within ~1.5x of fast on borderline-carrying quals
(single-chip round 3: 426k vs 553k reads/s).

Env: SHB_BATCHES (16), SHB_K (21), SHB_ROWS (auto).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "__file__" in globals():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from kmer_hasher_tpu.counting import win_bucket  # noqa: E402
from kmer_hasher_tpu.parallel.sharded import ShardedCountStore  # noqa: E402
from kmer_hasher_tpu.qll import Q_TO_LL  # noqa: E402


def sync1(x):
    return np.asarray(x.ravel()[:1])


def make_batches(n_batches, rows, read_len, seed=0):
    from kmer_hasher_tpu.io.fastx import col_bucket

    Lp = col_bucket(read_len)
    NUC = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        seq = NUC[jax.random.randint(k1, (rows, Lp), 0, 4)]
        col = jnp.arange(Lp)[None, :]
        seq = jnp.where(col < read_len, seq, jnp.uint8(ord("N")))
        qual = jax.random.randint(k2, (rows, Lp), 63, 74).astype(jnp.uint8)
        low = jax.random.uniform(k3, (rows, Lp)) < 0.02
        lowq = jax.random.randint(k4, (rows, Lp), 35, 53).astype(jnp.uint8)
        return seq, jnp.where(low, lowq, qual)

    out = []
    for i in range(n_batches):
        out.append(gen(jax.random.PRNGKey(seed * 777 + i)))
    sync1(out[-1][0])
    return out, Lp


def run(batches, lengths, has_qual, k, nw, precision, min_q=20):
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shards",))
    store = ShardedCountStore(k, mesh, counts_n=1)
    min_ll_f = float(Q_TO_LL[33 + min_q])
    for seq, qual in batches:
        store.add_reads(seq, qual, lengths, has_qual, min_ll_f,
                        precision=precision, source=0, with_q=True,
                        with_noq=False, min_q_char=33 + min_q, n_win=nw)
    for r in store._runs:
        sync1(r[0])
    return store


def main():
    n_batches = int(os.environ.get("SHB_BATCHES", "16"))
    k = int(os.environ.get("SHB_K", "21"))
    read_len = 151
    nw = win_bucket(read_len, k)
    rows = int(os.environ.get("SHB_ROWS",
                              str((1 << 22) // nw // 1024 * 1024)))
    n_reads = n_batches * rows
    print(f"sharded hybrid bench: {n_batches} x {rows} x {read_len} bp, "
          f"k={k}, {n_reads:,} reads", flush=True)
    batches, _ = make_batches(n_batches, rows, read_len)
    lengths = jnp.full((rows,), read_len, jnp.int32)
    has_qual = jnp.ones((rows,), bool)

    # how many reads genuinely flag? (context for the hybrid figure)
    from kmer_hasher_tpu.ops import scan_iter as si

    min_ll = jnp.asarray(float(Q_TO_LL[53]))

    @jax.jit
    def count_flags(seq, qual):
        out = si.ll_scan(seq, qual, lengths, k, min_ll, precision="fast",
                         return_flags=True, min_q_char=53)
        return out[5].sum()

    n_flags = sum(int(count_flags(s, q)) for s, q in batches)
    print(f"genuine borderline flags: {n_flags} / {n_reads} reads",
          flush=True)

    results = {}
    stores = {}
    for mode in ("fast", "hybrid", "exact"):
        t0 = time.time()
        st = run(batches, lengths, has_qual, k, nw, mode)
        cold = time.time() - t0
        t0 = time.time()
        st = run(batches, lengths, has_qual, k, nw, mode)
        warm = time.time() - t0
        results[mode] = warm
        stores[mode] = st
        print(f"{mode}: warm {warm:.2f}s = {n_reads / warm:,.0f} reads/s "
              f"(cold {cold:.1f}s)", flush=True)
    # hybrid must equal exact bitwise
    he = stores["hybrid"]
    ex = stores["exact"]
    eq = (int(he.peek_n_unique()) == int(ex.peek_n_unique())
          and bool((np.asarray(he.spectrum(5))
                    == np.asarray(ex.spectrum(5))).all()))
    ratio = results["hybrid"] / results["fast"]
    import json

    print("SHARDED_HYBRID " + json.dumps({
        "reads": n_reads, "k": k, "flags": n_flags,
        "fast_rps": round(n_reads / results["fast"]),
        "hybrid_rps": round(n_reads / results["hybrid"]),
        "exact_rps": round(n_reads / results["exact"]),
        "hybrid_over_fast": round(ratio, 3),
        "hybrid_eq_exact": bool(eq),
    }), flush=True)
    assert eq, "hybrid != exact"


if __name__ == "__main__" or __name__ == "__chip_job__":
    main()
