"""Chip probe: chunk-expansion rank — binary search (searchsorted_i64) vs
the gather-free merge-join (expand_rank_merge_i64) at pair-streaming
realistic sizes, plus the full _pair_chunk program both ways.

T = cumulative-offset table length (index rows), Q = chunk capacity.

Run SOLO: python tools/chip_probes/expand_probe.py [log_T log_Q ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from kmer_hasher_tpu.ops import sort as srt  # noqa: E402

I32 = jnp.int32
I64 = jnp.int64


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
    logs = [int(a) for a in sys.argv[1:]] or [24, 20, 22, 20, 24, 16]
    pairs = list(zip(logs[::2], logs[1::2]))
    rng = np.random.default_rng(0)
    sync(jnp.zeros(8, jnp.uint32))
    print("device ready", flush=True)
    for log_t, log_q in pairs:
        T, Q = 1 << log_t, 1 << log_q
        # group sizes ~ Zipf-ish small counts, like a genome index
        m = rng.integers(1, 5, T).astype(np.int64)
        cum = np.cumsum(m)
        total = int(cum[-1])
        g0 = int(rng.integers(0, max(1, total - Q)))
        g = (g0 + np.arange(Q)).astype(np.int64)
        cum_d = jnp.asarray(cum)
        g_d = jnp.asarray(g)
        nv = jnp.asarray(T, I32)

        bs = jax.jit(lambda c, q, n: srt.searchsorted_i64(c, q, n, "right"))
        mg = jax.jit(srt.expand_rank_merge_i64)
        t_bs = timeit(bs, cum_d, g_d, nv)
        t_mg = timeit(mg, cum_d, nv, g_d)
        w_bs = np.asarray(bs(cum_d, g_d, nv))
        w_mg = np.asarray(mg(cum_d, nv, g_d))
        assert (w_bs == w_mg).all(), "rank mismatch"
        print(f"T=2^{log_t} Q=2^{log_q}: binary {t_bs*1e3:8.2f} ms "
              f"({t_bs/Q*1e9:6.1f} ns/row)  merge {t_mg*1e3:8.2f} ms "
              f"({t_mg/Q*1e9:6.1f} ns/row)  speedup {t_bs/t_mg:5.2f}x",
              flush=True)

        # full _pair_chunk both ways (rank + payload gathers + stack)
        from kmer_hasher_tpu.index.position_index import _pair_chunk
        s_pos = jnp.asarray(rng.integers(1, 1 << 30, T, dtype=np.int64)
                            .astype(np.int32))
        i_col = jnp.asarray(np.arange(1, T + 1, dtype=np.int32))
        m_d = jnp.asarray(m.astype(np.int32))
        start = jnp.asarray(g0, I64)

        def chunk(sp, ic, mm, cc, n, st):
            return _pair_chunk(sp, ic, mm, cc, n, st, Q)

        t_new = timeit(jax.jit(chunk), s_pos, i_col, m_d, cum_d, nv, start)
        print(f"  _pair_chunk (merge rank): {t_new*1e3:8.2f} ms "
              f"({t_new/Q*1e9:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
