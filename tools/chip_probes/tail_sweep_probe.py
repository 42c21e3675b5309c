"""Sweep the bitonic merge's row-sort tail size (log_tail) at the
current default fused-pass depth. TAIL_ENV selects log_tail; one job per
value. Full 2^24 (u64, u32-count) merge, the LSM tier-merge hot shape."""
import os
import sys
import time

tail = int(os.environ.pop("TAIL_ENV", "11"))

if "__file__" in globals():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from kmer_hasher_tpu.ops import sort as srt  # noqa: E402


def main():
    n = 1 << 23
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(0, 2 ** 63, n).astype(np.uint64))
    b = np.sort(rng.integers(0, 2 ** 63, n).astype(np.uint64))
    a_hi = jnp.asarray((a >> 32).astype(np.uint32))
    a_lo = jnp.asarray(a.astype(np.uint32))
    b_hi = jnp.asarray((b >> 32).astype(np.uint32))
    b_lo = jnp.asarray(b.astype(np.uint32))
    cnt = jnp.ones(n, jnp.uint32)

    @jax.jit
    def merge(ah, al, ac, bh, bl, bc):
        lanes = [jnp.concatenate([ah, bh[::-1]]),
                 jnp.concatenate([al, bl[::-1]]),
                 jnp.concatenate([ac, bc[::-1]])]
        out = srt.bitonic_merge_lanes(lanes, 2, log_tail=tail)
        return out[0], out[1], out[2]

    o = merge(a_hi, a_lo, cnt, b_hi, b_lo, cnt)
    np.asarray(o[0][:1])
    t = time.perf_counter()
    iters = 5
    for _ in range(iters):
        o = merge(a_hi, a_lo, cnt, b_hi, b_lo, cnt)
    np.asarray(o[0][:1])
    dt = (time.perf_counter() - t) / iters
    M = 2 * n
    print(f"TAIL=2^{tail}: full 2^24 merge {dt*1e3:.1f} ms = "
          f"{dt/M*1e9:.3f} ns/elem", flush=True)
    oh, ol = np.asarray(o[0]), np.asarray(o[1])
    keys = (oh.astype(np.uint64) << np.uint64(32)) | ol.astype(np.uint64)
    assert (keys == np.sort(np.concatenate([a, b]))).all(), "wrong"
    print("bitwise-correct", flush=True)


if __name__ == "__main__" or __name__ == "__chip_job__":
    main()
