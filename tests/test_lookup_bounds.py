"""Merge-join lookup bounds (ops.sort.lookup_bounds_merge) vs the binary
search, including dead tails, duplicate keys, absent keys, and the all-ones
query that shares the dead sentinel's segment."""
import jax.numpy as jnp
import numpy as np
import pytest

from kmer_hasher_tpu.ops import sort as srt


@pytest.mark.parametrize("trial", range(6))
def test_lookup_bounds_merge_matches_binary_search(trial):
    rng = np.random.default_rng(trial)
    T = int(rng.choice([64, 256, 1024]))
    Q = int(rng.choice([16, 64, 256, 1000]))
    nv = int(rng.integers(1, T + 1))
    keys = np.sort(rng.integers(0, 1 << 40, nv, dtype=np.uint64))
    keys = np.sort(rng.choice(keys, nv))  # force duplicates
    s_hi = np.zeros(T, np.uint32)  # dead tail keyed ZERO (count-store form)
    s_lo = np.zeros(T, np.uint32)
    s_hi[:nv] = (keys >> np.uint64(32)).astype(np.uint32)
    s_lo[:nv] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    q = rng.integers(0, 1 << 40, Q, dtype=np.uint64)
    q[: Q // 4] = rng.choice(keys, Q // 4)  # present keys
    if trial == 5:
        q[0] = (1 << 64) - 1  # all-ones query vs re-keyed dead rows
    q_hi = (q >> np.uint64(32)).astype(np.uint32)
    q_lo = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    args = (jnp.asarray(s_hi), jnp.asarray(s_lo), jnp.asarray(nv),
            jnp.asarray(q_hi), jnp.asarray(q_lo))
    lb_m, ub_m = srt.lookup_bounds_merge(*args)
    lb_b = srt.searchsorted2(args[0], args[1], nv, args[3], args[4], "left")
    ub_b = srt.searchsorted2(args[0], args[1], nv, args[3], args[4],
                             "right")
    np.testing.assert_array_equal(np.asarray(lb_m), np.asarray(lb_b))
    np.testing.assert_array_equal(np.asarray(ub_m), np.asarray(ub_b))


def test_lookup_bounds_dispatch():
    """Small query batches take the binary search; large ones the merge
    (same results either way)."""
    s_hi = jnp.zeros(1024, jnp.uint32)
    s_lo = jnp.arange(1024, dtype=jnp.uint32) * 2
    q_lo_small = jnp.asarray([3, 4], jnp.uint32)
    q_hi_small = jnp.zeros(2, jnp.uint32)
    lb, ub = srt.lookup_bounds(s_hi, s_lo, 1024, q_hi_small, q_lo_small)
    assert lb.tolist() == [2, 2] and ub.tolist() == [2, 3]
    q_lo_big = jnp.arange(1024, dtype=jnp.uint32)
    q_hi_big = jnp.zeros(1024, jnp.uint32)
    lb, ub = srt.lookup_bounds(s_hi, s_lo, 1024, q_hi_big, q_lo_big)
    lb_b = srt.searchsorted2(s_hi, s_lo, 1024, q_hi_big, q_lo_big, "left")
    ub_b = srt.searchsorted2(s_hi, s_lo, 1024, q_hi_big, q_lo_big, "right")
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb_b))
    np.testing.assert_array_equal(np.asarray(ub), np.asarray(ub_b))


@pytest.mark.parametrize("seed", range(4))
def test_expand_rank_merge_matches_binary_search(seed):
    """The i64 expansion rank (merge-join) must equal searchsorted-right,
    including empty groups (duplicate cumulative values), a dead tail,
    and g beyond the live total."""
    rng = np.random.default_rng(seed)
    T = int(rng.choice([64, 512]))
    nv = int(rng.integers(1, T + 1))
    m = rng.integers(0, 4, nv)  # group sizes incl. EMPTY groups
    cum = np.zeros(T, np.int64)
    cum[:nv] = np.cumsum(m)
    cum[nv:] = 0  # garbage beyond the live prefix (must be masked)
    Q = int(rng.choice([64, 256]))
    start = int(rng.integers(0, max(1, int(cum[nv - 1]) + 4)))
    g = (start + np.arange(Q)).astype(np.int64)
    w_m = srt.expand_rank_merge_i64(jnp.asarray(cum), jnp.asarray(nv),
                                    jnp.asarray(g))
    w_b = srt.searchsorted_i64(jnp.asarray(cum), jnp.asarray(g),
                               jnp.asarray(nv), side="right")
    np.testing.assert_array_equal(np.asarray(w_m), np.asarray(w_b))
