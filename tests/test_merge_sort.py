"""The hierarchical merge sort must equal lax.sort (stable by key with
payload tiebreak) bit-for-bit."""
import numpy as np
import jax.numpy as jnp
import jax

from kmer_hasher_tpu.ops import merge_sort as ms


def _rand(n, seed=0, dup_heavy=False):
    rng = np.random.default_rng(seed)
    if dup_heavy:  # repeat-dominated keys: adversarial for splits
        keys = rng.choice([0, 1, 2 ** 63, 2 ** 64 - 1, 42], size=n)
    else:
        keys = rng.integers(0, 2 ** 64 - 1, size=n, dtype=np.uint64)
    pay = rng.permutation(n).astype(np.uint32)
    return jnp.asarray(keys.astype(np.uint64)), jnp.asarray(pay)


def test_merge_path_splits_exact():
    rng = np.random.default_rng(1)
    L, T = 1 << 10, 1 << 7
    a = np.sort(rng.integers(0, 1 << 20, L).astype(np.uint64))
    b = np.sort(rng.integers(0, 1 << 20, L).astype(np.uint64))
    ap = np.arange(L, dtype=np.uint32)
    bp = np.arange(L, dtype=np.uint32)
    splits = np.asarray(ms.merge_path_splits(
        jnp.asarray(a), jnp.asarray(ap), jnp.asarray(b), jnp.asarray(bp), T
    ))
    merged = sorted([(int(k), 0, int(p)) for k, p in zip(a, ap)]
                    + [(int(k), 1, int(p)) for k, p in zip(b, bp)])
    # i_t must equal the count of A-elements in the first t*T of the
    # merge under (key, payload) lexicographic order with A preferred on
    # full ties... keys+payloads here collide across runs, so check the
    # defining inequality instead: A[:i] and B[:r-i] are a valid prefix
    for t, i in enumerate(splits):
        r = t * T
        j = r - i
        assert 0 <= i <= L and 0 <= j <= L
        if i > 0 and j < L:
            assert (a[i - 1], ap[i - 1]) <= (b[j], bp[j])
        if j > 0 and i < L:
            assert (b[j - 1], bp[j - 1]) <= (a[i], ap[i])


def test_bitonic_round_matches_reference_merge():
    rng = np.random.default_rng(2)
    L = 1 << 9
    a = np.sort(rng.integers(0, 1 << 16, L).astype(np.uint64))
    b = np.sort(rng.integers(0, 1 << 16, L).astype(np.uint64))
    k = jnp.asarray(np.stack([a, b]))
    p = jnp.asarray(np.stack([np.arange(L), np.arange(L)]).astype(np.uint32))
    mk, mp = ms._merge_round_bitonic(k, p)
    want_k, want_p = jax.lax.sort((k.reshape(-1), p.reshape(-1)),
                                  num_keys=2)
    np.testing.assert_array_equal(np.asarray(mk).reshape(-1), want_k)
    np.testing.assert_array_equal(np.asarray(mp).reshape(-1), want_p)


def test_sort_kmers_merge_equals_lax_sort():
    for n, Lt, seed, dup in [(1 << 14, 1 << 11, 0, False),
                             (1 << 14, 1 << 11, 1, True),
                             (1 << 16, 1 << 12, 2, False)]:
        key, pay = _rand(n, seed, dup)
        got_k, got_p = ms.sort_kmers_merge(key, pay, Lt=Lt)
        want_k, want_p = jax.lax.sort((key, pay), num_keys=2)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_small_input_falls_back():
    key, pay = _rand(1 << 8, 3)
    got_k, got_p = ms.sort_kmers_merge(key, pay)
    want_k, want_p = jax.lax.sort((key, pay), num_keys=2)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))


def test_kernel_path_interpret_matches_lax_sort():
    # Pallas merge kernel in interpret mode (CPU): bit parity with
    # lax.sort on random and duplicate-heavy data
    for n, Lt, T, seed, dup in [(1 << 13, 1 << 11, 1 << 9, 0, False),
                                (1 << 13, 1 << 11, 1 << 9, 1, True)]:
        key, pay = _rand(n, seed, dup)
        got_k, got_p = ms.sort_kmers_merge(key, pay, Lt=Lt, T=T,
                                           use_kernel=True, interpret=True)
        want_k, want_p = jax.lax.sort((key, pay), num_keys=2)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_sort_windows_merge_flag_parity(monkeypatch):
    monkeypatch.setenv("KMH_MERGE_SORT", "1")
    from kmer_hasher_tpu.ops import sort as srt

    rng = np.random.default_rng(5)
    n = 1 << 16
    for k in (21, 31, 32):
        hi = jnp.asarray(rng.integers(0, 2 ** 32, n, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 2 ** 32, n, dtype=np.uint32))
        pos = jnp.asarray(np.arange(1, n + 1, dtype=np.int32))
        valid = jnp.asarray(rng.random(n) < 0.9)
        got = srt.sort_windows.__wrapped__(hi, lo, pos, valid, k)
        monkeypatch.setenv("KMH_MERGE_SORT", "0")
        want = srt.sort_windows.__wrapped__(hi, lo, pos, valid, k)
        monkeypatch.setenv("KMH_MERGE_SORT", "1")
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
