"""kmer_tree budget 'drop' semantics (src/kmer_tree.c:51-76).

The reference silently stops allocating dense prefix blocks past
max_size and drops k-mers of unallocated prefixes while still counting
the rest (add_kmer returns -2). ``CountStore(budget_semantics='drop')``
reproduces that: the first max_size // block_bytes distinct prefixes to
appear (in stream order) get blocks, everything later is dropped.
PARITY.md dev 7 documents the one remaining deviation: within the single
sorted RUN that crosses the budget, admission is in key order.
"""
import numpy as np
import pytest

from kmer_hasher_tpu.index.count_store import CountStore


def ktree_drop_oracle(kmers, b_max, suffix_bits):
    """Sequential transliteration of the C budget walk: allocate a block
    on first sight of a prefix while fewer than b_max exist; count a
    k-mer iff its prefix has a block (src/kmer_tree.c:51-76)."""
    admitted, counts, dropped = set(), {}, 0
    for km in kmers:
        p = km >> suffix_bits
        if p not in admitted:
            if len(admitted) < b_max:
                admitted.add(p)
            else:
                dropped += 1
                continue
        counts[km] = counts.get(km, 0) + 1
    return admitted, counts, dropped


def make_store(**kw):
    # k=4, prefix 4 / suffix 4 bits: block = 4 * 2^4 = 64 bytes
    return CountStore(4, counts_n=1, prefix_bits=4, suffix_bits=4,
                      mode="ktree", **kw)


def add_stream(store, kmers):
    kmers = np.asarray(kmers, np.uint64)
    store.add_kmers(
        np.zeros(len(kmers), np.uint32), kmers.astype(np.uint32),
        np.ones(len(kmers), bool))


STREAM = [  # prefixes: 1,2,1,3,2,1,4,3  (first-come: 1,2,3,...)
    0x12, 0x25, 0x13, 0x31, 0x2A, 0x12, 0x4F, 0x35,
]


def test_drop_stream_matches_oracle():
    """add_kmers carries true stream order: admission and counts must
    equal the sequential C walk exactly, budget at 2 blocks."""
    store = make_store(max_size_bytes=2 * 64, budget_semantics="drop")
    add_stream(store, STREAM)
    admitted, counts, dropped = ktree_drop_oracle(STREAM, 2, 4)
    assert set(int(p) for p in store._admitted) == admitted  # {1, 2}
    assert store._admit_frozen
    got = {km: c[0] for km, c in store.counts_dict().items()}
    assert got == counts
    assert int(store.total_added[0]) == len(STREAM) - dropped
    # later batches: an already-admitted prefix still counts, new ones
    # never do (the C can never allocate again once it refused)
    add_stream(store, [0x11, 0x77])
    got = {km: c[0] for km, c in store.counts_dict().items()}
    assert got == {**counts, 0x11: 1}
    # ktree spectrum zero-cells come from the ADMITTED blocks only
    spec = store.spectrum(10)
    assert spec[1:].sum() == len(got)
    assert spec[0] == 2 * 16 - len(got)


def test_drop_run_path_matches_oracle_between_batches():
    """add_run (sorted runs, the fused counting path) must agree with the
    oracle whenever no single run straddles the budget boundary."""
    store = make_store(max_size_bytes=2 * 64, budget_semantics="drop")
    b1 = [0x12, 0x25, 0x13, 0x2A]          # prefixes {1, 2}: fills budget
    b2 = [0x31, 0x12, 0x4F, 0x35]          # {3, 4} all dropped, 0x12 kept
    for batch in (b1, b2):
        keys = np.asarray(sorted(batch), np.uint64)
        uniq, cnts = np.unique(keys, return_counts=True)
        cap = 8
        hi = np.zeros(cap, np.uint32)
        lo = np.full(cap, 0xFFFFFFFF, np.uint32)
        hi[len(uniq):] = 0xFFFFFFFF
        lo[:len(uniq)] = uniq.astype(np.uint32)
        cnt = np.zeros((cap, 1), np.uint32)
        cnt[:len(uniq), 0] = cnts
        import jax.numpy as jnp
        store.add_run(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt),
                      jnp.asarray([len(batch)], np.int64))
    admitted, counts, dropped = ktree_drop_oracle(b1 + b2, 2, 4)
    assert set(int(p) for p in store._admitted) == admitted
    got = {km: c[0] for km, c in store.counts_dict().items()}
    assert got == counts
    assert int(store.total_added[0]) == len(b1 + b2) - dropped


def test_drop_boundary_run_admits_in_key_order():
    """A single run straddling the budget admits in key order (the
    documented PARITY dev-7 caveat): budget 2, one run with prefixes
    {3, 1, 2} admits {1, 2} regardless of stream order."""
    store = make_store(max_size_bytes=2 * 64, budget_semantics="drop")
    import jax.numpy as jnp

    uniq = np.asarray([0x15, 0x27, 0x33], np.uint64)  # sorted keys
    hi = np.zeros(4, np.uint32)
    hi[3:] = 0xFFFFFFFF
    lo = np.full(4, 0xFFFFFFFF, np.uint32)
    lo[:3] = uniq.astype(np.uint32)
    cnt = np.zeros((4, 1), np.uint32)
    cnt[:3, 0] = 1
    store.add_run(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt),
                  jnp.asarray([3], np.int64))
    assert sorted(int(p) for p in store._admitted) == [1, 2]
    assert store._admit_frozen
    assert int(store.total_added[0]) == 2
    assert store.n_unique == 2


def test_drop_checkpoint_roundtrip(tmp_path):
    """The admitted-prefix set and frozen flag survive save/load, so a
    resumed run keeps dropping exactly the same prefixes."""
    from kmer_hasher_tpu.utils.checkpoint import (load_count_store,
                                                  save_count_store)

    store = make_store(max_size_bytes=2 * 64, budget_semantics="drop")
    add_stream(store, STREAM)
    p = str(tmp_path / "drop.npz")
    save_count_store(store, p)
    back = load_count_store(p)
    assert back.budget_semantics == "drop"
    assert back._admit_frozen
    np.testing.assert_array_equal(back._admitted, store._admitted)
    add_stream(back, [0x11, 0x77])  # 0x7? still dropped after resume
    got = {km: c[0] for km, c in back.counts_dict().items()}
    assert 0x11 in got and not any(km >> 4 == 7 for km in got)


def test_drop_mode_validation():
    with pytest.raises(ValueError, match="budget_semantics"):
        make_store(max_size_bytes=64, budget_semantics="nope")
    with pytest.raises(ValueError, match="requires"):
        make_store(budget_semantics="drop")  # no max_size_bytes
    with pytest.raises(ValueError, match="requires"):
        CountStore(4, mode="sh", max_size_bytes=64,
                   budget_semantics="drop")


def test_error_mode_unchanged():
    """Default budget semantics still raise (the strictly-noisier
    deviation stays the default)."""
    store = make_store(max_size_bytes=1 * 64)  # 1 block budget
    with pytest.raises(MemoryError, match="budget"):
        add_stream(store, STREAM)
        store.flush()
