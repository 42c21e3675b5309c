"""Deferred (log-structured) merging must be observably identical to eager
merging, flushing transparently on every read."""
import numpy as np

from kmer_hasher_tpu.index.count_store import CountStore
from kmer_hasher_tpu.ops import encode as enc


def _batches(seed, n_batches=6, L=200, k=9):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        seq = rng.choice([65, 67, 71, 84], size=L).astype(np.uint8)
        yield enc.encode_stream(seq, k, L, canonical=True)


def test_defer_matches_eager():
    k = 9
    eager = CountStore(k)
    lazy = CountStore(k)
    for (hi, lo, v), (hi2, lo2, v2) in zip(_batches(1), _batches(1)):
        eager.add_kmers(hi, lo, v)
        lazy.add_kmers(hi2, lo2, v2, defer=True)
    assert lazy._pending  # something actually deferred
    assert lazy.counts_dict() == eager.counts_dict()  # read flushes
    assert not lazy._pending
    np.testing.assert_array_equal(lazy.spectrum(20), eager.spectrum(20))
    assert lazy.n_unique == eager.n_unique


def test_defer_multi_source_and_requery():
    k = 7
    lazy = CountStore(k, counts_n=2)
    batches = list(_batches(3, n_batches=4, k=k))
    for i, (hi, lo, v) in enumerate(batches):
        lazy.add_kmers(hi, lo, v, source=i % 2, defer=True)
    d1 = lazy.counts_dict()
    # keep adding after a flush; totals must accumulate
    for hi, lo, v in batches:
        lazy.add_kmers(hi, lo, v, source=0, defer=True)
    d2 = lazy.counts_dict()
    assert sum(v[0] + v[1] for v in d2.values()) == 2 * sum(
        v[0] + v[1] for v in d1.values()
    )


def test_defer_auto_flush_threshold():
    k = 5
    lazy = CountStore(k)
    rng = np.random.default_rng(9)
    # push enough deferred volume to trip the auto-flush (>= 1<<16 pending)
    for _ in range(3):
        seq = rng.choice([65, 67, 71, 84], size=40000).astype(np.uint8)
        hi, lo, v = enc.encode_stream(seq, k, 40000, canonical=True)
        lazy.add_kmers(hi, lo, v, defer=True)
    assert lazy.n_unique > 0  # auto-flush ran without an explicit read
