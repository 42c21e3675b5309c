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


def test_tiered_runs_bound_merge_work():
    """Size-tiering invariant: deferred adds never touch the base table,
    run capacities are distinct powers of two (binomial heap), and the
    number of runs stays O(log n_batches)."""
    k = 9
    st = CountStore(k)
    st.run_build_size = 1 << 10  # build a run per ~1k pending elements
    rng = np.random.default_rng(5)
    base_before = st.u_hi
    for _ in range(12):
        seq = rng.choice([65, 67, 71, 84], size=1200).astype(np.uint8)
        hi, lo, v = enc.encode_stream(seq, k, 1200, canonical=True)
        st.add_kmers(hi, lo, v, defer=True)
    assert st.u_hi is base_before  # base untouched until a read folds
    caps = [int(r[0].shape[0]) for r in st._runs]
    assert len(caps) == len(set(caps))  # tiers hold distinct capacities
    assert len(caps) <= 5  # ~log2(12) runs, not 12
    # folding yields the same counts as eager addition
    eager = CountStore(k)
    rng = np.random.default_rng(5)
    for _ in range(12):
        seq = rng.choice([65, 67, 71, 84], size=1200).astype(np.uint8)
        hi, lo, v = enc.encode_stream(seq, k, 1200, canonical=True)
        eager.add_kmers(hi, lo, v)
    assert st.counts_dict() == eager.counts_dict()
    assert not st._runs  # fold consumed the runs


def test_no_host_sync_on_deferred_path():
    """total_added and n_unique must not force per-batch folds."""
    k = 7
    st = CountStore(k)
    rng = np.random.default_rng(11)
    for _ in range(4):
        seq = rng.choice([65, 67, 71, 84], size=500).astype(np.uint8)
        hi, lo, v = enc.encode_stream(seq, k, 500, canonical=True)
        st.add_kmers(hi, lo, v, defer=True)
    assert st._pending  # nothing folded yet
    assert st.total_added[0] == 4 * (500 - k + 1)  # device accumulator
    assert st._pending  # reading total_added didn't fold
    assert st.n_unique > 0  # this folds
    assert not st._pending and not st._runs


def _spill_drive(st, seeds=(21, 22, 23, 24, 25, 26), L=1500, k=9):
    eager = CountStore(k)
    for s in seeds:
        rng = np.random.default_rng(s)
        seq = rng.choice([65, 67, 71, 84], size=L).astype(np.uint8)
        hi, lo, v = enc.encode_stream(seq, k, L, canonical=True)
        st.add_kmers(hi, lo, v, defer=True)
        eager.add_kmers(hi, lo, v)
    return eager


def test_spill_to_host_memory_matches_eager():
    """With a tiny spill budget, large runs move off-device between adds
    and fold back transparently at read time."""
    k = 9
    st = CountStore(k, spill_bytes=4096)
    st.run_build_size = 1 << 9
    eager = _spill_drive(st, k=k)
    assert st._spilled  # something actually spilled off-device
    assert st._spilled[0][0] == "mem"
    assert st.counts_dict() == eager.counts_dict()
    assert not st._spilled  # fold consumed the spilled runs
    # store stays usable after a spill-fold cycle
    rng = np.random.default_rng(99)
    seq = rng.choice([65, 67, 71, 84], size=500).astype(np.uint8)
    hi, lo, v = enc.encode_stream(seq, k, 500, canonical=True)
    st.add_kmers(hi, lo, v)
    eager.add_kmers(hi, lo, v)
    assert st.counts_dict() == eager.counts_dict()


def test_spill_to_disk_matches_eager(tmp_path):
    k = 9
    st = CountStore(k, spill_bytes=4096, spill_dir=str(tmp_path))
    st.run_build_size = 1 << 9
    eager = _spill_drive(st, k=k)
    assert st._spilled and st._spilled[0][0] == "file"
    import os as _os
    assert _os.path.exists(st._spilled[0][1])
    assert st.counts_dict() == eager.counts_dict()
    assert not st._spilled
    assert not list(tmp_path.glob("kmh_spill_*"))  # files cleaned up


def test_k32_all_g_kmer_survives_dead_sentinel():
    """k=32 all-G kmers share the all-ones key with dead rows; the
    tie-break flag must keep their counts intact through run merges."""
    k = 32
    st = CountStore(k)
    st.run_build_size = 1 << 6
    g = np.frombuffer(b"G" * 40 + b"A" + b"G" * 33, np.uint8)
    for _ in range(3):
        hi, lo, v = enc.encode_stream(g, k, g.shape[0], canonical=False)
        st.add_kmers(hi, lo, v, defer=True)
    d = st.counts_dict()
    all_g = (1 << 64) - 1
    # windows of all-G: 9 per pass from the 40-G head, 2 from the 33-G tail
    assert d[all_g] == [3 * (9 + 2)]
    assert all(vv[0] > 0 for vv in d.values())
