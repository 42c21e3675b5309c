"""FSM scan iterators vs the oracle's sequential iterators — exact window
streams, including the pollution/telescoping quirks."""
import numpy as np
import pytest

from kmer_hasher_tpu import refsem as rs
from kmer_hasher_tpu.io import pad_records
from kmer_hasher_tpu.ops import scan_iter as si
from kmer_hasher_tpu.qll import Q_TO_LL


def fsm_windows(emit, fhi, flo, rhi, rlo, row):
    """Extract (end_1based, fwd, rc) triples for one row."""
    out = []
    e = np.asarray(emit[row])
    fh, fl = np.asarray(fhi[row]), np.asarray(flo[row])
    rh, rl = np.asarray(rhi[row]), np.asarray(rlo[row])
    for p in np.flatnonzero(e):
        fwd = (int(fh[p]) << 32) | int(fl[p])
        rc = (int(rh[p]) << 32) | int(rl[p])
        out.append((p + 1, fwd, rc))
    return out


def run_ll(reads, k, min_q):
    pr = pad_records([("r%d" % i, s, q) for i, (s, q) in enumerate(reads)])
    min_ll = float(Q_TO_LL[33 + min_q])
    return si.ll_scan(pr.seq, pr.qual, pr.lengths, k, min_ll)


def run_threshold(reads, k, min_q, has_qual=True):
    pr = pad_records([("r%d" % i, s, q) for i, (s, q) in enumerate(reads)])
    return si.threshold_scan(pr.seq, pr.qual, pr.lengths, k, 33 + min_q,
                             has_qual=has_qual)


def random_reads(n, lmin, lmax, seed, with_qual=True, n_prob=0.02):
    rng = np.random.default_rng(seed)
    reads = []
    for _ in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        s = rng.choice(list(b"ACGTacgt") + [ord("N")], size=L,
                       p=[.122] * 8 + [.024]).astype(np.uint8)
        q = (33 + rng.integers(0, 42, size=L)).astype(np.uint8)
        reads.append((s.tobytes(), q.tobytes() if with_qual else None))
    return reads


@pytest.mark.parametrize("k,min_q", [(1, 20), (2, 0), (5, 20), (21, 20),
                                     (31, 10), (32, 0), (17, 30)])
def test_ll_scan_matches_oracle(k, min_q):
    reads = random_reads(40, k - 2, 90, seed=k * 100 + min_q)
    outs = run_ll(reads, k, min_q)
    for r, (s, q) in enumerate(reads):
        want = (list(rs.iter_kmers_ll(s, q, k, min_q))
                if len(s) > k else [])
        got = fsm_windows(*outs, r)
        assert got == want, f"read {r} k={k} q={min_q}"


def test_ll_scan_real_fastq(test_fastq_gz):
    k, min_q = 21, 20
    reads = [(s, q) for (_n, s, q) in test_fastq_gz[:300]]
    outs = run_ll(reads, k, min_q)
    total = 0
    for r, (s, q) in enumerate(reads):
        want = list(rs.iter_kmers_ll(s, q, k, min_q)) if len(s) > k else []
        got = fsm_windows(*outs, r)
        assert got == want, f"read {r}"
        total += len(want)
    assert total > 1000


@pytest.mark.parametrize("k,min_q", [(1, 2), (5, 20), (21, 2), (16, 0)])
def test_threshold_scan_matches_oracle(k, min_q):
    reads = random_reads(40, k - 2, 90, seed=k * 7 + min_q)
    outs = run_threshold(reads, k, min_q)
    for r, (s, q) in enumerate(reads):
        want = (list(rs.iter_kmers_qual_threshold(s, q, k, 33 + min_q))
                if len(s) > k else [])
        got = fsm_windows(*outs, r)
        assert got == want, f"read {r} k={k} q={min_q}"


def test_threshold_scan_no_qual():
    k = 11
    reads = random_reads(30, 5, 80, seed=3, with_qual=False)
    outs = run_threshold(reads, k, 0, has_qual=False)
    for r, (s, _q) in enumerate(reads):
        want = (list(rs.iter_kmers_qual_threshold(s, None, k, 33))
                if len(s) > k else [])
        got = fsm_windows(*outs, r)
        assert got == want, f"read {r}"


def test_ll_scan_no_n_check():
    # the quality path encodes N as G and filters only on quality
    # (src/kmer_util.c:104 has no N test)
    s = b"ACGTNACGTA"
    q = b"J" * 10
    outs = run_ll([(s, q)], 4, 20)
    got = fsm_windows(*outs, 0)
    want = list(rs.iter_kmers_ll(s, q, 4, 20))
    assert got == want
    assert len(got) == 7  # every window emitted, N treated as G


def test_repeat40_ll_fsm(repeat_40_fq):
    k, min_q = 5, 0
    reads = [(s, q) for (_n, s, q) in repeat_40_fq]
    outs = run_ll(reads, k, min_q)
    for r, (s, q) in enumerate(reads):
        want = list(rs.iter_kmers_ll(s, q, k, min_q))
        assert fsm_windows(*outs, r) == want
