"""Pallas FSM kernel (interpret mode) vs the lax.scan fast-mode FSM —
bit-identical (same f32 op order)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kmer_hasher_tpu.io import pad_records
from kmer_hasher_tpu.ops import scan_iter as si
from kmer_hasher_tpu.ops.pallas_scan import ll_scan_pallas
from kmer_hasher_tpu.qll import Q_TO_LL


def compare(reads, k, min_q):
    pr = pad_records([("r%d" % i, s, q) for i, (s, q) in enumerate(reads)])
    min_ll = float(Q_TO_LL[33 + min_q])
    want = si.ll_scan(pr.seq, pr.qual, pr.lengths, k,
                      jnp.asarray(min_ll), precision="fast")
    # pb=2 keeps interpret-mode cost low; on-chip runs use the default
    got = ll_scan_pallas(pr.seq, pr.qual, pr.lengths, k, min_ll,
                         interpret=True, pb=2)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    e = np.asarray(want[0])
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_array_equal(np.asarray(g)[e], np.asarray(w)[e])


def random_reads(n, lmin, lmax, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        s = rng.choice(list(b"ACGTacgtN"), size=L).astype(np.uint8)
        q = (33 + rng.integers(0, 42, size=L)).astype(np.uint8)
        out.append((s.tobytes(), q.tobytes()))
    return out


@pytest.mark.parametrize("k,min_q", [(5, 20), (21, 20), (32, 0), (16, 10)])
def test_pallas_fsm_matches_scan_fast(k, min_q):
    compare(random_reads(24, max(2, k - 2), 70, seed=k + min_q), k, min_q)


def test_pallas_fsm_real_fastq(test_fastq_gz):
    reads = [(s, q) for (_n, s, q) in test_fastq_gz[:48]]
    compare(reads, 21, 20)


@pytest.mark.parametrize("with_char", [False, True])
@pytest.mark.parametrize("k,min_q", [(21, 20), (13, 30)])
def test_pallas_fsm_borderline_flags(k, min_q, with_char):
    """In-kernel borderline flag == ll_scan(return_flags=True)'s flag
    (same comparisons, same tracked f32 error-bound arithmetic), with and
    without the analytic min_q threshold."""
    reads = random_reads(24, max(2, k - 2), 70, seed=100 + k)
    pr = pad_records([("r%d" % i, s, q) for i, (s, q) in enumerate(reads)])
    min_ll = float(Q_TO_LL[33 + min_q])
    mc = 33 + min_q if with_char else None
    want = si.ll_scan(pr.seq, pr.qual, pr.lengths, k, jnp.asarray(min_ll),
                      precision="fast", return_flags=True, min_q_char=mc)
    got = ll_scan_pallas(pr.seq, pr.qual, pr.lengths, k, min_ll,
                         interpret=True, pb=2, return_flags=True,
                         min_q_char=mc)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[5]), np.asarray(want[5]))


def test_pallas_flag_threshold_sweep_matches_ll_scan():
    """Sweep min_ll around an achievable window sum so the comparison
    lands inside the *tracked-error band*: low qualities make |ll| large,
    so the accumulated aerr/eerr bound is micro-scale and a 1e-6-step
    sweep reliably hits the region where the flag depends on error state
    carried ACROSS position blocks (pb=2 puts a block boundary every two
    positions). A kernel that drops the aerr/eerr block-boundary
    writeback under-flags at several of these thresholds (verified: this
    test fails against that bug), silently breaking hybrid's bitwise
    parity with exact."""
    k = 9
    rng = np.random.default_rng(1)
    B, L = 16, 40
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, size=(B, L))]
    qual = (33 + rng.integers(2, 11, size=(B, L))).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    # anchor on an actual f32 window sum (k+1 window = the FSM's first
    # completed-window comparison value)
    ll = np.asarray(si.analytic_ll_f32(jnp.asarray(qual))).astype(
        np.float64)
    sums = np.lib.stride_tricks.sliding_window_view(
        ll, k + 1, axis=1).sum(-1)
    anchor = np.sort(sums.ravel())[sums.size // 6]
    any_flag = False
    for off in (-3e-6, -2.5e-6, 0.0, 1.5e-6, 2e-6, 2.5e-6, 3e-6):
        min_ll = float(anchor + off)
        want = si.ll_scan(seq, qual, lengths, k, jnp.asarray(min_ll),
                          precision="fast", return_flags=True)
        got = ll_scan_pallas(seq, qual, lengths, k, min_ll,
                             interpret=True, pb=2, return_flags=True)
        np.testing.assert_array_equal(np.asarray(got[5]),
                                      np.asarray(want[5]),
                                      err_msg=f"flags diverge at off={off}")
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        any_flag |= bool(np.asarray(want[5]).any())
    assert any_flag  # the sweep actually exercised borderline territory
