"""Pallas encode kernel (interpret mode on CPU) vs the XLA encode path."""
import numpy as np
import pytest

from kmer_hasher_tpu.ops import encode as enc
from kmer_hasher_tpu.ops.pallas_encode import pallas_encode, pallas_encode_batch

RNG = np.random.default_rng(11)


def random_seq(L, n_prob=0.03):
    bases = RNG.choice([65, 67, 71, 84, 97, 116], size=L)
    mask = RNG.random(L) < n_prob
    bases[mask] = 78
    return bases.astype(np.uint8)


@pytest.mark.parametrize("k", [1, 4, 16, 17, 31, 32])
def test_pallas_matches_xla(k):
    L = 1000
    seq = random_seq(L)
    true_len = L - 7
    hi_p, lo_p, v_p = (np.asarray(a) for a in pallas_encode(
        seq, k, true_len, interpret=True))
    hi_x, lo_x, v_x = (np.asarray(a) for a in enc.encode_stream(
        seq, k, true_len))
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(hi_p[v_p], hi_x[v_x])
    np.testing.assert_array_equal(lo_p[v_p], lo_x[v_x])


@pytest.mark.parametrize("k", [4, 21, 32])
def test_pallas_batch_matches_xla(k):
    # mixed-length rows incl. a FULL row (lengths == L): windows crossing
    # into the next row must be masked by the range check, not by luck
    B, L = 16, 256
    seq = np.stack([random_seq(L) for _ in range(B)])
    lengths = RNG.integers(0, L + 1, size=B).astype(np.int32)
    lengths[0] = L
    lengths[1] = 0
    lengths[2] = k  # exactly one window
    hi_p, lo_p, v_p = (np.asarray(a) for a in pallas_encode_batch(
        seq, k, lengths, interpret=True))
    hi_x, lo_x, v_x = (np.asarray(a) for a in enc.encode_stream(
        seq, k, lengths))
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(hi_p[v_p], hi_x[v_x])
    np.testing.assert_array_equal(lo_p[v_p], lo_x[v_x])


@pytest.mark.parametrize("k", [4, 21])
def test_drop_trailing_mask_matches_window_valid(k):
    # drop_trailing_mask is the Pallas branches' form of the quirk; the XLA
    # window_valid pair is the spec, for 1-D and batched inputs alike
    L = 256
    for _ in range(3):
        seq = random_seq(L, n_prob=0.05)
        for tl in (L, L - 3, k, k - 1, 0):
            plain = np.asarray(enc.window_valid(seq, k, tl, False))
            quirk = np.asarray(enc.window_valid(seq, k, tl, True))
            mask = np.asarray(enc.drop_trailing_mask(seq, k, tl))
            np.testing.assert_array_equal(plain & mask, quirk)
    B = 8
    seq2 = np.stack([random_seq(L, n_prob=0.05) for _ in range(B)])
    lens = RNG.integers(0, L + 1, size=B).astype(np.int32)
    lens[0] = k
    plain = np.asarray(enc.window_valid(seq2, k, lens, False))
    quirk = np.asarray(enc.window_valid(seq2, k, lens, True))
    mask = np.asarray(enc.drop_trailing_mask(seq2, k, lens))
    np.testing.assert_array_equal(plain & mask, quirk)


def test_pallas_multiblock():
    # longer than one 32K block to exercise the halo row between blocks
    k = 21
    L = 70000
    seq = random_seq(L, n_prob=0.01)
    hi_p, lo_p, v_p = (np.asarray(a) for a in pallas_encode(
        seq, k, L, interpret=True))
    hi_x, lo_x, v_x = (np.asarray(a) for a in enc.encode_stream(seq, k, L))
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(hi_p[v_p], hi_x[v_x])
    np.testing.assert_array_equal(lo_p[v_p], lo_x[v_x])
