"""Pallas encode kernel (interpret mode on CPU) vs the XLA encode path."""
import numpy as np
import pytest

from kmer_hasher_tpu.ops import encode as enc
from kmer_hasher_tpu.ops.pallas_encode import pallas_encode

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
