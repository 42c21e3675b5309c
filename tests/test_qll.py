import numpy as np

from kmer_hasher_tpu.qll import Q_TO_LL, derive_q_to_ll, min_ll_for_phred


def test_table_matches_derivation():
    derived = derive_q_to_ll()
    # exact over the realistic quality range ('!'..'J' and beyond);
    # the reference's R-generated constants drift by ulps only at phred>100
    np.testing.assert_allclose(Q_TO_LL, derived, rtol=0, atol=1e-14)
    assert (Q_TO_LL[:34] == -708.0).all()
    assert (np.diff(Q_TO_LL[33:]) >= 0).all()  # monotone non-decreasing


def test_min_ll():
    assert min_ll_for_phred(20) == Q_TO_LL[53]
    assert min_ll_for_phred(0) == -708.0
