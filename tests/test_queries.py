"""seq.kmer.pos and kmer.pairs device paths vs the oracle — exact row-order
equality (query-stream order is deterministic in the reference)."""
import numpy as np
import pytest

from kmer_hasher_tpu import refsem as rs
from kmer_hasher_tpu.api import kmer_pairs, make_kmer_hash, seq_kmer_pos


def test_baseline_config_seq_kmer_pos_k16(test_fa):
    """BASELINE config 2: index test.fa, query a second sequence, k=16."""
    k = 16
    idx = make_kmer_hash(test_fa, k)
    h = rs.make_kmer_hash(test_fa, k)
    # a query mixing indexed material, novel sequence, Ns and case
    query = (test_fa[5000:5400] + "N" + test_fa[100:200].lower()
             + "TTTTTGGGGGCCCCCAAAAA" + test_fa[-300:])
    got = seq_kmer_pos(idx, query, k)
    want = rs.seq_kmer_positions(h, query, k)
    np.testing.assert_array_equal(got, want)
    assert len(got) > 0


@pytest.mark.parametrize("k", [4, 15, 16, 17, 31])
def test_random_query_parity(k):
    rng = np.random.default_rng(k)
    ref = "".join(rng.choice(list("ACGTN"), size=500,
                             p=[.24, .24, .24, .24, .04]))
    qry = "".join(rng.choice(list("ACGTN"), size=300,
                             p=[.24, .24, .24, .24, .04]))
    # splice indexed chunks into the query to force hits
    qry = qry[:100] + ref[50:90] + qry[100:200] + ref[200:260] + qry[200:]
    idx = make_kmer_hash(ref, k)
    h = rs.make_kmer_hash(ref, k)
    np.testing.assert_array_equal(
        seq_kmer_pos(idx, qry, k), rs.seq_kmer_positions(h, qry, k)
    )


def test_query_k_limit(test_fa):
    idx = make_kmer_hash(test_fa[:200], 16)
    with pytest.raises(ValueError):
        seq_kmer_pos(idx, test_fa[:100], 32)
    with pytest.raises(ValueError):
        seq_kmer_pos(idx, "ACGT", 16)


def test_query_no_hits(test_fa):
    idx = make_kmer_hash("ACGT" * 30, 10)
    got = seq_kmer_pos(idx, "GGGGGGGGGGGGGGGGGGGG", 10)
    assert got.shape == (0, 2)


def test_kmer_pairs_parity():
    rng = np.random.default_rng(7)
    sa = "".join(rng.choice(list("ACGT"), size=400))
    sb = sa[100:250] + "".join(rng.choice(list("ACGT"), size=200))
    k = 9
    ia, ib = make_kmer_hash(sa, k), make_kmer_hash(sb, k)
    ha, hb = rs.make_kmer_hash(sa, k), rs.make_kmer_hash(sb, k)
    got = kmer_pairs(ia, ib)
    want = rs.kmer_pair_pos(ha, hb)
    np.testing.assert_array_equal(got, want)
    assert len(got) > 100
