"""Device encode ops vs the refsem oracle."""
import numpy as np
import pytest

from kmer_hasher_tpu import refsem as rs
from kmer_hasher_tpu.ops import encode as enc


def brute_windows(seq: bytes, k: int):
    """(hi, lo, valid) per start position via the oracle's primitives."""
    L = len(seq)
    hi = np.zeros(L, np.uint32)
    lo = np.zeros(L, np.uint32)
    valid = np.zeros(L, bool)
    for i in range(L - k + 1):
        win = seq[i:i + k]
        if any(rs.is_n(c) for c in win):
            continue
        code = rs.encode_kmer(win.decode("latin1"))
        hi[i] = code >> 32
        lo[i] = code & 0xFFFFFFFF
        valid[i] = True
    return hi, lo, valid


RNG = np.random.default_rng(42)


def random_seq(L, n_prob=0.0):
    bases = RNG.choice([65, 67, 71, 84, 97, 99, 103, 116], size=L)
    if n_prob:
        mask = RNG.random(L) < n_prob
        bases[mask] = np.where(RNG.random(mask.sum()) < 0.5, 78, 110)
    return bases.astype(np.uint8)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 8, 15, 16, 17, 21, 31, 32])
def test_encode_windows_matches_oracle(k):
    seq = random_seq(200, n_prob=0.05)
    hi, lo, valid = (np.asarray(a) for a in enc.encode_stream(seq, k, len(seq)))
    bhi, blo, bvalid = brute_windows(seq.tobytes(), k)
    np.testing.assert_array_equal(valid, bvalid)
    np.testing.assert_array_equal(hi[valid], bhi[bvalid])
    np.testing.assert_array_equal(lo[valid], blo[bvalid])


@pytest.mark.parametrize("k", [1, 4, 16, 17, 32])
def test_revcomp_matches_oracle(k):
    seq = random_seq(100)
    hi, lo, valid = (np.asarray(a) for a in enc.encode_stream(seq, k, len(seq)))
    rhi, rlo = (np.asarray(a) for a in enc.revcomp_windows(hi, lo, k))
    packed = enc.pack_u64_np(hi, lo)
    rpacked = enc.pack_u64_np(rhi, rlo)
    for i in np.flatnonzero(valid)[:50]:
        assert int(rpacked[i]) == rs.revcomp_code(int(packed[i]), k)


def test_canonical_matches_oracle():
    k = 21
    seq = random_seq(300)
    hi, lo, valid = (np.asarray(a) for a in enc.encode_stream(
        seq, k, len(seq), canonical=True))
    for i in np.flatnonzero(valid)[:50]:
        fwd = rs.encode_kmer(seq.tobytes()[i:i + k].decode())
        want = min(fwd, rs.revcomp_code(fwd, k))
        assert int(enc.pack_u64_np(hi[i], lo[i])) == want


def test_batched_reads_vectorise():
    k = 7
    batch = np.stack([random_seq(64, 0.1) for _ in range(5)])
    lens = np.array([64, 60, 50, 7, 6], np.int32)
    hi, lo, valid = (np.asarray(a) for a in enc.encode_stream(batch, k, lens))
    assert hi.shape == (5, 64)
    for r in range(5):
        bhi, blo, bvalid = brute_windows(batch[r, :lens[r]].tobytes(), k)
        np.testing.assert_array_equal(valid[r, :lens[r]], bvalid)
        np.testing.assert_array_equal(valid[r, lens[r]:], False)
        np.testing.assert_array_equal(hi[r, :lens[r]][bvalid], bhi[bvalid])
        np.testing.assert_array_equal(lo[r, :lens[r]][bvalid], blo[bvalid])
    # row with len == k has exactly one window; len < k none
    assert valid[3].sum() == (1 if not enc.n_flags(batch[3][:7]).any() else 0)
    assert valid[4].sum() == 0


def test_drop_trailing_exact_k_quirk():
    k = 4
    seq = np.frombuffer(b"ACGTANNACGT", dtype=np.uint8).copy()
    v_plain = np.asarray(enc.window_valid(seq, k, len(seq)))
    v_quirk = np.asarray(enc.window_valid(seq, k, len(seq),
                                          drop_trailing_exact_k=True))
    assert v_plain[7] and not v_quirk[7]  # trailing exactly-k region dropped
    assert (v_quirk[:7] == v_plain[:7]).all()
    # matches the oracle's index over the same sequence
    h = rs.seq_to_hash(bytes(seq), k)
    starts = sorted(p - 1 for v in h.pos.values() for p in v)
    assert starts == sorted(np.flatnonzero(v_quirk).tolist())


def test_full_sequence_parity_with_oracle_index(test_fa):
    # every window of test.fa at k=32: device encode equals oracle rolling
    k = 32
    seq = np.frombuffer(test_fa.encode(), dtype=np.uint8)
    hi, lo, valid = (np.asarray(a) for a in enc.encode_stream(
        seq, k, len(seq), drop_trailing_exact_k=True))
    h = rs.seq_to_hash(test_fa.encode(), k)
    got = {}
    packed = enc.pack_u64_np(hi, lo)
    for i in np.flatnonzero(valid):
        got.setdefault(int(packed[i]), []).append(int(i) + 1)
    assert got == {kk: v for kk, v in h.pos.items()}
