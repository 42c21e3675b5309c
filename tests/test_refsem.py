"""Validate the parity oracle (refsem) against facts recorded in the
reference repository itself: known-answer data (repeat_40.fq spectrum,
test.R:373-377,409-417), documented invariants (README.md:70-89), and
round-trip properties (test.R:1208-1233)."""
import numpy as np
import pytest

from kmer_hasher_tpu import refsem as rs


# ---------------------------------------------------------------------------
# encoding primitives
# ---------------------------------------------------------------------------

def test_base_code_mapping():
    # (c>>1)&3: A->0 C->1 T->2 G->3, case-insensitive (kmer_util.h:8)
    assert [rs.base_code(ord(c)) for c in "ACTG"] == [0, 1, 2, 3]
    assert [rs.base_code(ord(c)) for c in "actg"] == [0, 1, 2, 3]


def test_decode_encode_roundtrip():
    for s in ["A", "ACTG", "GGGG", "ACTGACTGACTGACTGACTGACTGACTGACTG"]:
        assert rs.decode_kmer(rs.encode_kmer(s), len(s)) == s


def test_revcomp():
    # complement via (code+2)%4: A<->T, C<->G
    code = rs.encode_kmer("AACG")
    assert rs.decode_kmer(rs.revcomp_code(code, 4), 4) == "CGTT"


def test_k32_mask_full_width():
    s = "G" * 32
    code = rs.encode_kmer(s)
    assert code == rs.U64  # all-3 codes fill 64 bits
    assert rs.decode_kmer(code, 32) == s


def test_rolling_rc_matches_direct_rc():
    # the rolling RC register (kmer_util.h:9) shifted by 64-2k equals the
    # directly computed reverse complement of the forward window
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice([65, 67, 71, 84], size=50).astype(np.uint8))
    for k in (1, 3, 16, 17, 31, 32):
        got = list(rs._iter_kmers_nq(seq, k, rs.kmer_mask(k), 64 - 2 * k))
        for end, fwd, rc in got:
            assert rc == rs.revcomp_code(fwd, k)
            assert fwd == rs.encode_kmer(seq[end - k:end].decode())


# ---------------------------------------------------------------------------
# position index invariants (README.md:70-89)
# ---------------------------------------------------------------------------

def test_pos_rows_and_pair_counts(test_fa):
    # full-sequence invariants are cheap for pos/count; the pair table is
    # checked on a slice (the host CPU here is slow; full-table pair parity
    # is exercised by the device-path tests)
    k = 8
    test_fa = test_fa[:6000]
    h = rs.make_kmer_hash(test_fa, k)
    t = rs.kmer_positions(h, 15)
    l = len(test_fa)
    # N-free sequence: number of pos rows == 1 + l - k (README.md:70-72)
    assert t["pos"].shape[0] == 1 + l - k
    counts = t["count"]
    assert counts.sum() == 1 + l - k
    # pairs = sum n(n-1)/2 (README.md:80-82)
    assert t["pair.pos"].shape[0] == int((counts.astype(np.int64) *
                                          (counts.astype(np.int64) - 1) // 2).sum())
    # x < y in every pair row (README.md:74-76)
    assert (t["pair.pos"][:, 1] < t["pair.pos"][:, 2]).all()
    # positions 1-based, within range
    assert t["pos"][:, 1].min() == 1
    assert t["pos"][:, 1].max() == l - k + 1


def test_position_roundtrip(test_fa):
    # extracting the substring at each reported position reproduces the kmer
    # string (test.R:1208-1233)
    k = 11
    h = rs.make_kmer_hash(test_fa, k)
    t = rs.kmer_positions(h, 1 | 2)
    kmers = t["kmer"]
    rng = np.random.default_rng(1)
    rows = t["pos"][rng.choice(len(t["pos"]), 200, replace=False)]
    for i, p in rows:
        assert test_fa[p - 1:p - 1 + k] == kmers[i - 1]


def test_n_handling_and_trailing_exact_k_drop():
    # windows overlapping N excluded (README.md:13-16); a trailing N-free
    # region of exactly k drops its window (kmer_pos.c:82-83 quirk)
    k = 4
    h = rs.seq_to_hash(b"ACGTNNACGTA", k)
    allpos = sorted(p for v in h.pos.values() for p in v)
    assert allpos == [1, 7, 8]  # windows at 1..4, 7..10, 8..11
    h2 = rs.seq_to_hash(b"ACGTANNACGT", k)  # trailing region exactly k
    allpos2 = sorted(p for v in h2.pos.values() for p in v)
    assert allpos2 == [1, 2]  # ACGT@8 dropped by the if(!seq[i]) break quirk


def test_seq_kmer_pos_semantics(test_fa):
    # i = 1-based position of LAST base of the query k-mer (kmer_pos.c:127)
    k = 6
    h = rs.make_kmer_hash(test_fa, k)
    query = test_fa[100:160]
    m = rs.seq_kmer_positions(h, query, k)
    assert m.shape[1] == 2
    # self-query of an indexed substring: every window must hit, and the
    # diagonal (j == 101 + (i - k)) must be present for each i
    for i in range(k, len(query) + 1):
        js = m[m[:, 0] == i, 1]
        assert len(js) >= 1
        assert (101 + i - k) in js


def test_self_dotplot_symmetry(test_fa):
    # forward/reverse symmetry sanity (test.R:41-76): index seq, query seq
    # itself -> diagonal i-k+1 == j always present
    k = 12
    h = rs.make_kmer_hash(test_fa[:2000], k)
    m = rs.seq_kmer_positions(h, test_fa[:2000], k)
    diag = m[:, 0] - k + 1 == m[:, 1]
    assert diag.sum() == 2000 - k + 1


# ---------------------------------------------------------------------------
# counting: known answers from the reference's own data
# ---------------------------------------------------------------------------

def test_repeat_40_known_answer_brute_force(repeat_40_fq):
    """repeat_40.fq: 10 reads x 250 bp of exact ACTGG repeats with a handful
    of low-quality bases embedded (structure documented test.R:371-377,
    410-417). At min_q=0 the likelihood filter (min_ll = ll('!') = -708)
    rejects exactly the windows containing a phred-0 ('!') base, so the
    expected canonical counts are computable by independent brute force."""
    k = 5
    reads = [(s, q) for (_n, s, q) in repeat_40_fq]
    expected: dict = {}
    for s, q in reads:
        for st in range(len(s) - k + 1):
            if b"!" in q[st:st + k]:
                continue
            fwd = rs.encode_kmer(s[st:st + k].decode())
            kmer = min(fwd, rs.revcomp_code(fwd, k))
            expected[kmer] = expected.get(kmer, 0) + 1
    store = rs.count_kmers_reads_ll(reads, k=k, min_q_phred=0)
    got = {kmer: v[0] for kmer, v in store.counts.items()}
    assert got == expected
    # 5 distinct canonical 5-mers of the ACTGG repeat family
    assert len(got) == 5


def test_counts_double_on_recount(repeat_40_fq):
    # counting the same file twice exactly doubles every count
    # (determinism check, test.R:647-659)
    reads = [(s, q) for (_n, s, q) in repeat_40_fq]
    st1 = rs.count_kmers_reads_ll(reads, k=21, min_q_phred=20)
    st2 = rs.count_kmers_reads_ll(reads, k=21, min_q_phred=20)
    st2 = rs.count_kmers_reads_ll(reads, k=21, min_q_phred=20, store=st2)
    assert set(st1.counts) == set(st2.counts)
    for kmer, v in st1.counts.items():
        assert st2.counts[kmer][0] == 2 * v[0]


def test_canonical_counting_strand_symmetry():
    # counting a read and its reverse complement gives identical canonical
    # counts (kmer_reader.c:30)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    s = "ACGGTTACGATCGATCGGGTACGT"
    rc = "".join(comp[c] for c in reversed(s))
    st1 = rs.count_kmers_reads_ll([(s.encode(), None)], k=7, min_q_phred=0)
    st2 = rs.count_kmers_reads_ll([(rc.encode(), None)], k=7, min_q_phred=0)
    assert st1.counts == st2.counts


def test_count_kmers_forward_only():
    # count.kmers (in-memory path) does NOT canonicalise (kmer_hash.c:220-252)
    st = rs.count_kmers_seqs(["ACGTACGTA"], k=4, source=0, source_n=2)
    assert rs.encode_kmer("ACGT") in st.counts
    assert rs.encode_kmer("ACGT") != min(
        rs.encode_kmer("ACGT"), rs.revcomp_code(rs.encode_kmer("ACGT"), 4)
    ) or True  # ACGT is its own canonical; check a non-palindromic one:
    st2 = rs.count_kmers_seqs(["AAAAC"], k=4, source=0, source_n=1)
    assert rs.encode_kmer("AAAA") in st2.counts
    assert rs.encode_kmer("GTTT") not in st2.counts
    # multi-source: counts land in the right slot
    assert st.counts[rs.encode_kmer("ACGT")] == [2, 0]


def test_ll_iterator_rejects_low_quality_kmer():
    # a '!' (phred 0) base sinks every window containing it: ll = -708
    s = b"ACGTACGTACGT"
    q = bytearray(b"J" * 12)
    q[5] = ord("!")
    got = list(rs.iter_kmers_ll(s, bytes(q), k=4, min_q=20))
    ends = [e for e, _f, _r in got]
    # windows with end in [6..9] contain position 5 (0-based) -> rejected
    assert all(not (6 <= e <= 9) for e in ends)
    assert 4 in ends and 10 in ends and 12 in ends


def test_ll_iterator_pollution_quirk():
    """The (k+1)-th base's ll is folded into the window sum during builds
    (kmer_util.c:104). Construct a case where the first roll is accepted
    only because of the quirk: borderline window + the *next* base's ll
    counted twice. We just assert refsem is self-consistent with a direct
    transliteration trace here: window at start accepted, first roll
    rejected when the new base is bad enough counted twice."""
    k = 4
    min_q = 20
    min_ll = float(rs.Q_TO_LL[33 + min_q])
    # qualities: 4 perfect bases, then one mediocre base m such that
    # B + 2*ll(m) - ll(prev) < min_ll but a true sliding window (3 perfect +
    # m) would pass: ll(m) alone > min_ll but 2*ll(m) < min_ll.
    # min_ll = ll(q20) ~= -0.01005; pick m = q22: ll ~= -0.00634, 2*ll=-0.0127
    s = b"ACGTAC"
    q = bytes([33 + 41] * 4 + [33 + 22] * 2)
    got = list(rs.iter_kmers_ll(s, q, k=k, min_q=min_q))
    ends = [e for e, _f, _r in got]
    assert 4 in ends          # initial window accepted
    assert 5 not in ends      # first roll rejected due to double-count quirk
    ll22 = float(rs.Q_TO_LL[33 + 22])
    assert ll22 > min_ll and 2 * ll22 < min_ll  # the construction is real


# ---------------------------------------------------------------------------
# depth track & spectra
# ---------------------------------------------------------------------------

def test_depth_track_basic():
    st = rs.count_kmers_reads_ll([(b"ACGTACGTAA", None)], k=4, min_q_phred=0)
    d = rs.seq_kmer_depth(st, "ACGTACGTAA", 4)
    assert d.shape == (1, 10)
    # C semantics (ground-truth validated): column c holds the window
    # starting at c+1, so columns 0..5 are written and 6.. stay NA
    assert (d[0, 6:] == rs.NA_INTEGER).all()
    assert (d[0, :6] >= 0).all()
    # intent semantics: window-start aligned, starts 0..6 written
    di = rs.seq_kmer_depth(st, "ACGTACGTAA", 4, semantics="intent")
    assert (di[0, 7:] == rs.NA_INTEGER).all()
    assert (di[0, :7] >= 0).all()
    assert (d[0, :6] == di[0, 1:7]).all()  # the one-column shift
    # unknown sequence -> zeros (sh_kmer_count_n writes 0 for missing)
    d2 = rs.seq_kmer_depth(st, "GGGGGGGG", 4)
    assert (d2[0, :4] == 0).all()


def test_spectrum_allocated_zeros_ktree_mode():
    # kmer_tree spectrum scans all cells of allocated blocks incl. zeros
    # (kmer_tree.c:85-99)
    st = rs.RefCountStore(k=4, counts_n=1, prefix_bits=4, suffix_bits=4)
    st.add(rs.encode_kmer("AAAA"))
    st.add(rs.encode_kmer("AAAA"))
    st.add(rs.encode_kmer("AAAC"))
    spec = rs.kmer_spectrum(st, 10, include_allocated_zeros=True)
    assert spec[2] == 1 and spec[1] == 1
    assert spec[0] == 16 - 2  # one allocated block of 2^4 cells, 2 nonzero
    spec2 = rs.kmer_spectrum(st, 10)
    assert spec2[0] == 0


def test_comb_spectrum():
    st = rs.RefCountStore(k=4, counts_n=2)
    a, b, c = rs.encode_kmer("AAAA"), rs.encode_kmer("CCCC"), rs.encode_kmer("GGGG")
    for _ in range(3):
        st.add(a, 0)
    st.add(a, 1)
    st.add(b, 0)
    for _ in range(2):
        st.add(c, 1)
    # comb=3 inner=1: kmers present (>=1) in BOTH sources exactly -> only a
    out = rs.kmer_spectrum_n(st, 5, comb=[3], comb_inner=[1], source_min=[1, 1])
    assert out.shape == (2, 6)
    assert out[0, 3] == 1 and out[0].sum() == 1   # source0 count of a = 3
    assert out[1, 1] == 1 and out[1].sum() == 1   # source1 count of a = 1
    # comb=3 inner=0: any-overlap -> all three kmers
    out2 = rs.kmer_spectrum_n(st, 5, comb=[3], comb_inner=[0], source_min=[1, 1])
    assert out2[0].sum() == 3 and out2[1].sum() == 3


def test_derive_prefix_suffix_bits():
    assert rs.derive_prefix_suffix_bits(21, 20) == (20, 22)
    assert rs.derive_prefix_suffix_bits(32, 20) == (32, 32)  # suffix clamped
    assert rs.derive_prefix_suffix_bits(21, 40) == (36, 6)


def test_make_kmer_hash_validation():
    with pytest.raises(ValueError):
        rs.make_kmer_hash("ACGT", 0)
    with pytest.raises(ValueError):
        rs.make_kmer_hash("ACGT", 33)
    with pytest.raises(ValueError):
        rs.make_kmer_hash("ACGT", 4)  # len must be strictly > k
