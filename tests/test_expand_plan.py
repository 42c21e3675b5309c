"""Parity of the compacted expansion plan (ops/expand.py) against the
plain searchsorted expansion and against refsem-backed driver outputs."""
import numpy as np
import jax.numpy as jnp
import pytest

from kmer_hasher_tpu.ops import expand as exp
from kmer_hasher_tpu.index.position_index import KmerIndex
from kmer_hasher_tpu.index import query as q

I64 = jnp.int64


@pytest.mark.parametrize("seed,T,cap", [(0, 257, 64), (1, 1024, 128),
                                        (2, 64, 1024), (3, 500, 32)])
def test_chunk_src_matches_naive(seed, T, cap):
    rng = np.random.default_rng(seed)
    # counts with plenty of zeros (singleton segments) and some big runs
    c = rng.integers(0, 5, T).astype(np.int32)
    c[rng.random(T) < 0.5] = 0
    if c.sum() == 0:
        c[T // 2] = 3
    plan = exp.ExpansionPlan(jnp.asarray(c), (jnp.asarray(
        np.arange(T, dtype=np.int32) * 7),), cap)
    total = int(c.sum())
    assert plan.total == total
    # naive expansion: source row + within-run rank per output row
    src_naive = np.repeat(np.arange(T), c)
    t_naive = np.concatenate([np.arange(n) for n in c]) if total else \
        np.zeros(0, np.int64)
    w_pad = np.asarray(plan.w)
    col_pad = np.asarray(plan.cols[0])
    start = 0
    got_w, got_t, got_col = [], [], []
    while start < total:
        src, t, g = exp.chunk_src(plan.cum, plan.run_start,
                                  jnp.asarray(start, I64), cap)
        ok = np.asarray(g) < total
        src = np.asarray(src)[ok]
        got_w.append(w_pad[src])
        got_col.append(col_pad[src])
        got_t.append(np.asarray(t)[ok])
        start += cap
    got_w = np.concatenate(got_w) if got_w else np.zeros(0, np.int32)
    got_t = np.concatenate(got_t) if got_t else np.zeros(0, np.int32)
    got_col = np.concatenate(got_col) if got_col else np.zeros(0, np.int32)
    np.testing.assert_array_equal(got_w, src_naive)
    np.testing.assert_array_equal(got_t, t_naive)
    np.testing.assert_array_equal(got_col, src_naive.astype(np.int32) * 7)


def _rand_seq(rng, n, with_n=False):
    bases = "ACGTN" if with_n else "ACGT"
    p = [0.3, 0.3, 0.2, 0.18, 0.02] if with_n else None
    return "".join(rng.choice(list(bases), n, p=p))


def test_pair_table_planned_matches_plain():
    rng = np.random.default_rng(7)
    seq = _rand_seq(rng, 3000) * 2  # repeats -> many pairs
    idx = KmerIndex(seq, 11)
    # tiny capacity forces the planned multi-chunk path
    planned = np.concatenate(list(idx.iter_pair_chunks(capacity=256)))
    # huge table_rows trick is not available; use the plain kernel directly
    from kmer_hasher_tpu.index.position_index import _pair_chunk
    total = idx.total_pairs
    assert total > 256  # multi-chunk
    plain = []
    start = 0
    cap = 1 << max(1, (total - 1).bit_length())
    rows, ok = _pair_chunk(idx.s_pos, idx.i_col, idx.m, idx.cum_m,
                           jnp.asarray(idx.n_valid, jnp.int32),
                           jnp.asarray(start, I64), cap)
    plain = np.asarray(rows)[: int(np.asarray(ok).sum())]
    np.testing.assert_array_equal(planned, plain)


def test_seq_kmer_pos_planned_matches_plain():
    rng = np.random.default_rng(11)
    ref = _rand_seq(rng, 4000, with_n=True)
    query = ref[1000:2500] + _rand_seq(rng, 500)
    idx = KmerIndex(ref, 9)
    full = q.seq_kmer_pos(idx, query, 9)
    chunks = list(q.iter_seq_kmer_pos_chunks(idx, query, 9, capacity=128))
    streamed = np.concatenate(chunks) if chunks else np.zeros((0, 2))
    np.testing.assert_array_equal(full, streamed)
    assert full.shape[0] > 128


def test_kmer_pairs_planned_matches_small_capacity():
    rng = np.random.default_rng(13)
    s1 = _rand_seq(rng, 2500)
    s2 = s1[500:1700] + _rand_seq(rng, 800)
    a, b = KmerIndex(s1, 10), KmerIndex(s2, 10)
    big = q.kmer_pairs(a, b)
    small = q.kmer_pairs(a, b, capacity=128)
    np.testing.assert_array_equal(big, small)
    assert big.shape[0] > 128
