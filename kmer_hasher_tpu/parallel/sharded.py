"""Multi-chip sharded index and count store.

Parallelism map (SURVEY.md §2.2 -> TPU):

* The reference's reader-pool "owner-computes" filter — every pthread scans
  the whole input and keeps k-mers with ``prefix % thread_n == thread_i``
  (src/kmer_reader.c:28-39) — becomes key-space sharding across chips with
  the k-mers *routed* to their owner via ``all_to_all`` instead of
  redundantly re-read: each device encodes only its slice of the input.
* Splitting one long sequence across chips is context parallelism with a
  (k-1)-base halo from the right neighbour (``ppermute``), replacing the
  rolling register's sequential dependency at shard boundaries.
* The owner is a *salted multiplicative hash* of the k-mer, not its raw
  leading bits — repeat-dominated prefixes would skew raw-prefix shards
  (SURVEY.md §7 hard parts).
* Routing uses fixed per-destination capacity (MoE-style): senders bucket
  k-mers by owner, pad to capacity, and a single tiled ``all_to_all`` moves
  every bucket; an overflow flag is psum-reduced so the host can retry with
  a bigger capacity factor instead of silently dropping.
* Queries replicate, search the local shard, and merge with ``psum`` (hit
  counts) — the all-gather analogue of the reference's shared-memory reads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import encode as enc
from ..ops import sort as srt

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32
U64 = jnp.uint64


def owner_hash(hi: jax.Array, lo: jax.Array, n_shards: int,
               salt: int = 0x9E3779B1) -> jax.Array:
    """Salted multiplicative hash -> shard owner in [0, n_shards)."""
    h = hi * U32(salt) + lo * U32(0x85EBCA77)
    h ^= h >> 15
    h *= U32(0xCC9E2D51)
    h ^= h >> 13
    return (h % U32(n_shards)).astype(I32)


def _bucket_for_send(hi, lo, pos, valid, n_shards: int, capacity: int, k: int):
    """Lay out (key, pos) tuples into per-owner send buckets [D, C].

    Returns (send_hi, send_lo, send_pos, send_valid, overflow) for one
    device. Entries beyond an owner's capacity raise the overflow flag.
    """
    L = hi.shape[0]
    owner = jnp.where(valid, owner_hash(hi, lo, n_shards), n_shards)
    o_sort, idx = jax.lax.sort(
        (owner.astype(U32), jnp.arange(L, dtype=I32)), num_keys=1,
        is_stable=True,
    )
    o_sort = o_sort.astype(I32)
    counts = jnp.zeros(n_shards + 1, I32).at[owner].add(1, mode="drop")
    group_start = jnp.concatenate(
        [jnp.zeros(1, I32), jnp.cumsum(counts)[:-1].astype(I32)]
    )
    rank = jnp.arange(L, dtype=I32) - group_start[o_sort]
    overflow = (counts[:n_shards] > capacity).any()
    ok = (o_sort < n_shards) & (rank < capacity)
    tgt = jnp.where(ok, o_sort * capacity + rank, n_shards * capacity)

    def scatter(arr, fill):
        out = jnp.full(n_shards * capacity + 1, fill, arr.dtype)
        return out.at[tgt].set(arr[idx], mode="drop")[:-1]

    s_hi = scatter(hi, 0).reshape(n_shards, capacity)
    s_lo = scatter(lo, 0).reshape(n_shards, capacity)
    s_pos = scatter(pos, 0).reshape(n_shards, capacity)
    s_val = jnp.zeros(n_shards * capacity + 1, bool).at[tgt].set(
        ok, mode="drop"
    )[:-1].reshape(n_shards, capacity)
    return s_hi, s_lo, s_pos, s_val, overflow


def _route_and_build_shard(hi, lo, pos, valid, n_shards: int, capacity: int,
                           k: int, axis: str):
    """Inside shard_map: route k-mers to owners and build the local sorted
    shard. Returns (s_hi, s_lo, s_pos, n_valid, overflow)."""
    b_hi, b_lo, b_pos, b_val, ovf = _bucket_for_send(
        hi, lo, pos, valid, n_shards, capacity, k
    )
    r_hi = jax.lax.all_to_all(b_hi, axis, 0, 0, tiled=False)
    r_lo = jax.lax.all_to_all(b_lo, axis, 0, 0, tiled=False)
    r_pos = jax.lax.all_to_all(b_pos, axis, 0, 0, tiled=False)
    r_val = jax.lax.all_to_all(b_val, axis, 0, 0, tiled=False)
    f_hi = r_hi.reshape(-1)
    f_lo = r_lo.reshape(-1)
    f_pos = r_pos.reshape(-1)
    f_val = r_val.reshape(-1)
    s_hi, s_lo, s_pos = srt.sort_windows(f_hi, f_lo, f_pos.astype(I32),
                                         f_val, k)
    n_valid = f_val.sum().astype(I32)
    overflow = jax.lax.psum(ovf.astype(I32), axis)
    return s_hi, s_lo, s_pos, n_valid, overflow


class ShardedKmerIndex:
    """Position index sharded by k-mer hash across a device mesh.

    Build: context-parallel encode (halo exchange) -> all_to_all routing ->
    per-device sorted shards. Queries are replicated and psum-merged.
    """

    def __init__(self, seq, k: int, mesh: Mesh,
                 capacity_factor: float = 2.0,
                 drop_trailing_exact_k: bool = True):
        if isinstance(seq, str):
            seq = np.frombuffer(seq.encode(), np.uint8)
        seq = np.asarray(seq, np.uint8)
        if not 1 <= k <= 32:
            raise ValueError("k must be in 1..32")
        if seq.shape[0] <= k:
            raise ValueError("the length of the sequence must be at least k")
        self.k = int(k)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        D = mesh.size
        self.n_shards = D
        L = int(seq.shape[0])
        self.seq_len = L
        # the reference drops the final window when its region starts fresh
        # (src/kmer_pos.c:81-84); precompute the single affected position
        quirk = -1
        if drop_trailing_exact_k:
            a = L - k
            if a == 0 or (seq[a - 1] | 0x20) == ord("n"):
                quirk = a + 1  # 1-based
        self._quirk_pos = quirk
        # pad to a multiple of D (and a power-of-two chunk) with N
        Lc = -(-L // D)
        Lc = 1 << max(4, (Lc - 1).bit_length())
        Lp = Lc * D
        if Lp != L:
            seq = np.concatenate([seq, np.full(Lp - L, ord("N"), np.uint8)])
        self.chunk = Lc
        cap = int(capacity_factor * Lc / D)
        self.capacity = 1 << max(3, (cap - 1).bit_length())
        for attempt in range(3):
            out = self._build(seq, jnp.asarray(L, I32),
                              jnp.asarray(quirk, I32))
            s_hi, s_lo, s_pos, n_valid, overflow = out
            if int(np.asarray(overflow)[0]) == 0:
                break
            self.capacity *= 2  # skewed shards: retry with more headroom
        else:
            raise RuntimeError("all_to_all capacity overflow after retries")
        self.s_hi, self.s_lo, self.s_pos = s_hi, s_lo, s_pos
        self.n_valid = np.asarray(n_valid)  # [D]
        self.total_kmers = int(self.n_valid.sum())

    def _build(self, seq_padded, true_len, quirk_pos):
        k, D, Lc, C = self.k, self.n_shards, self.chunk, self.capacity
        axis = self.axis
        halo = max(1, k - 1)

        def fn(seq_local):
            seq_local = seq_local.reshape(-1)  # [Lc]
            me = jax.lax.axis_index(axis)
            # halo: first (k-1) bases of the RIGHT neighbour
            nxt = jax.lax.ppermute(
                seq_local[:halo], axis,
                [(i, (i - 1) % D) for i in range(D)],
            )
            ext = jnp.concatenate([seq_local, nxt])  # [Lc + halo]
            start = me.astype(I32) * Lc
            hi, lo, valid = enc.encode_stream(
                ext, k, jnp.minimum(true_len - start, Lc + halo),
                canonical=False, drop_trailing_exact_k=False,
            )
            idx = jnp.arange(Lc + halo, dtype=I32)
            gpos = start + idx + 1  # 1-based global window start
            valid &= idx < Lc  # windows starting in this chunk only
            valid &= gpos != quirk_pos
            # windows crossing into the wrapped halo of the last device are
            # already invalid via true_len masking
            s_hi, s_lo, s_pos, n_valid, ovf = _route_and_build_shard(
                hi, lo, gpos, valid, D, C, k, axis
            )
            return (
                s_hi[None], s_lo[None], s_pos[None], n_valid[None],
                ovf[None],
            )

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh, in_specs=P(axis),
                out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            )
        )
        return shard_fn(seq_padded)

    # -- queries ------------------------------------------------------------
    def lookup_counts(self, q_hi, q_lo) -> np.ndarray:
        """Occurrence count per query k-mer, psum-merged across shards."""
        axis = self.axis
        n_valid = jnp.asarray(self.n_valid, I32)

        def fn(s_hi, s_lo, nv, qh, ql):
            s_hi, s_lo = s_hi.reshape(-1), s_lo.reshape(-1)
            lb = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "left")
            ub = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "right")
            return jax.lax.psum(ub - lb, axis)

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(), P()),
                out_specs=P(),
            )
        )
        return np.asarray(
            shard_fn(self.s_hi, self.s_lo, n_valid,
                     jnp.ravel(q_hi), jnp.ravel(q_lo))
        )

    def seq_kmer_pos(self, query, k: int,
                     max_hits_per_shard: int = 1 << 20) -> np.ndarray:
        """Sharded ``seq.kmer.pos``: replicate the encoded query, let every
        shard emit (i, j) rows for the k-mers it owns, merge on host.

        Because the index is key-sharded, all hits of one query window live
        on exactly one shard, so sorting the gathered rows by (i, j)
        reproduces the single-chip (reference) row order exactly.
        """
        if isinstance(query, str):
            query = np.frombuffer(query.encode(), np.uint8)
        query = np.asarray(query, np.uint8)
        if query.shape[-1] <= k or k > 31:
            raise ValueError(
                "the sequence should be longer than k and k should not be"
                " longer than 31"
            )
        from ..ops import encode as enc

        tl = query.shape[0]
        Lp = 1 << max(6, (tl - 1).bit_length())
        if Lp != tl:
            query = np.concatenate(
                [query, np.full(Lp - tl, ord("N"), np.uint8)]
            )
        q_hi, q_lo, q_valid = enc.encode_stream(
            jnp.asarray(query), k, tl, drop_trailing_exact_k=True
        )
        axis = self.axis
        n_valid = jnp.asarray(self.n_valid, I32)
        C = max_hits_per_shard

        def fn(s_hi, s_lo, s_pos, nv, qh, ql, qv):
            s_hi, s_lo = s_hi.reshape(-1), s_lo.reshape(-1)
            s_pos = s_pos.reshape(-1)
            lb = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "left")
            ub = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "right")
            cnt = jnp.where(qv, ub - lb, 0)
            cum = jnp.cumsum(cnt.astype(I64))
            g = jnp.arange(C, dtype=I64)
            w = srt.searchsorted_i64(cum, g, qh.shape[0], "right")
            t = (g - (cum - cnt.astype(I64))[w]).astype(I32)
            i_col = (w + k).astype(I32)
            j_col = s_pos[jnp.clip(lb[w] + t, 0, s_pos.shape[0] - 1)]
            ok = g < cum[-1]
            rows = jnp.stack([jnp.where(ok, i_col, 0),
                              jnp.where(ok, j_col, 0)], axis=1)
            return rows[None], ok.sum(dtype=I32)[None]

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
                out_specs=(P(axis), P(axis)),
            )
        )
        rows, n = shard_fn(self.s_hi, self.s_lo, self.s_pos, n_valid,
                           q_hi, q_lo, q_valid)
        rows = np.asarray(rows)
        n = np.asarray(n)
        out = np.concatenate(
            [rows[d, : n[d]] for d in range(self.n_shards)], axis=0
        )
        order = np.lexsort((out[:, 1], out[:, 0]))
        return out[order].astype(np.int32)

    def positions_of(self, q_hi, q_lo, max_hits_per_shard: int = 1 << 16
                     ) -> np.ndarray:
        """All 1-based positions of the queried k-mers, gathered from every
        shard (ascending, merged on host)."""
        axis = self.axis
        n_valid = jnp.asarray(self.n_valid, I32)
        C = max_hits_per_shard

        def fn(s_hi, s_lo, s_pos, nv, qh, ql):
            s_hi, s_lo = s_hi.reshape(-1), s_lo.reshape(-1)
            s_pos = s_pos.reshape(-1)
            lb = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "left")
            ub = srt.searchsorted2(s_hi, s_lo, nv[0], qh, ql, "right")
            cnt = ub - lb
            cum = jnp.cumsum(cnt.astype(I64))
            g = jnp.arange(C, dtype=I64)
            w = srt.searchsorted_i64(cum, g, qh.shape[0], "right")
            t = (g - (cum - cnt.astype(I64))[w]).astype(I32)
            p = s_pos[jnp.clip(lb[w] + t, 0, s_pos.shape[0] - 1)]
            ok = g < cum[-1]
            return (jnp.where(ok, p, -1)[None], ok.sum(dtype=I32)[None])

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
                out_specs=(P(axis), P(axis)),
            )
        )
        pos, n = shard_fn(self.s_hi, self.s_lo, self.s_pos, n_valid,
                          jnp.ravel(q_hi), jnp.ravel(q_lo))
        pos = np.asarray(pos)
        n = np.asarray(n)
        out = np.concatenate([pos[d, : n[d]] for d in range(self.n_shards)])
        return np.sort(out)


class ShardedCountStore:
    """Canonical k-mer counting sharded by key hash: data-parallel read
    batches, all_to_all routing, per-device sorted count shards — the true
    data-parallel upgrade of the reference's redundant-read pool
    (SURVEY.md §2.2)."""

    def __init__(self, k: int, mesh: Mesh, counts_n: int = 1,
                 capacity: int = 1 << 14):
        self.k = int(k)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.size
        self.counts_n = int(counts_n)
        self.capacity = capacity
        D = self.n_shards
        cap0 = 64
        self.u_hi = jnp.zeros((D, cap0), U32)
        self.u_lo = jnp.zeros((D, cap0), U32)
        self.cnt = jnp.zeros((D, cap0, counts_n), U32)
        self.n_unique = np.zeros(D, np.int64)

    def add_batch(self, hi, lo, valid, source: int = 0):
        """hi/lo/valid: [D, n] device-sharded observations (each device's
        slice of the read batch, already canonical)."""
        axis, D, k, C = self.axis, self.n_shards, self.k, self.capacity
        cap_store = int(self.u_hi.shape[1])
        onehot = jnp.zeros(self.counts_n, U32).at[source].set(1)
        n_store = jnp.asarray(self.n_unique, I32)

        def fn(u_hi, u_lo, cnt, ns, b_hi, b_lo, b_val):
            b_hi, b_lo, b_val = (b_hi.reshape(-1), b_lo.reshape(-1),
                                 b_val.reshape(-1))
            s_hi, s_lo, s_pos, s_val, ovf = _bucket_for_send(
                b_hi, b_lo, jnp.zeros_like(b_hi, I32), b_val, D, C, k
            )
            r_hi = jax.lax.all_to_all(s_hi, axis, 0, 0).reshape(-1)
            r_lo = jax.lax.all_to_all(s_lo, axis, 0, 0).reshape(-1)
            r_val = jax.lax.all_to_all(s_val, axis, 0, 0).reshape(-1)
            from ..index.count_store import _merge

            u_hi2, u_lo2, cnt2, n2 = _merge(
                u_hi.reshape(cap_store), u_lo.reshape(cap_store),
                cnt.reshape(cap_store, -1), ns[0], r_hi, r_lo, r_val,
                onehot, k,
            )
            ovf_t = jax.lax.psum(ovf.astype(I32), axis)
            return (u_hi2[None], u_lo2[None], cnt2[None], n2[None],
                    ovf_t[None])

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                          P(axis), P(axis)),
                out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            )
        )
        u_hi, u_lo, cnt, n_u, ovf = shard_fn(
            self.u_hi, self.u_lo, self.cnt, n_store, hi, lo, valid
        )
        if int(np.asarray(ovf)[0]) > 0:
            raise RuntimeError(
                "routing capacity overflow; raise ShardedCountStore capacity"
            )
        self.n_unique = np.asarray(n_u).astype(np.int64)
        # host-side capacity management: shrink/grow per the max shard
        need = 1 << max(6, int(self.n_unique.max() - 1).bit_length())
        cur = u_hi.shape[1]
        if need < cur:
            u_hi, u_lo, cnt = (u_hi[:, :need], u_lo[:, :need],
                               cnt[:, :need])
        self.u_hi, self.u_lo, self.cnt = u_hi, u_lo, cnt

    def spectrum(self, max_count: int) -> np.ndarray:
        """Global count histogram: per-shard bincount + psum."""
        axis = self.axis
        nv = jnp.asarray(self.n_unique, I32)

        def fn(cnt, ns):
            cnt0 = cnt.reshape(cnt.shape[1], -1)[:, 0]
            live = jnp.arange(cnt0.shape[0], dtype=I32) < ns[0]
            c = jnp.minimum(cnt0.astype(I64), max_count)
            c = jnp.where(live, c, max_count + 1)
            spec = jnp.zeros(max_count + 2, jnp.float64).at[c].add(1.0)
            return jax.lax.psum(spec[: max_count + 1], axis)

        shard_fn = jax.jit(
            jax.shard_map(fn, mesh=self.mesh, in_specs=(P(axis), P(axis)),
                          out_specs=P())
        )
        return np.asarray(shard_fn(self.cnt, nv))

    def spectrum_n(self, max_count: int, comb, comb_inner,
                   source_min) -> np.ndarray:
        """Combinatorial multi-source spectrum, psum-merged across shards
        (kmer.spec.sh.n semantics, src/suffix_hash.c:335-425)."""
        from ..index.count_store import _spectrum_nc

        comb = np.asarray(comb, np.int32)
        comb_inner = np.asarray(comb_inner, np.int32)
        source_min = np.asarray(source_min, np.int64)
        axis = self.axis
        nv = jnp.asarray(self.n_unique, I32)
        comb_n = int(len(comb))

        def fn(cnt, ns):
            cnt2 = cnt.reshape(cnt.shape[1], -1)
            live = jnp.arange(cnt2.shape[0], dtype=I32) < ns[0]
            out = _spectrum_nc(cnt2, live, max_count, jnp.asarray(comb),
                               jnp.asarray(comb_inner),
                               jnp.asarray(source_min), comb_n)
            return jax.lax.psum(out, axis)

        shard_fn = jax.jit(
            jax.shard_map(fn, mesh=self.mesh, in_specs=(P(axis), P(axis)),
                          out_specs=P())
        )
        return np.asarray(shard_fn(self.cnt, nv))

    def lookup(self, q_hi, q_lo) -> np.ndarray:
        """Count rows for queries, merged across shards (each key lives on
        exactly one shard, so psum of per-shard lookups is exact)."""
        axis = self.axis
        nv = jnp.asarray(self.n_unique, I32)

        def fn(u_hi, u_lo, cnt, ns, qh, ql):
            u_hi, u_lo = u_hi.reshape(-1), u_lo.reshape(-1)
            cnt2 = cnt.reshape(u_hi.shape[0], -1)
            lb = srt.searchsorted2(u_hi, u_lo, ns[0], qh, ql, "left")
            lbc = jnp.clip(lb, 0, u_hi.shape[0] - 1)
            found = (lb < ns[0]) & (u_hi[lbc] == qh) & (u_lo[lbc] == ql)
            rows = jnp.where(found[:, None], cnt2[lbc], 0).astype(I32)
            return jax.lax.psum(rows, axis)

        shard_fn = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
                out_specs=P(),
            )
        )
        return np.asarray(
            shard_fn(self.u_hi, self.u_lo, self.cnt, nv,
                     jnp.ravel(q_hi), jnp.ravel(q_lo))
        )
