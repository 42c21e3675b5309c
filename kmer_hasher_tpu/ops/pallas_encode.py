"""Pallas TPU kernel: fused position-parallel k-mer encoding.

One pass over the sequence bytes produces, per window start, the packed
(hi, lo) k-mer and an N-validity flag — the fused form of
``ops.encode.encode_stream``'s XLA graph: 1 byte read + 9 bytes written per
position, VPU-only arithmetic, no intermediate HBM arrays.

Layout: the sequence is viewed as rows of 128 lanes. Each grid step copies
its row-block plus an 8-row halo from HBM into VMEM (Mosaic DMA slices must
align to 8 sublanes; 8*128 bases comfortably cover the k-1 <= 31 a window
can reach past the block), then runs the
log2(k) shift-OR doubling scan entirely in registers/VMEM. The "advance by
s elements" primitive on an (R, 128) tile is a static lane slice plus the
next row's first s lanes — pure aligned vector ops.

The kernel matches ops.encode bit-for-bit (tests/test_pallas_encode.py) and
is wired into the build path on TPU via KMH_PALLAS=1.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
LANES = 128
_HALO = 8  # halo rows; DMA slices must align to 8 sublanes


def _adv(arr: jax.Array, s: int) -> jax.Array:
    """out[r, c] = flat(arr)[r*128 + c + s] for s in [0, 128): lane slice +
    spill-over from the next row. Last row's tail is garbage (halo covers
    the rows we actually emit)."""
    if s == 0:
        return arr
    nxt = jnp.roll(arr, -1, axis=0)
    return jnp.concatenate([arr[:, s:], nxt[:, :s]], axis=1)


def _compose(pw, w: int):
    acc = None
    off = 0
    for p in (16, 8, 4, 2, 1):
        if w & p:
            part = pw[p]
            acc = part if acc is None else (acc << (2 * p)) | _adv(part, off)
            off += p
    return acc


def _encode_block(codes: jax.Array, nflag: jax.Array, k: int):
    """codes/nflag: (R+HALO, 128) uint32. Returns hi, lo, has_n for the
    first R rows' window starts."""
    pw = {1: codes}
    w = 1
    while w * 2 <= min(k, 16):
        c = pw[w]
        pw[2 * w] = (c << (2 * w)) | _adv(c, w)
        w *= 2
    if k <= 16:
        lo = _compose(pw, k)
        if k < 16:
            lo &= U32((1 << (2 * k)) - 1)
        hi = jnp.zeros_like(lo)
    else:
        hi = _compose(pw, k - 16)
        if k < 32:
            hi &= U32((1 << (2 * (k - 16))) - 1)
        lo = _adv(_compose(pw, 16), k - 16)
    # windowed OR of the N flags
    nw = {1: nflag}
    w = 1
    while w * 2 <= k:
        f = nw[w]
        nw[2 * w] = f | _adv(f, w)
        w *= 2
    acc = None
    off = 0
    for p in (32, 16, 8, 4, 2, 1):
        if k & p:
            part = nw[p]
            acc = part if acc is None else acc | _adv(part, off)
            off += p
    return hi[:-_HALO], lo[:-_HALO], acc[:-_HALO]


def _kernel(seq_hbm, hi_ref, lo_ref, nwin_ref, scratch, sem, *, k: int,
            rows_per_block: int):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        seq_hbm.at[pl.ds(i * rows_per_block, rows_per_block + _HALO), :],
        scratch, sem,
    )
    cp.start()
    cp.wait()
    raw = scratch[...].astype(U32)
    codes = (raw >> 1) & 3
    nflag = ((raw | 0x20) == U32(ord("n"))).astype(U32)
    hi, lo, has_n = _encode_block(codes, nflag, k)
    hi_ref[...] = hi
    lo_ref[...] = lo
    nwin_ref[...] = has_n


def _encode_raw(ascii_u8: jax.Array, k: int, interpret: bool
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the kernel over a flat byte stream: (hi, lo, n_in_window) per
    position, each of length L. No range masking — callers own validity."""
    L = ascii_u8.shape[0]
    R_BLK = 256  # 32K elements per block; VMEM use ~ 6 buffers * 132KB
    rows = -(-L // LANES)
    blocks = -(-rows // R_BLK)
    rows_pad = blocks * R_BLK + _HALO
    seq2 = jnp.full((rows_pad * LANES,), ord("N"), jnp.uint8)
    seq2 = jax.lax.dynamic_update_slice(seq2, ascii_u8, (0,))
    seq2 = seq2.reshape(rows_pad, LANES)

    out_shape = jax.ShapeDtypeStruct((blocks * R_BLK, LANES), U32)
    hi, lo, nwin = pl.pallas_call(
        functools.partial(_kernel, k=k, rows_per_block=R_BLK),
        grid=(blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            # note: i*0 (not literal 0) keeps the index tuple uniformly i32
            # under jax_enable_x64; Mosaic rejects a mixed (i32, i64) map
            pl.BlockSpec((R_BLK, LANES), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_shape] * 3,
        scratch_shapes=[
            pltpu.VMEM((R_BLK + _HALO, LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(seq2)
    return hi.reshape(-1)[:L], lo.reshape(-1)[:L], nwin.reshape(-1)[:L]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_encode(ascii_u8: jax.Array, k: int, true_len,
                  interpret: bool = False
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(hi, lo, valid) over window starts of a 1-D sequence.

    The input is padded to rows of 128 internally; callers pass the true
    length for range/drop masking (same contract as encode_stream without
    the trailing-quirk flag).
    """
    L = ascii_u8.shape[0]
    hi, lo, nwin = _encode_raw(ascii_u8, k, interpret)
    idx = jnp.arange(L, dtype=jnp.int32)
    tl = jnp.asarray(true_len, jnp.int32)
    valid = (nwin == 0) & (idx + k <= tl)
    return hi, lo, valid


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_encode_batch(seq2d: jax.Array, k: int, lengths,
                        interpret: bool = False
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched (B, L) variant: one flat kernel pass over the whole batch.

    Rows are independent reads; the kernel sees them as one concatenated
    stream. A window that crosses from row b into row b+1 starts at column
    c > L - k, and since lengths[b] <= L the per-row range mask
    ``c + k <= lengths[b]`` always kills it — so cross-row contamination of
    (hi, lo) never reaches a valid output, and no per-row halo or N fence
    is needed.
    """
    B, L = seq2d.shape
    hi, lo, nwin = _encode_raw(seq2d.reshape(-1), k, interpret)
    hi = hi.reshape(B, L)
    lo = lo.reshape(B, L)
    no_n = (nwin == 0).reshape(B, L)
    idx = jnp.arange(L, dtype=jnp.int32)
    tl = jnp.asarray(lengths, jnp.int32)[:, None]
    valid = no_n & (idx[None, :] + k <= tl)
    return hi, lo, valid
