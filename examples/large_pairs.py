"""BASELINE config 4: k=32 index of a ~40 Mbp chromosome with chunked
pair.pos streaming — the regime where the reference dies (>9e9 pairs from a
40 Mbp L. piscatorius index exhaust R's allocator and likely leak,
reference README.md:80-89).

Builds a synthetic 40 Mbp chromosome (random background + a tandem-repeat
region so the pair table actually explodes quadratically), indexes it at
k=32 on the device, and STREAMS the (i, x, y) table through fixed-capacity
chunks without ever materialising it.

Run: python examples/large_pairs.py [--mbp 40] [--copies 300]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--mbp", type=float, default=40.0)
parser.add_argument("--copies", type=int, default=300,
                    help="tandem copies of the 5 kb repeat unit")
parser.add_argument("--max-stream-pairs", type=int, default=200_000_000,
                    help="stop streaming after this many rows (demo bound)")
args = parser.parse_args()

import jax

from kmer_hasher_tpu.index import KmerIndex

L = int(args.mbp * 1e6)
rng = np.random.default_rng(0)
NUC = np.frombuffer(b"ACGT", np.uint8)
unit = NUC[rng.integers(0, 4, 5000)]
repeat_region = np.tile(unit, args.copies)
background = NUC[rng.integers(0, 4, L - len(repeat_region))]
seq = np.concatenate([background[: L // 2], repeat_region,
                      background[L // 2:]])
print(f"chromosome: {len(seq) / 1e6:.1f} Mbp with a "
      f"{len(repeat_region) / 1e6:.1f} Mbp tandem-repeat region "
      f"({args.copies} copies), backend={jax.default_backend()}")

t0 = time.perf_counter()
idx = KmerIndex(seq, 32)
total = idx.total_pairs
t_build = time.perf_counter() - t0
print(f"k=32 index built in {t_build:.1f}s: {idx.n_valid:,} windows, "
      f"{idx.n_kmers:,} distinct, {total:,} dot-plot pairs pending")

t0 = time.perf_counter()
streamed = 0
checksum = np.int64(0)
for chunk in idx.iter_pair_chunks(capacity=1 << 22):
    streamed += len(chunk)
    checksum ^= np.bitwise_xor.reduce(chunk[:, 1].astype(np.int64))
    if streamed >= args.max_stream_pairs:
        break
dt = time.perf_counter() - t0
frac = streamed / total if total else 1.0
print(f"streamed {streamed:,}/{total:,} pairs ({frac:.0%}) in {dt:.1f}s "
      f"({streamed / max(dt, 1e-9) / 1e6:.1f} Mpairs/s), peak host memory "
      f"bounded by one {1 << 22:,}-row chunk (checksum {int(checksum)})")
print("no OOM: the reference materialises this table and dies "
      "(README.md:80-89); here it streams.")
