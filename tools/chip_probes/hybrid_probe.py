"""Chip probe: device-resident counting throughput by ll mode + flag rate.

Measures the fused batch program (counting._fused_rp_batch: FSM ->
canonical -> sort/segment -> LSM run) with reads resident on-device,
chained inside one jit so the tunnel's ~30 ms dispatch floor amortises —
the same method as the headline bench. Modes:

  fast    — Pallas f32 FSM (no parity guarantee; PERF.md 13.2M reads/s)
  hybrid  — Pallas f32 FSM + in-kernel borderline flags (production TPU
            hybrid; flagged reads re-counted exactly by the backlog sweep)
  exact   — f64 ll_scan (bit parity with the C, emulated f64 on TPU)

The effective hybrid rate composes the two measured programs with the
measured flag rate p: t_read = t_hybrid + p * t_exact (the backlog sweep
compacts flagged reads into full batches and reuses the one fused-exact
program, counting.sweep_backlog), answering "hybrid >= 5M reads/s/chip
with flag rate reported" directly from device measurements.

Quality models: 'novaseq' (binned {2,12,23,37}, realistic), 'uniform'
(phred 2..40), 'borderline' ({20,37} mix tuned so window sums land near
min_ll(q20) — a worst case for the flag predicate).

Run SOLO (one chip process): python tools/chip_probes/hybrid_probe.py [B [chain]]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_hasher_tpu import counting  # noqa: E402
from kmer_hasher_tpu.qll import Q_TO_LL  # noqa: E402

K = 21
L = 151
MIN_Q = 20


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def make_batch(rng, B, qmodel):
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    if qmodel == "novaseq":
        q = rng.choice(np.array([2, 12, 23, 37]), p=[0.01, 0.03, 0.16, 0.8],
                       size=(B, L))
    elif qmodel == "uniform":
        q = rng.integers(2, 41, size=(B, L))
    else:  # borderline: sums hover near min_ll(q20) = ll of one q20 base
        q = rng.choice(np.array([20, 37]), p=[0.25, 0.75], size=(B, L))
    qual = (q + 33).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    return (jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lengths),
            jnp.ones(B, bool))


def chained(fsm, chain):
    min_ll_f = float(Q_TO_LL[33 + MIN_Q])

    @jax.jit
    def run(seq, qual, lengths, has_qual):
        def body(i, carry):
            seq, acc, nflag = carry
            seq = seq.at[0, i % L].set(jnp.uint8(65))  # defeat CSE
            r_hi, _r_lo, _r_cnt, n_obs, flags, _nf = counting._fused_rp_batch(
                seq, qual, lengths, has_qual, K, 1, 0, min_ll_f, fsm,
                min_q_char=33 + MIN_Q,
            )
            acc = acc + r_hi[0].astype(jnp.int64) + n_obs[0]
            return seq, acc, nflag + flags.sum().astype(jnp.int64)
        _, acc, nflag = jax.lax.fori_loop(
            0, chain, body, (seq, jnp.int64(0), jnp.int64(0)))
        return acc, nflag

    return run


def timeit(fn, batch, iters=3):
    sync(fn(*batch))  # compile
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*batch)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    sync(jnp.zeros(8, jnp.uint32))
    print(f"device ready ({jax.default_backend()}), B={B}, chain={chain}, "
          f"k={K}, L={L}, min_q={MIN_Q}", flush=True)
    reads = B * chain
    for qmodel in ("novaseq", "uniform", "borderline"):
        batch = make_batch(rng, B, qmodel)
        rates = {}
        flagged = 0
        for fsm in ("pallas", "pallas_hybrid", "exact"):
            dt, out = timeit(chained(fsm, chain), batch)
            rates[fsm] = reads / dt
            if fsm == "pallas_hybrid":
                flagged = int(out[1])
            print(f"  {qmodel:10s} {fsm:13s}: {dt*1e3:8.1f} ms chained "
                  f"-> {reads/dt/1e6:7.3f} M reads/s", flush=True)
        p = flagged / reads
        t_eff = 1.0 / rates["pallas_hybrid"] + p / rates["exact"]
        print(f"  {qmodel:10s} flag rate p={p:.5f} "
              f"({flagged}/{reads} reads) -> effective hybrid "
              f"{1.0/t_eff/1e6:.3f} M reads/s (bit-parity)", flush=True)


if __name__ == "__main__":
    main()
