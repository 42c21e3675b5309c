"""Device-side end-to-end counting benchmark (VERDICT r2 item 2).

Pre-stages synthetic 151 bp read batches in HBM, then drives the EXACT
production per-batch pipeline — counting._fused_rp_batch into
CountStore.add_run (LSM tier merges included), hybrid backlog sweep
included — with a single final sync. This isolates the pipeline's
device-side rate from the tunnel/host input path, which PERF.md "Round
2d" covers separately. Reference bar: 272-300k reads/s on 33 Xeon cores
(/root/reference/test.R:823-838).

Stages reported:
  E2E      full loop (fused batch + LSM add_run + tier merges + sweep)
  FUSED    fused batch program alone (no store)
  FSM      the Pallas quality-likelihood kernel alone

Env: E2E_BATCHES (default 64), E2E_ROWS (16384), E2E_K (21),
E2E_MODE (hybrid|fast|exact), E2E_READLEN (151).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "__file__" in globals():  # direct run; the chip worker adds the repo
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from kmer_hasher_tpu.counting import _fused_rp_batch  # noqa: E402
from kmer_hasher_tpu.index.count_store import CountStore  # noqa: E402
from kmer_hasher_tpu.qll import Q_TO_LL  # noqa: E402


def sync1(x):
    return np.asarray(x.ravel()[:1])


def make_batches(n_batches, rows, read_len, seed=0, quals="stress"):
    """Generate padded (seq, qual, lengths, has_qual) batches ON DEVICE
    (the throttled host cannot generate 100 MB of random bytes quickly).

    quals="stress" mirrors examples/counting_stress.make_reads: phred
    30-40 with ~2% low-quality bases — realistic window pass/flag rates.
    quals="uniform" is an adversarial uniform phred 2..40 draw."""
    from kmer_hasher_tpu.io.fastx import col_bucket

    Lp = col_bucket(read_len)
    NUC = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        seq = NUC[jax.random.randint(k1, (rows, Lp), 0, 4)]
        col = jnp.arange(Lp)[None, :]
        seq = jnp.where(col < read_len, seq, jnp.uint8(ord("N")))
        if quals == "stress":
            qual = jax.random.randint(k2, (rows, Lp), 63, 74
                                      ).astype(jnp.uint8)
            low = jax.random.uniform(k3, (rows, Lp)) < 0.02
            lowq = jax.random.randint(k4, (rows, Lp), 35, 53
                                      ).astype(jnp.uint8)
            qual = jnp.where(low, lowq, qual)
        elif quals == "binned":
            # NovaSeq RTA3 alphabet 'F'/':'/','/'#' (phred 37/25/11/2)
            bins = jnp.asarray(np.frombuffer(b"F:,#", np.uint8))
            pick = jax.random.choice(
                k2, 4, (rows, Lp),
                p=jnp.asarray([0.88, 0.08, 0.02, 0.02]))
            qual = bins[pick]
        else:
            qual = jax.random.randint(k2, (rows, Lp), 33 + 2, 33 + 41
                                      ).astype(jnp.uint8)
        return seq, qual

    batches = []
    lengths = jnp.full((rows,), read_len, jnp.int32)
    has_qual = jnp.ones((rows,), bool)
    for i in range(n_batches):
        seq, qual = gen(jax.random.PRNGKey(seed * 1000 + i))
        batches.append((seq, qual, lengths, has_qual))
    # force materialisation so staging cost stays out of the timed loop
    sync1(batches[-1][0])
    return batches


def _n_win(read_len, k):
    """The production window trim (one definition, counting.win_bucket)."""
    from kmer_hasher_tpu.counting import win_bucket

    return win_bucket(read_len, k)


def run_e2e(batches, k, mode, min_q=20, timing=False, read_len=151):
    """The production counting loop over pre-staged device batches."""
    fsm = {"hybrid": "pallas_hybrid", "fast": "pallas", "exact": "exact"}[
        mode] if jax.default_backend() == "tpu" else (
        "hybrid" if mode == "hybrid" else mode)
    min_ll_f = float(Q_TO_LL[33 + int(min_q)])
    store = CountStore(k, counts_n=1, mode="sh")
    backlog = []
    nw = _n_win(read_len, k)
    t0 = time.time()
    for (seq, qual, lengths, has_qual) in batches:
        r = _fused_rp_batch(seq, qual, lengths, has_qual, k,
                            store.counts_n, 0, min_ll_f, fsm, False,
                            keyonly=store.keyonly_runs,
                            min_q_char=33 + int(min_q), n_win=nw)
        store.add_run(r[0], r[1], r[2], r[3], source=0)
        if fsm in ("hybrid", "pallas_hybrid"):
            backlog.append((seq, qual, lengths, r[4], nw, r[5]))
    t_loop = time.time() - t0
    t0 = time.time()
    if backlog:
        from kmer_hasher_tpu.counting import _sweep_backlog

        _sweep_backlog(store, backlog, k, 0, min_ll_f)
    t_sweep = time.time() - t0
    t0 = time.time()
    # single final sync: one element of every live tier run
    getattr(store, "_flush_deferred", lambda: None)()
    for run in store._runs:
        sync1(run[0])
    t_sync = time.time() - t0
    if timing:
        print(f"  [e2e segments: loop-dispatch {t_loop:.2f}s, sweep "
              f"{t_sweep:.2f}s, final-sync {t_sync:.2f}s]", flush=True)
    return store


def run_fused_only(batches, k, mode, min_q=20, read_len=151):
    fsm = {"hybrid": "pallas_hybrid", "fast": "pallas", "exact": "exact"}[
        mode] if jax.default_backend() == "tpu" else (
        "hybrid" if mode == "hybrid" else mode)
    min_ll_f = float(Q_TO_LL[33 + int(min_q)])
    heads = []
    for (seq, qual, lengths, has_qual) in batches:
        r = _fused_rp_batch(seq, qual, lengths, has_qual, k, 1, 0,
                            min_ll_f, fsm, False, keyonly=True,
                            min_q_char=33 + int(min_q),
                            n_win=_n_win(read_len, k))
        heads.append(r[0][:1])
    sync1(jnp.concatenate(heads))


def build_runs(batches, k, mode, min_q=20, read_len=151):
    """Pre-build every batch's LSM run (fused program outputs, retained)."""
    fsm = {"hybrid": "pallas_hybrid", "fast": "pallas", "exact": "exact"}[
        mode] if jax.default_backend() == "tpu" else (
        "hybrid" if mode == "hybrid" else mode)
    min_ll_f = float(Q_TO_LL[33 + int(min_q)])
    runs = []
    for (seq, qual, lengths, has_qual) in batches:
        r = _fused_rp_batch(seq, qual, lengths, has_qual, k, 1, 0,
                            min_ll_f, fsm, False, keyonly=True,
                            min_q_char=33 + int(min_q),
                            n_win=_n_win(read_len, k))
        runs.append(r)
    sync1(runs[-1][0])
    return runs


def run_store_only(runs, k):
    """Time the LSM leg alone: add_run + tier merges + final sync over
    PRE-BUILT runs."""
    store = CountStore(k, counts_n=1, mode="sh")
    for r in runs:
        store.add_run(r[0], r[1], r[2], r[3], source=0)
    getattr(store, "_flush_deferred", lambda: None)()
    for run in store._runs:
        sync1(run[0])
    return store


def run_fsm_only(batches, k, min_q=20):
    from kmer_hasher_tpu.ops.pallas_scan import ll_scan_pallas

    min_ll_f = float(Q_TO_LL[33 + int(min_q)])

    @jax.jit
    def one(seq, qual, lengths):
        out = ll_scan_pallas(seq, qual, lengths, k, min_ll_f,
                             out_layout="LB", return_flags=True,
                             min_q_char=33 + 20)
        return out[0][0, :1]

    heads = [one(seq, qual, lengths)
             for (seq, qual, lengths, _hq) in batches]
    sync1(jnp.concatenate(heads))


def main():
    n_batches = int(os.environ.get("E2E_BATCHES", "64"))
    k = int(os.environ.get("E2E_K", "21"))
    rl = int(os.environ.get("E2E_READLEN", "151"))
    # default rows fill the pow-2 run capacity: largest 1024-multiple with
    # rows * n_win <= 2^22 (99% utilisation vs 68% at pow-2 row buckets)
    auto = (1 << 22) // _n_win(rl, k) // 1024 * 1024
    rows = int(os.environ.get("E2E_ROWS", str(auto)))
    mode = os.environ.get("E2E_MODE", "hybrid")
    read_len = int(os.environ.get("E2E_READLEN", "151"))
    quals = os.environ.get("E2E_QUALS", "stress")
    n_reads = n_batches * rows
    print(f"e2e device bench: {n_batches} x {rows} rows, k={k}, "
          f"mode={mode}, quals={quals}, {n_reads} reads", flush=True)
    t0 = time.time()
    batches = make_batches(n_batches, rows, read_len, quals=quals)
    print(f"staged {n_reads} reads in HBM in {time.time()-t0:.1f}s",
          flush=True)
    runs = build_runs(batches, k, mode, read_len=read_len)

    for name, fn in (
        ("FSM", lambda: run_fsm_only(batches, k)),
        ("FUSED", lambda: run_fused_only(batches, k, mode,
                                         read_len=read_len)),
        ("STORE", lambda: run_store_only(runs, k)),
        ("E2E", lambda: run_e2e(batches, k, mode, timing=True,
                                read_len=read_len)),
    ):
        t0 = time.time()
        fn()
        cold = time.time() - t0
        t0 = time.time()
        out = fn()
        warm = time.time() - t0
        print(f"{name}: warm {warm:.2f}s = {n_reads/warm:,.0f} reads/s "
              f"({warm/n_batches*1e3:.1f} ms/batch; cold {cold:.1f}s)",
              flush=True)
        if name == "E2E" and out is not None:
            print(f"  distinct={out.n_unique:,} total="
                  f"{int(np.asarray(out.total_added).sum()):,}", flush=True)


if __name__ == "__main__" or __name__ == "__chip_job__":
    main()
