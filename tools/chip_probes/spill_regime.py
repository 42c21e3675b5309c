"""Full-corpus spill regime on the real chip (VERDICT r3 item 4).

The reference's flagship corpus is 4.3e8 reads / 7.73e8 distinct / 3.78e10
total k-mers (/root/reference/test.R:491-505); at that scale the count
table alone is ~9-12 GB — spill territory on a 16 GB v5e. This probe
drives the EXACT production per-batch pipeline (counting._fused_rp_batch
-> CountStore.add_run with LSM tier merges) at >= 5e8 DISTINCT keys with
spill_bytes set well under HBM, so:

  * multiple runs genuinely spill off-device mid-run,
  * the fold takes the key-range-partitioned out-of-core rejoin
    (count_store._fold_spilled_ranged — a one-shot rejoin's ~3x merge
    workspace cannot fit 16 GB at this scale),
  * distinct/total are validated against a SLICED EXACT CONTROL: a second
    store receives only the keys with hi == 0 (a 1/1024 key-space slice,
    first rows of every sorted run) and must match the big table's hi==0
    prefix bitwise.

Reads are synthetic 151 bp, k=21, generated on-device (the throttled host
cannot produce 0.5 GB of random bases quickly). Env knobs:
SPILL_BATCHES (128), SPILL_BYTES (2 GiB), SPILL_K (21).

NOTE the tunnel skews wall time: spill readback measured ~12 MB/s here
(tools/chip_probes b_bw job), so several minutes of the wall is tunnel
PCIe-emulation, not device or algorithm time — segments are reported
separately so the PERF.md row can say which is which.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "__file__" in globals():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from kmer_hasher_tpu.counting import _fused_rp_batch, win_bucket  # noqa: E402
from kmer_hasher_tpu.index.count_store import CountStore  # noqa: E402
from kmer_hasher_tpu.qll import Q_TO_LL  # noqa: E402

U32 = jnp.uint32
DEAD = jnp.uint32(0xFFFFFFFF)


def sync1(x):
    return np.asarray(x.ravel()[:1])


def make_gen(rows, read_len):
    from kmer_hasher_tpu.io.fastx import col_bucket

    Lp = col_bucket(read_len)
    NUC = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        seq = NUC[jax.random.randint(k1, (rows, Lp), 0, 4)]
        col = jnp.arange(Lp)[None, :]
        seq = jnp.where(col < read_len, seq, jnp.uint8(ord("N")))
        qual = jax.random.randint(k2, (rows, Lp), 63, 74).astype(jnp.uint8)
        low = jax.random.uniform(k3, (rows, Lp)) < 0.02
        lowq = jax.random.randint(k4, (rows, Lp), 35, 53).astype(jnp.uint8)
        return seq, jnp.where(low, lowq, qual)

    return gen, Lp


CONTROL_CAP = 8192  # >> expected live hi==0 rows per run (~4e3)


@jax.jit
def control_slice(r_hi, r_lo):
    """First CONTROL_CAP rows of a sorted keyonly run, masked to the
    hi == 0 key-space slice (those rows are the run's sorted prefix)."""
    h = r_hi[:CONTROL_CAP]
    l_ = r_lo[:CONTROL_CAP]
    keep = h == 0
    return (jnp.where(keep, h, DEAD), jnp.where(keep, l_, DEAD),
            keep.sum(dtype=jnp.int64)[None])


def main():
    # 244 batches x 29696 rows x 140 windows at the measured ~50.5%
    # stress-qual pass rate -> ~5.12e8 distinct keys, safely under the
    # 2^29 table cap (5.37e8) whose pow-2 doubling would not fit HBM
    n_batches = int(os.environ.get("SPILL_BATCHES", "244"))
    k = int(os.environ.get("SPILL_K", "21"))
    # 1.5 GB: spills happen at LOW HBM pressure (readback is several x
    # faster there) and every per-spill finalize stays small; the fold
    # never pre-merges device runs at this scale (flush spills them all)
    spill_bytes = int(os.environ.get("SPILL_BYTES", str(3 << 29)))
    read_len = 151
    nw = win_bucket(read_len, k)
    rows = int(os.environ.get("SPILL_ROWS",
                              str((1 << 22) // nw // 1024 * 1024)))
    n_reads = n_batches * rows
    min_q = 20
    min_ll_f = float(Q_TO_LL[33 + min_q])
    print(f"spill regime: {n_batches} x {rows} rows x {read_len} bp, "
          f"k={k}, spill_bytes={spill_bytes >> 20} MiB, "
          f"fold_budget={int(os.environ.get('KMH_FOLD_BUDGET_BYTES', str(3 << 30))) >> 20} MiB, "
          f"{n_reads:,} reads, ~{n_reads * nw / 1e8:.1f}e8 windows",
          flush=True)
    gen, _Lp = make_gen(rows, read_len)
    lengths = jnp.full((rows,), read_len, jnp.int32)
    has_qual = jnp.ones((rows,), bool)
    store = CountStore(k, counts_n=1, mode="sh", spill_bytes=spill_bytes)
    control = CountStore(k, counts_n=1, mode="sh")
    fsm = "pallas" if jax.default_backend() == "tpu" else "fast"

    t_all = time.time()
    t_spill_wall = 0.0
    spills_before = 0
    for i in range(n_batches):
        seq, qual = gen(jax.random.PRNGKey(1000 + i))
        r = _fused_rp_batch(seq, qual, lengths, has_qual, k, 1, 0,
                            min_ll_f, fsm, False, keyonly=True,
                            min_q_char=33 + min_q, n_win=nw)
        ch, cl, cn = control_slice(r[0], r[1])
        control.add_run(ch, cl, None, cn, source=0)
        t0 = time.time()
        store.add_run(r[0], r[1], r[2], r[3], source=0)
        if store._spill_seq > spills_before:  # this add blocked on spill
            t_spill_wall += time.time() - t0
            spills_before = store._spill_seq
            print(f"  batch {i + 1}/{n_batches}: spill #{store._spill_seq} "
                  f"({time.time() - t0:.1f}s incl. readback); host-spilled "
                  f"rows so far: "
                  f"{sum(len(p[0]) for _t, p in store._spilled):,}",
                  flush=True)
    for run in store._runs:
        sync1(run[0])
    t_loop = time.time() - t_all
    print(f"count loop: {t_loop:.1f}s ({n_reads / t_loop:,.0f} reads/s "
          f"incl. {t_spill_wall:.1f}s spill readback), "
          f"{store._spill_seq} spills", flush=True)

    t0 = time.time()
    store.flush()
    t_fold = time.time() - t0
    distinct = int(store.n_unique)
    total = int(np.asarray(store.total_added).sum())
    print(f"fold (ranged rejoin): {t_fold:.1f}s -> distinct={distinct:,} "
          f"total={total:,}", flush=True)

    t0 = time.time()
    spec = np.asarray(store.spectrum(10))
    t_spec = time.time() - t0
    print(f"spectrum(10) over {distinct:,} keys: {t_spec:.1f}s; "
          f"head={spec[:4].astype(int).tolist()}", flush=True)

    # sliced exact control: the big table's hi==0 prefix must equal the
    # control store bitwise
    control.flush()
    n0 = int((jnp.asarray(store.u_hi)[: distinct] == 0).sum())
    nc = int(control.n_unique)
    ok = n0 == nc
    if ok:
        b_hi = np.asarray(store.u_hi[:n0])
        b_lo = np.asarray(store.u_lo[:n0])
        b_cn = np.asarray(store.cnt[:n0])
        c_hi = np.asarray(control.u_hi[:nc])
        c_lo = np.asarray(control.u_lo[:nc])
        c_cn = np.asarray(control.cnt[:nc])
        ok = (bool((b_hi == c_hi).all()) and bool((b_lo == c_lo).all())
              and bool((b_cn == c_cn).all()))
    print(f"sliced exact control (hi==0, 1/1024 of key space): big-table "
          f"prefix rows={n0:,} control rows={nc:,} bitwise-equal={ok}",
          flush=True)
    wall = time.time() - t_all
    import json

    print("SPILL_REGIME " + json.dumps({
        "reads": n_reads, "k": k, "distinct": distinct, "total": total,
        "spills": store._spill_seq, "wall_s": round(wall, 1),
        "loop_s": round(t_loop, 1),
        "spill_readback_s": round(t_spill_wall, 1),
        "fold_s": round(t_fold, 1), "spectrum_s": round(t_spec, 1),
        "reads_per_s": round(n_reads / wall),
        "control_ok": bool(ok),
    }), flush=True)
    assert ok, "sliced exact control mismatch"
    assert store._spill_seq >= 2, "fewer than 2 spills — not the regime"
    if n_reads * nw >= 5e8:  # the full-scale regime bar
        assert distinct >= 5e8, distinct


if __name__ == "__main__" or __name__ == "__chip_job__":
    main()
