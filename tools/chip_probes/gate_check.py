"""Versioned sort-gate re-probe (VERDICT r3 item 7).

BASELINE.md's 5 Gkmers/s north-star row assumes a distribution sort
running at HBM bandwidth, which this toolchain does not expose (PERF.md
"Round 3: the sort gate, reopened and closed"). This probe re-prices that
assumption on the CURRENT toolchain: it measures the five decomposition
floors the round-3 gate analysis rests on, stamps them with
jax/jaxlib/libtpu versions, prints ONE JSON line, and appends a row to
PERF.md's "Sort-gate check history" table. Run it after any jax / jaxlib
/ libtpu bump (directly, or as a chip_worker job):

    python tools/chip_probes/gate_check.py [logn]      # default 2^24

Exit code 2 ("GATE MOVED") when any floor shifted enough to re-open the
round-3 conclusion:
  * the flat lax.sort floor improved > 15% (sort itself got faster), or
  * XLA scatter or gather improved > 2x (a distribution pass may now be
    expressible — the decisive budget in PERF.md needs <= ~1.9 ns/elem
    data-dependent movement).
CI can treat exit 2 as "re-run sort_probes_r3 and reprice BASELINE".
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)  # the u64-key probe needs real
# uint64 (without x64 the astype silently truncates to u32 and the
# headline floor measures the wrong sort)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = (os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))) if "__file__" in globals()
    else "/root/repo")  # chip_worker execs jobs without __file__

# round-3 reference floors (ns/elem) from PERF.md, axon-v5e,
# jax/jaxlib 0.9.0 — the numbers the gate conclusion was priced against
R3_FLOORS = {
    "flat_sort_u64_1pay": 3.60,
    "flat_sort_u32_1pay": 3.51,
    "row_sort_2048x8192": 1.58,
    "scatter_add": 8.7,
    "gather_random": 23.6,
}


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _timeit(fn, *args, iters=3):
    fn(*args)
    _sync(fn(*args))
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t) / iters


def measure(logn: int = 24) -> dict:
    n = 1 << logn
    rng = np.random.default_rng(0)
    k32 = jnp.asarray(rng.integers(0, 2 ** 32, n, np.uint64)
                      .astype(np.uint32))
    pos = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def s_u64(k, a):  # the headline (u64 key, u32 pos) 1-key-stable form
        kk = (k.astype(jnp.uint64) << jnp.uint64(32)) | a.astype(jnp.uint64)
        return jax.lax.sort((kk, a), dimension=-1, num_keys=1,
                            is_stable=True)

    @jax.jit
    def s_u32(k, a):  # one u32 LSD pass
        return jax.lax.sort((k, a), dimension=-1, num_keys=1, is_stable=True)

    @jax.jit
    def s_rows(k, a):  # batched row sort: the merge-tree leaf floor
        return jax.lax.sort((k.reshape(2048, -1), a.reshape(2048, -1)),
                            dimension=-1, num_keys=1, is_stable=True)

    idx = jnp.asarray(rng.integers(0, n, n, np.int64).astype(np.int32))

    @jax.jit
    def scat(i):  # distribution-pass floor: scatter-add
        return jnp.zeros(n, jnp.uint32).at[i].add(1, mode="drop")

    @jax.jit
    def gath(k, a, i):  # distribution-pass floor: random gather, 2 lanes
        return jnp.take(k, i), jnp.take(a, i)

    out = {}
    out["flat_sort_u64_1pay"] = _timeit(s_u64, k32, pos) / n * 1e9
    out["flat_sort_u32_1pay"] = _timeit(s_u32, k32, pos) / n * 1e9
    out["row_sort_2048x8192"] = _timeit(s_rows, k32, pos) / n * 1e9
    out["scatter_add"] = _timeit(scat, idx) / n * 1e9
    out["gather_random"] = _timeit(gath, k32, pos, idx) / n * 1e9
    return out


def versions() -> dict:
    import jaxlib

    v = {"jax": jax.__version__, "jaxlib": jaxlib.__version__,
         "libtpu": None, "device": jax.devices()[0].device_kind,
         "platform": jax.default_backend()}
    try:
        import libtpu  # type: ignore

        v["libtpu"] = getattr(libtpu, "__version__", None)
    except Exception:
        pass
    return v


def gate_moved(floors: dict) -> list:
    moved = []
    if floors["flat_sort_u64_1pay"] < R3_FLOORS["flat_sort_u64_1pay"] * 0.85:
        moved.append("flat sort floor improved >15%")
    for key in ("scatter_add", "gather_random"):
        if floors[key] < R3_FLOORS[key] / 2:
            moved.append(f"{key} improved >2x")
    return moved


def append_history(record: dict) -> None:
    """Append one row to PERF.md's sort-gate history table (creates the
    stanza on first run)."""
    perf = os.path.join(REPO, "PERF.md")
    with open(perf) as f:
        text = f.read()
    header = "## Sort-gate check history"
    v, fl = record["versions"], record["floors"]
    row = ("| {date} | {jax}/{jaxlib} | {device} | {s64:.2f} | {s32:.2f} "
           "| {rows:.2f} | {scat:.2f} | {gath:.2f} | {verdict} |\n").format(
        date=record["date"], jax=v["jax"], jaxlib=v["jaxlib"],
        device=v["device"], s64=fl["flat_sort_u64_1pay"],
        s32=fl["flat_sort_u32_1pay"], rows=fl["row_sort_2048x8192"],
        scat=fl["scatter_add"], gath=fl["gather_random"],
        verdict=("MOVED: " + "; ".join(record["moved"])) if record["moved"]
        else "stands")
    if header not in text:
        stanza = (
            f"\n{header}\n\n"
            "Standing re-probe of the round-3 sort-gate floors "
            "(tools/chip_probes/gate_check.py, ns/elem at 2^24): run after "
            "any jax/jaxlib/libtpu bump; 'MOVED' means BASELINE.md's "
            "5 Gk/s assumption needs repricing via sort_probes_r3.\n\n"
            "| date | jax/jaxlib | device | u64 sort | u32 sort | row sort "
            "| scatter | gather | gate |\n"
            "|---|---|---|---|---|---|---|---|---|\n" + row)
        text = text.rstrip("\n") + "\n" + stanza
    else:
        # append after the last row of the existing table
        idx = text.index(header)
        tail = text[idx:]
        last_nl = idx + len(tail.rstrip("\n")) + 1
        text = text[:last_nl - 1] + "\n" + row + text[last_nl:]
    with open(perf, "w") as f:
        f.write(text)


def main(logn: int = 24, write: bool = True) -> int:
    floors = measure(logn)
    record = {
        "date": time.strftime("%Y-%m-%d"),
        "versions": versions(),
        "logn": logn,
        "floors": {k: round(v, 3) for k, v in floors.items()},
        "r3_floors": R3_FLOORS,
        "moved": gate_moved(floors),
    }
    print("GATE_CHECK " + json.dumps(record))
    if write:
        append_history(record)
    if record["moved"]:
        print("GATE MOVED — reprice BASELINE.md 5 Gk/s via sort_probes_r3:",
              "; ".join(record["moved"]))
        return 2
    print("gate stands: flat sort floor "
          f"{floors['flat_sort_u64_1pay']:.2f} ns/elem "
          f"(r3: {R3_FLOORS['flat_sort_u64_1pay']})")
    return 0


if __name__ == "__main__" or __name__ == "__chip_job__":
    _logn = int(sys.argv[1]) if (__name__ == "__main__"
                                 and len(sys.argv) > 1) else 24
    rc = main(_logn)
    if __name__ == "__main__":
        sys.exit(rc)
