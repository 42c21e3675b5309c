"""One-session measurement driver: merge probe + end-to-end counting
stress in a SINGLE chip process, so tunnel session establishment (1 s to
many minutes, see PERF.md) is paid once.

Usage: python tools/chip_probes/session_bench.py [--reads 200000]
       [--probe-logs 22 24] [--skip-probe] [--skip-stress]

Run SOLO (one chip process at a time).
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--probe-logs", type=int, nargs="*", default=[22, 24])
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--skip-stress", action="store_true")
    ap.add_argument("--report-every", type=int, default=50_000)
    args = ap.parse_args()

    t0 = time.perf_counter()
    import jax.numpy as jnp

    np.asarray(jnp.zeros(8, jnp.uint32)[:1])
    print(f"device ready in {time.perf_counter() - t0:.1f} s", flush=True)

    if not args.skip_probe:
        from tools.chip_probes import lsm_merge_probe as probe

        sys.argv = ["lsm_merge_probe.py"] + [str(x) for x in args.probe_logs]
        probe.main()

    if not args.skip_stress:
        sys.path.insert(0, os.path.join(REPO, "examples"))
        import counting_stress

        counting_stress.main([
            "--reads", str(args.reads),
            "--keep", f"/tmp/kmh_stress_{args.reads}.fq",
            "--report-every", str(args.report_every),
        ])


if __name__ == "__main__":
    main()
