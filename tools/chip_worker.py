"""Persistent chip job worker.

The tunneled axon chip tolerates exactly one client process, charges
minutes of session-establishment per process, and wedges when clients are
killed. So: keep ONE long-lived process that connects once and executes
job files submitted to a spool directory.

  python tools/chip_worker.py [spool_dir]   # default /tmp/chip_jobs

Submit work by writing `<name>.py` into the spool; the worker execs it
in-process (fresh namespace, repo on sys.path), captures stdout/stderr to
`<name>.out`, and renames the job to `<name>.done` (or `.fail`). Jobs run
in lexicographic order. A job named `quit.py` shuts the worker down after
running. Poll the `.out` file for results.
"""
import io
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_jobs"
    os.makedirs(spool, exist_ok=True)
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.zeros(8, jnp.uint32))
    ready = f"device ready in {time.time() - t0:.1f}s"
    print(ready, flush=True)
    with open(os.path.join(spool, "READY"), "w") as f:
        f.write(ready + "\n")

    while True:
        jobs = sorted(f for f in os.listdir(spool) if f.endswith(".py"))
        if not jobs:
            time.sleep(2)
            continue
        name = jobs[0]
        path = os.path.join(spool, name)
        out_path = path[:-3] + ".out"
        print(f"running {name}", flush=True)
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        ok = True
        t = time.time()
        # drop cached repo modules so each job sees the CURRENT source
        # (the worker process is long-lived; stale kmer_hasher_tpu modules
        # made round-3 probe results lie about edited code)
        for m in [m for m in sys.modules if m.startswith("kmer_hasher_tpu")]:
            del sys.modules[m]
        try:
            sys.stdout = sys.stderr = buf
            src = open(path).read()
            exec(compile(src, path, "exec"), {"__name__": "__chip_job__"})
        except BaseException:
            ok = False
            traceback.print_exc(file=buf)
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        buf.write(f"\n[job {'ok' if ok else 'FAILED'} in "
                  f"{time.time() - t:.1f}s]\n")
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
        os.rename(path, path[:-3] + (".done" if ok else ".fail"))
        # free every device buffer a job left behind (a failed job's
        # traceback/jit-cache references otherwise pin GBs of HBM and
        # poison every following job with RESOURCE_EXHAUSTED)
        import gc

        import jax

        gc.collect()
        for arr in jax.live_arrays():
            arr.delete()
        if not ok:
            # a crashed job can leave executables whose device constants
            # live_arrays() doesn't track; drop the jit caches too (the
            # persistent compile cache makes reloads cheap)
            jax.clear_caches()
            gc.collect()
        print(f"finished {name} ok={ok}", flush=True)
        if name == "quit.py":
            return


if __name__ == "__main__":
    main()
