"""Multi-host bring-up: 2 jax.distributed CPU processes counting disjoint
read slices into one global ShardedCountStore (BASELINE.md scaling row).

Each subprocess owns 4 virtual CPU devices; the 8-shard mesh spans both.
The spectrum from the distributed run must equal the single-process one.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from kmer_hasher_tpu.parallel.distributed import init_distributed, host_read_slice
info = init_distributed(coord, num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

import numpy as np
from jax.sharding import Mesh
from kmer_hasher_tpu.parallel.sharded import ShardedCountStore
from kmer_hasher_tpu.io import read_fastx
from kmer_hasher_tpu.ops import encode as enc

k = 11
recs = read_fastx("/root/reference/test.fastq.gz", 64)
sl = host_read_slice(len(recs))  # this process's slice of the input
mine = recs[sl]
D_local = len(jax.local_devices())
mesh = Mesh(np.asarray(jax.devices()), ("shards",))
store = ShardedCountStore(k, mesh, counts_n=1)

# encode this host's reads into D_local rows
L = 256
seq = np.full((D_local, 32 * L), ord("N"), np.uint8)
row = np.zeros(D_local, np.int64)
for i, (_n, s, _q) in enumerate(mine):
    d = i % D_local
    s = s[:L]
    seq[d, row[d]:row[d] + len(s)] = np.frombuffer(s, np.uint8)
    row[d] += len(s) + 1  # N separator between reads
hi, lo, valid = enc.encode_stream(seq, k, np.full(D_local, 32 * L, np.int64),
                                  canonical=True,
                                  drop_trailing_exact_k=False)
store.add_batch(np.asarray(hi), np.asarray(lo), np.asarray(valid))
spec = store.spectrum(50)
if pid == 0:
    print("SPECTRUM " + json.dumps(spec.tolist()))
print("WORKER_OK", pid)
"""


def test_two_process_distributed_counting(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
    spec_line = next(ln for ln in outs[0][1].splitlines()
                     if ln.startswith("SPECTRUM "))
    dist_spec = np.asarray(json.loads(spec_line.split(" ", 1)[1]))

    # single-process reference: same reads, same row layout, one process
    import jax
    from jax.sharding import Mesh

    from kmer_hasher_tpu.io import read_fastx
    from kmer_hasher_tpu.ops import encode as enc
    from kmer_hasher_tpu.parallel.sharded import ShardedCountStore

    k = 11
    recs = read_fastx("/root/reference/test.fastq.gz", 64)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("shards",))
    store = ShardedCountStore(k, mesh, counts_n=1)
    L = 256
    # reproduce the workers' per-process layout: 2 processes x 4 rows
    seq = np.full((8, 32 * L), ord("N"), np.uint8)
    row = np.zeros(8, np.int64)
    halves = [recs[:32], recs[32:]]
    for p, half in enumerate(halves):
        for i, (_n, s, _q) in enumerate(half):
            d = p * 4 + i % 4
            s = s[:L]
            seq[d, row[d]:row[d] + len(s)] = np.frombuffer(s, np.uint8)
            row[d] += len(s) + 1
    hi, lo, valid = enc.encode_stream(seq, k, np.full(8, 32 * L, np.int64),
                                      canonical=True,
                                      drop_trailing_exact_k=False)
    store.add_batch(np.asarray(hi), np.asarray(lo), np.asarray(valid))
    np.testing.assert_array_equal(dist_spec, store.spectrum(50))


HIGH_LEVEL_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from kmer_hasher_tpu.parallel.distributed import init_distributed
init_distributed(coord, num_processes=2, process_id=pid)

import numpy as np
from jax.sharding import Mesh
from kmer_hasher_tpu.counting import count_kmers_fq_sh_rp

mesh = Mesh(np.asarray(jax.devices()), ("shards",))
store = count_kmers_fq_sh_rp("/root/reference/test.fastq.gz", 11, min_q=20,
                             max_reads=64, mesh=mesh)
spec = store.spectrum(50)  # collective: every process participates
# multi-process checkpoint round-trip: save (process 0 writes), restore on
# the same mesh, spectra must match bitwise
import tempfile, os
from kmer_hasher_tpu.utils import checkpoint as ckpt
path = os.path.join(tempfile.gettempdir(), "kmh_dist_ckpt_test.npz")
ckpt.save_count_store(store, path)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt_written")  # 0 wrote the file
restored = ckpt.load_count_store(path, mesh=mesh)
rspec = restored.spectrum(50)
assert (rspec == spec).all(), "checkpoint round-trip spectrum mismatch"
if pid == 0:
    os.unlink(path)
    print("SPECTRUM " + json.dumps(spec.tolist()))
    print("TOTAL " + json.dumps(store.total_added.tolist()))
print("WORKER_OK", pid)
"""


INDEX_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from kmer_hasher_tpu.parallel.distributed import init_distributed
init_distributed(coord, num_processes=2, process_id=pid)

import numpy as np
from jax.sharding import Mesh
from kmer_hasher_tpu.io import read_fastx
from kmer_hasher_tpu.parallel.sharded import ShardedKmerIndex

seq = read_fastx("/root/reference/test.fa")[0][1][:4000]
mesh = Mesh(np.asarray(jax.devices()), ("shards",))
idx = ShardedKmerIndex(seq, 8, mesh)
tabs = idx.tables(1 | 2 | 8)
hits = idx.seq_kmer_pos(seq[1000:1200], 8)
if pid == 0:
    print("TABLES " + json.dumps({{
        "total": idx.total_kmers,
        "n_kmers": idx.n_kmers,
        "kmer_head": tabs["kmer"][:5],
        "pos": np.asarray(tabs["pos"]).tolist(),
        "count": np.asarray(tabs["count"]).tolist(),
        "hits": np.asarray(hits).tolist(),
    }}))
print("WORKER_OK", pid)
"""


def test_two_process_index_build(tmp_path):
    """ShardedKmerIndex on a 2-process mesh: build, range-partitioned
    tables, and cross-sequence query all equal the single-process run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker_idx.py"
    script.write_text(INDEX_WORKER.format(repo=repo))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
    line = next(ln for ln in outs[0][1].splitlines()
                if ln.startswith("TABLES "))
    dist = json.loads(line.split(" ", 1)[1])

    import jax
    from jax.sharding import Mesh

    from kmer_hasher_tpu.io import read_fastx
    from kmer_hasher_tpu.parallel.sharded import ShardedKmerIndex

    seq = read_fastx("/root/reference/test.fa")[0][1][:4000]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("shards",))
    idx = ShardedKmerIndex(seq, 8, mesh)
    tabs = idx.tables(1 | 2 | 8)
    assert dist["total"] == idx.total_kmers
    assert dist["n_kmers"] == idx.n_kmers
    assert dist["kmer_head"] == tabs["kmer"][:5]
    np.testing.assert_array_equal(np.asarray(dist["pos"]), tabs["pos"])
    np.testing.assert_array_equal(np.asarray(dist["count"]), tabs["count"])
    np.testing.assert_array_equal(np.asarray(dist["hits"]),
                                  idx.seq_kmer_pos(seq[1000:1200], 8))


def test_two_process_high_level_counting(tmp_path):
    """count_kmers_fq_sh_rp(mesh=) on a 2-process mesh: each process feeds
    its row slice of every batch (per-host input sharding), results equal
    the single-process run byte-for-byte."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker_hl.py"
    script.write_text(HIGH_LEVEL_WORKER.format(repo=repo))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
    lines = outs[0][1].splitlines()
    dist_spec = np.asarray(json.loads(
        next(ln for ln in lines if ln.startswith("SPECTRUM ")).split(" ", 1)[1]
    ))
    dist_total = json.loads(
        next(ln for ln in lines if ln.startswith("TOTAL ")).split(" ", 1)[1]
    )

    import jax
    from jax.sharding import Mesh

    from kmer_hasher_tpu.counting import count_kmers_fq_sh_rp

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("shards",))
    single = count_kmers_fq_sh_rp("/root/reference/test.fastq.gz", 11,
                                  min_q=20, max_reads=64, mesh=mesh)
    np.testing.assert_array_equal(dist_spec, single.spectrum(50))
    assert dist_total == single.total_added.tolist()
