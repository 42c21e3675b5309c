"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run over
``--xla_force_host_platform_device_count=8`` CPU devices, per the driver
contract. Must be set before JAX initialises its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache is configured by the package itself
# (kmer_hasher_tpu/__init__.py); shared across test and dev processes.
# The env var alone does not override an installed platform plugin (axon
# TPU) — force the CPU platform through the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def test_fa() -> str:
    """The bundled 59,940 bp SUPER_1 sequence (reference test.fa)."""
    from kmer_hasher_tpu.io import read_fastx

    recs = read_fastx(str(REFERENCE / "test.fa"))
    assert len(recs) == 1 and recs[0][0] == "SUPER_1"
    return recs[0][1].decode()


@pytest.fixture(scope="session")
def test_10_fastq():
    from kmer_hasher_tpu.io import read_fastx

    return read_fastx(str(REFERENCE / "test_10.fastq"))


@pytest.fixture(scope="session")
def repeat_40_fq():
    from kmer_hasher_tpu.io import read_fastx

    return read_fastx(str(REFERENCE / "repeat_40.fq"))


@pytest.fixture(scope="session")
def test_fastq_gz():
    from kmer_hasher_tpu.io import read_fastx

    return read_fastx(str(REFERENCE / "test.fastq.gz"))
