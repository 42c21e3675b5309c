"""Native C++ fastx parser vs the pure-Python reader."""
import pathlib

import pytest

from kmer_hasher_tpu.io import fastx, native

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser not built"
)


@pytest.mark.parametrize(
    "name", ["test.fa", "test_10.fastq", "test.fastq.gz", "repeat_40.fq"]
)
def test_native_matches_python(name):
    assert native.read_fastx(str(REF / name)) == fastx.read_fastx_py(
        str(REF / name)
    )


def test_native_max_records():
    a = native.read_fastx(str(REF / "test.fastq.gz"), 7)
    assert len(a) == 7


def test_native_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.read_fastx(str(tmp_path / "missing.fa"))
    bad = tmp_path / "bad.txt"
    bad.write_text("not a fastx\n")
    with pytest.raises(ValueError):
        native.read_fastx(str(bad))
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    assert native.read_fastx(str(empty)) == []


def test_native_multiline_fasta(tmp_path):
    p = tmp_path / "ml.fa"
    p.write_text(">a desc here\nACGT\nACGT\n>b\nGGGG\n")
    recs = native.read_fastx(str(p))
    assert recs == [("a", b"ACGTACGT", None), ("b", b"GGGG", None)]
    assert recs == fastx.read_fastx_py(str(p))
