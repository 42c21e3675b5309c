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


def test_streaming_raw_batches_match_whole_file():
    from kmer_hasher_tpu.io import native

    if not native.available():
        import pytest
        pytest.skip("native parser unavailable")
    import numpy as np

    path = "/root/reference/test.fastq.gz"
    whole = native.read_fastx_raw(path)
    batches = list(native.iter_fastx_raw(path, batch_records=700))
    assert [len(b[3]) for b in batches] == [700, 700, 700, 400]
    seq_cat = np.concatenate([b[0] for b in batches])
    np.testing.assert_array_equal(seq_cat, whole[0])
    qual_cat = np.concatenate([b[1] for b in batches])
    np.testing.assert_array_equal(qual_cat, whole[1])
    qp_cat = np.concatenate([b[3] for b in batches])
    np.testing.assert_array_equal(qp_cat, whole[3])
    # per-batch offsets rebase to 0 and chain to the global ones
    lens_stream = np.concatenate([np.diff(b[2]) for b in batches])
    np.testing.assert_array_equal(lens_stream, np.diff(whole[2]))
    # max_records honoured mid-batch
    lim = list(native.iter_fastx_raw(path, batch_records=64,
                                     max_records=100))
    assert sum(len(b[3]) for b in lim) == 100
    # FASTA streaming across batch boundaries
    fa = list(native.iter_fastx_raw("/root/reference/test.fa", 10))
    assert len(fa) == 1 and len(fa[0][3]) == 1
