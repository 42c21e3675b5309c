from kmer_hasher_tpu.io import pad_records


def test_read_fasta(test_fa):
    assert len(test_fa) == 59940
    assert set(test_fa) <= set("ACGT")


def test_read_fastq(test_10_fastq):
    assert len(test_10_fastq) == 10
    for _n, s, q in test_10_fastq:
        assert q is not None and len(q) == len(s)


def test_read_fastq_gz(test_fastq_gz):
    assert len(test_fastq_gz) == 2500
    for _n, s, q in test_fastq_gz[:10]:
        assert q is not None and len(q) == len(s)


def test_repeat40(repeat_40_fq):
    assert len(repeat_40_fq) == 10
    for _n, s, _q in repeat_40_fq:
        assert len(s) == 250


def test_padding(repeat_40_fq):
    pr = pad_records(repeat_40_fq)
    assert pr.seq.shape[0] == 10
    assert pr.seq.shape[1] % 8 == 0
    assert (pr.lengths == 250).all()
    assert pr.has_qual.all()
    # padded tail is 'N' with qual 0 so it can never form valid windows
    assert (pr.seq[:, 250:] == ord("N")).all()
    assert (pr.qual[:, 250:] == 0).all()
