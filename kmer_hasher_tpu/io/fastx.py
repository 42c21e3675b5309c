"""FASTA / FASTQ (.gz) reading.

The reference streams records with klib's ``kseq.h`` (vendored,
src/kseq.h:176-219) over zlib. Here the pure-Python reader is the portable
fallback; a native C++ parser (``kmer_hasher_tpu.io.native``) provides the
fast path and is used automatically when its shared library is available.

Records are surfaced two ways:

* :func:`read_fastx` — list of (name, seq_bytes, qual_bytes|None), matching
  kseq record semantics (FASTA records have no qualities).
* :func:`read_fastx_padded` — device-ready dense batch: uint8 ASCII matrices
  ``seq[n_reads, max_len]`` and ``qual`` (0 where absent) plus a length
  vector. Padding uses base 'N' / quality 0 so padded tails can never form
  valid windows on any filtering path.
"""
from __future__ import annotations

import gzip
import io
import itertools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

Record = Tuple[str, bytes, Optional[bytes]]


def _open(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


def read_fastx(path: str, max_records: Optional[int] = None) -> List[Record]:
    """Parse FASTA or FASTQ, optionally gzipped. Auto-detects format from the
    first byte ('>' FASTA, '@' FASTQ), like kseq (src/kseq.h:178-190)."""
    try:
        from . import native

        if native.available():
            return native.read_fastx(path, max_records)
    except Exception:
        pass
    return read_fastx_py(path, max_records)


def iter_fastx(path: str, batch_size: int = 4096,
               max_records: Optional[int] = None):
    """Stream records in batches of ``batch_size`` with constant memory —
    the scalable path for multi-hundred-million-read corpora (the reference
    streams one record at a time via kseq; here a batch is the unit the
    device consumes). Uses the pure-Python parser; the native parser is for
    whole-file loads."""
    batch: List[Record] = []
    n = 0
    for rec in _iter_records_py(path):
        batch.append(rec)
        n += 1
        if max_records is not None and n >= max_records:
            break
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def _iter_records_py(path: str):
    with _open(path) as f:
        buf = io.BufferedReader(f) if not isinstance(f, io.BufferedReader) else f
        first = buf.peek(1)[:1]
        if first == b">":
            name = None
            chunks: List[bytes] = []
            for line in buf:
                line = line.rstrip(b"\r\n")
                if line.startswith(b">"):
                    if name is not None:
                        yield (name, b"".join(chunks), None)
                    name = line[1:].split()[0].decode() if len(line) > 1 else ""
                    chunks = []
                else:
                    chunks.append(line)
            if name is not None:
                yield (name, b"".join(chunks), None)
        elif first == b"@":
            # Multi-line FASTQ like kseq (src/kseq.h:195-218): sequence
            # spans lines until the '+' separator; quality bytes accumulate
            # until they reach the sequence length.
            while True:
                hdr = buf.readline()
                if not hdr:
                    return
                name = (hdr[1:].rstrip(b"\r\n").split()[0].decode()
                        if len(hdr) > 1 else "")
                chunks = []
                line = b""
                for line in buf:
                    if line.startswith(b"+"):
                        break
                    chunks.append(line.rstrip(b"\r\n"))
                seq = b"".join(chunks)
                if not line.startswith(b"+"):  # truncated: FASTA-ish tail
                    yield (name, seq, None)
                    return
                qchunks: List[bytes] = []
                qlen = 0
                while qlen < len(seq):
                    qline = buf.readline()
                    if not qline:
                        break
                    qchunks.append(qline.rstrip(b"\r\n"))
                    qlen += len(qchunks[-1])
                qual = b"".join(qchunks)
                yield (name, seq, qual if len(qual) == len(seq) else None)
        elif first:
            raise ValueError(f"unrecognised fastx leader byte {first!r} in {path}")


def is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


def find_record_boundary(path: str, start: int, end: int) -> int:
    """First record start at-or-after byte ``start`` and before ``end``
    (-1 if none) — the pure-Python twin of the native range opener. Plain
    files only. FASTA boundaries ('>' line starts) are unambiguous; FASTQ
    '@'/'+' are legal quality bytes, so candidates are verified against
    two consecutive 4-line records (the standard parallel-splitter
    re-sync; multi-line FASTQ is not supported in range mode)."""
    with open(path, "rb") as f:
        fmt = f.read(1)
        if start <= 0:
            return 0
        # seek to start-1 and drop a line: lands exactly on `start` when
        # the previous byte is '\n', so a record starting AT start is ours
        f.seek(start - 1)
        f.readline()
        if fmt == b">":
            while True:
                pos = f.tell()
                if pos >= end:
                    return -1
                line = f.readline()
                if not line:
                    return -1
                if line.startswith(b">"):
                    return pos
        lines: List[Tuple[int, bytes]] = []

        def have(i: int) -> bool:
            while len(lines) <= i:
                pos = f.tell()
                ln = f.readline()
                if not ln:
                    return False
                lines.append((pos, ln.rstrip(b"\r\n")))
            return True

        i = 0
        while True:
            if not have(i):
                return -1
            pos, ln = lines[i]
            if pos >= end:
                return -1
            if ln.startswith(b"@"):
                if have(i + 3):
                    ok = (lines[i + 2][1].startswith(b"+")
                          and len(lines[i + 3][1]) == len(lines[i + 1][1]))
                    if ok and have(i + 7):
                        ok = (lines[i + 4][1].startswith(b"@")
                              and lines[i + 6][1].startswith(b"+")
                              and len(lines[i + 7][1])
                              == len(lines[i + 5][1]))
                    elif ok and have(i + 4):
                        ok = lines[i + 4][1].startswith(b"@")
                else:
                    ok = have(i + 2) and lines[i + 2][1].startswith(b"+")
                if ok:
                    return pos
            i += 1


def _iter_records_py_range(path: str, start: int, end: int,
                           range_info: Optional[dict] = None):
    """Records whose first byte falls in [start, end) — see
    :func:`find_record_boundary`. The union over hosts of contiguous byte
    ranges partitions the file's records exactly. The record GRAMMAR
    matches the full parser (multi-line FASTA/FASTQ), but FASTQ boundary
    re-sync is 4-line-only — callers gate on :func:`is_fourline_fastq`
    and verify continuity via ``range_info`` (filled with the resolved
    ``start``/``end`` record-boundary offsets)."""
    boundary = find_record_boundary(path, start, end)
    if boundary < 0:
        if range_info is not None:
            range_info["start"] = range_info["end"] = int(start)
        return
    if range_info is not None:
        range_info["start"] = int(boundary)
    with open(path, "rb") as f:
        fmt = f.read(1)
        f.seek(boundary)

        def done(pos):
            if range_info is not None:
                range_info["end"] = int(pos)

        if fmt == b">":
            name = None
            chunks: List[bytes] = []
            while True:
                pos = f.tell()
                line = f.readline()
                if not line:
                    break
                s = line.rstrip(b"\r\n")
                if s.startswith(b">"):
                    if name is not None:
                        yield (name, b"".join(chunks), None)
                        name = None
                    if pos >= end:
                        done(pos)
                        return
                    name = s[1:].split()[0].decode() if len(s) > 1 else ""
                    chunks = []
                else:
                    chunks.append(s)
            if name is not None:
                yield (name, b"".join(chunks), None)
            done(f.tell())
            return
        while True:
            pos = f.tell()
            hdr = f.readline()
            if not hdr or pos >= end:
                done(pos)
                return
            name = (hdr[1:].rstrip(b"\r\n").split()[0].decode()
                    if len(hdr) > 1 else "")
            # sequence spans lines until the '+' separator (kseq grammar)
            chunks = []
            line = b""
            while True:
                line = f.readline()
                if not line or line.startswith(b"+"):
                    break
                chunks.append(line.rstrip(b"\r\n"))
            seq = b"".join(chunks)
            if not line.startswith(b"+"):  # truncated: FASTA-ish tail
                yield (name, seq, None)
                done(f.tell())
                return
            qchunks: List[bytes] = []
            qlen = 0
            while qlen < len(seq):
                ql = f.readline()
                if not ql:
                    break
                qchunks.append(ql.rstrip(b"\r\n"))
                qlen += len(qchunks[-1])
            qual = b"".join(qchunks)
            yield (name, seq, qual if len(qual) == len(seq) else None)


def iter_fastx_range(path: str, start: int, end: int,
                     batch_size: int = 4096,
                     range_info: Optional[dict] = None):
    """Batched wrapper over :func:`_iter_records_py_range`."""
    batch: List[Record] = []
    for rec in _iter_records_py_range(path, start, end, range_info):
        batch.append(rec)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def is_fourline_fastq(path: str, n_records: int = 64) -> bool:
    """True when the file is range-sliceable: FASTA (multi-line fine —
    '>' boundaries are unambiguous), or FASTQ whose first ``n_records``
    are strict 4-line records. Multi-line FASTQ defeats the byte-range
    boundary re-sync, so the multi-host sliced path gates on this (plus
    a continuity check over the resolved boundaries for any multi-line
    tail the peek cannot see)."""
    with open(path, "rb") as f:
        first = f.read(1)
        if first != b"@":
            return True  # FASTA / empty; non-fastx errors surface later
        f.seek(0)
        for _ in range(n_records):
            hdr = f.readline()
            if not hdr:
                return True
            if not hdr.startswith(b"@"):
                return False
            seq = f.readline().rstrip(b"\r\n")
            sep = f.readline()
            qual = f.readline().rstrip(b"\r\n")
            if not sep.startswith(b"+") or len(qual) != len(seq):
                return False
    return True


def read_fastx_py(path: str, max_records: Optional[int] = None) -> List[Record]:
    it = _iter_records_py(path)
    if max_records is None:
        return list(it)
    return list(itertools.islice(it, max_records))


@dataclass
class PaddedReads:
    """Dense, device-friendly batch of variable-length reads."""

    seq: np.ndarray   # uint8 [n, max_len] ASCII codes, padded with ord('N')
    qual: np.ndarray  # uint8 [n, max_len], 0 where absent/padded
    lengths: np.ndarray  # int32 [n]
    has_qual: np.ndarray  # bool [n]

    @property
    def n_reads(self) -> int:
        return int(self.seq.shape[0])


def row_cap_bucket(batch_records: int) -> int:
    """Row capacity for FULL batches: a multiple of 1024 (the Pallas FSM
    tile) instead of a power of two, so tuned batch sizes like 29696
    (which fill an LSM run's pow-2 capacity to ~99%) keep their exact row
    count; partial batches still bucket to pow2 below this cap."""
    if batch_records >= 1024:
        return -(-batch_records // 1024) * 1024
    return 1 << max(3, (batch_records - 1).bit_length())


def row_bucket(B: int, batch_records: int) -> int:
    """Padded row count for a batch of B records within a
    batch_records-sized stream (see row_cap_bucket)."""
    return min(1 << max(3, (max(B, 1) - 1).bit_length()),
               row_cap_bucket(batch_records))


def col_bucket(lmax: int) -> int:
    """Padded column count for read batches: multiples of 64 above 32
    instead of powers of two — a 151 bp read pads to 192 columns, not
    256, cutting ~25% of the upload bytes and FSM scan length at the
    cost of a few more XLA shape buckets (the Pallas kernels re-pad to
    their own block sizes internally, so any multiple of 8 is safe).
    KMH_PAD_COLS=pow2 reverts to power-of-two buckets."""
    import os

    lmax = max(1, int(lmax))
    if os.environ.get("KMH_PAD_COLS", "mult64") == "pow2":
        return 1 << max(5, (lmax - 1).bit_length())
    if lmax <= 32:
        return 32
    return -(-lmax // 64) * 64


def pad_records(records: List[Record], pad_to_multiple: int = 8) -> PaddedReads:
    n = len(records)
    max_len = max((len(r[1]) for r in records), default=1)
    max_len = max(1, -(-max_len // pad_to_multiple) * pad_to_multiple)
    seq = np.full((n, max_len), ord("N"), dtype=np.uint8)
    qual = np.zeros((n, max_len), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    has_qual = np.zeros(n, dtype=bool)
    for i, (_name, s, q) in enumerate(records):
        ln = len(s)
        lengths[i] = ln
        seq[i, :ln] = np.frombuffer(s, dtype=np.uint8)
        if q is not None:
            qual[i, :ln] = np.frombuffer(q, dtype=np.uint8)
            has_qual[i] = True
    return PaddedReads(seq=seq, qual=qual, lengths=lengths, has_qual=has_qual)


def read_fastx_padded(path: str, max_records: Optional[int] = None) -> PaddedReads:
    return pad_records(read_fastx(path, max_records))
