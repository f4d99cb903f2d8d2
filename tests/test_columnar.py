"""Columnar ReadBatch path: equivalence with the per-read-object path.

The production pipeline carries whole chunks as flat arrays
(`tagdust_tpu.io.batch.ReadBatch`); these tests pin that the columnar parse,
stats, extraction and writer produce the same observable results as the
per-read `Read` path (which the gold tests validate against the reference C
build)."""

import gzip
import os

import numpy as np
import pytest

from tagdust_tpu.io.batch import ReadBatch, padded_matrix
from tagdust_tpu.io.fastq import Read, SeqReader


def _mkfq(tmp_path, records, name="t.fq"):
    p = tmp_path / name
    with open(p, "w") as fh:
        for nm, seq, qual in records:
            fh.write(f"@{nm}\n{seq}\n+\n{qual}\n")
    return str(p)


def _assert_batch_equals_reads(batch, reads):
    assert batch.B == len(reads)
    for i, r in enumerate(reads):
        assert batch.name(i) == r.name
        assert np.array_equal(batch.seq(i), r.seq)
        assert batch.qual(i) == r.qual


def test_columnar_parse_matches_read_path(tmp_path):
    recs = [
        ("r1 first", "ACGTNACGT", "IIIIIIIII"),
        ("r2;meta", "TTTT", "!!!!"),
        ("r3", "A", "J"),
        ("r4", "", ""),
        ("r5", "GGGGCCCCAAAATTTT", "IIIIJJJJKKKKLLLL"),
    ]
    p = _mkfq(tmp_path, recs)
    batch = SeqReader(p).read_chunk_batch(100)
    reads = SeqReader(p, fast=False).read_chunk(100)
    _assert_batch_equals_reads(batch, reads)


def test_columnar_parse_chunk_boundaries(tmp_path):
    recs = [(f"read{i}", "ACGT" * (1 + i % 7), "IIII" * (1 + i % 7))
            for i in range(997)]
    p = _mkfq(tmp_path, recs)
    rb_reader = SeqReader(p)
    obj_reader = SeqReader(p, fast=False)
    total = 0
    while True:
        batch = rb_reader.read_chunk_batch(100)
        reads = obj_reader.read_chunk(100)
        assert batch.B == len(reads)
        if batch.B == 0:
            break
        _assert_batch_equals_reads(batch, reads)
        total += batch.B
    assert total == 997


def test_columnar_parse_small_buffer_windows(tmp_path):
    """Tiny parser windows force arena growth + multi-window accumulation."""
    recs = [(f"n{i}", "ACGTACGTACGT", "IIIIIIIIIIII") for i in range(200)]
    p = _mkfq(tmp_path, recs)
    r = SeqReader(p)
    assert r._fast is not None
    r._fast.bufsize = 64  # pathological window
    batch = r.read_chunk_batch(1000)
    reads = SeqReader(p, fast=False).read_chunk(1000)
    _assert_batch_equals_reads(batch, reads)


def test_columnar_parse_fasta_and_gz(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">r1 desc here\nACGTN\n>r2\nTTTTGG\n")
    batch = SeqReader(str(fa)).read_chunk_batch(10)
    reads = SeqReader(str(fa), fast=False).read_chunk(10)
    _assert_batch_equals_reads(batch, reads)
    assert batch.qual(0) is None

    gz = tmp_path / "y.fq.gz"
    with gzip.open(gz, "wt") as fh:
        for i in range(50):
            fh.write(f"@g{i}\nACGTACG\n+\nIIIIIII\n")
    batch = SeqReader(str(gz)).read_chunk_batch(100)
    reads = SeqReader(str(gz), fast=False).read_chunk(100)
    _assert_batch_equals_reads(batch, reads)


def test_columnar_qual_mismatch_fails(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_text("@r1\nACGT\n+\nII\n")
    with pytest.raises(SystemExit):
        SeqReader(str(p)).read_chunk_batch(10)


def test_from_reads_roundtrip():
    reads = [
        Read(name="a", seq=np.array([0, 1, 2], np.uint8), qual="III"),
        Read(name="b no qual", seq=np.array([3, 4], np.uint8), qual=None),
        Read(name="", seq=np.zeros(0, np.uint8), qual=None),
    ]
    reads[0].mapq = 37.5
    reads[0].read_type = 1
    rb = ReadBatch.from_reads(reads)
    _assert_batch_equals_reads(rb, reads)
    assert rb.mapq[0] == 37.5 and rb.read_type[0] == 1
    back = rb.to_reads()
    for r1, r2 in zip(back, reads):
        assert r1.name == r2.name and r1.qual == r2.qual
        assert np.array_equal(r1.seq, r2.seq)


def test_padded_matrix():
    arena = np.arange(10, dtype=np.uint8)
    off = np.array([0, 3, 3, 10], dtype=np.int64)
    lens = np.diff(off)
    m = padded_matrix(arena, off, lens, 4, fill=255)
    assert m.tolist() == [
        [0, 1, 2, 255],
        [255, 255, 255, 255],
        [3, 4, 5, 6],
    ]


def test_columnar_stats_matches_read_path(tmp_path):
    """Stats consume the columnar reader; equality vs a hand-rolled
    Read-object accumulation on a P-segment architecture."""
    from tagdust_tpu.arch import build_read_structure, qc_read_structure
    from tagdust_tpu.stats import get_sequence_stats

    rng = np.random.default_rng(7)
    linker5 = "AGGGAGGACGATGCGG"
    linker3 = "GTGTCAGTCACTTCCAGCGG"
    recs = []
    for i in range(500):
        mid = "".join("ACGT"[c] for c in rng.integers(0, 4, 30))
        s = linker5[-int(rng.integers(0, 10)):] if i % 3 else ""
        e = linker3[: int(rng.integers(0, 12))] if i % 2 else ""
        seq = (s + mid + e) or "A"
        recs.append((f"r{i}", seq, "I" * len(seq)))
    p = _mkfq(tmp_path, recs)
    rs = build_read_structure([f"P:{linker5}", "R:N", f"P:{linker3}"])
    qc_read_structure(rs)
    st_fast = get_sequence_stats(p, rs, 1000001)
    os.environ["TAGDUST_TPU_FAST_IO"] = "0"
    try:
        st_slow = get_sequence_stats(p, rs, 1000001)
    finally:
        os.environ.pop("TAGDUST_TPU_FAST_IO")
    assert st_fast == st_slow
