"""Edge-case I/O and extraction behavior pinned down by round-1 review:

* native C++ FASTQ codec vs Python line-state parser on malformed input;
* SAM chunked reading across record boundaries;
* sequence-stats pre-pass on reads shorter than a P linker (the C code
  reads out of bounds there; ours defines the compare as a mismatch);
* fingerprint extraction when an F label lands past the read end (also OOB
  in the C code): per-read and batch paths must agree bit-for-bit.
"""

import gzip

import numpy as np
import pytest

from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.io.fastq import Read, SeqReader
from tagdust_tpu.model import init_model_bag
from tagdust_tpu.stats import get_sequence_stats

from test_tpu_engine import make_ssi


def _write(tmp_path, name, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def _parse_both(path):
    """Returns (records|SystemExit, records|SystemExit) for python/native."""
    out = []
    for fast in (False, True):
        rd = SeqReader(path, fast=fast)
        try:
            recs = []
            while True:
                chunk = rd.read_chunk(100)
                if not chunk:
                    break
                recs.extend(chunk)
            out.append([(r.name, r.seq.tobytes(), r.qual) for r in recs])
        except SystemExit:
            out.append(SystemExit)
        finally:
            rd.close()
    return out


def test_native_codec_wellformed_equivalence(tmp_path):
    data = b"@r1 desc here\nACGT\n+\nIIII\n@r2\nGGTTAA\n+anything\nJJJJJJ\n"
    path = _write(tmp_path, "ok.fq", data)
    py, nat = _parse_both(path)
    assert py == nat and len(py) == 2


@pytest.mark.parametrize(
    "name,data",
    [
        # quality line shorter than the sequence: both parsers must abort
        # with the reference's error (io.c:1752 semantics)
        ("qual_short.fq", b"@r1\nACGT\n+\nII\n"),
        ("qual_long.fq", b"@r1\nACGT\n+\nIIIIII\n"),
    ],
)
def test_native_codec_malformed_errors_match(tmp_path, name, data):
    path = _write(tmp_path, name, data)
    py, nat = _parse_both(path)
    assert py is SystemExit and nat is SystemExit


@pytest.mark.parametrize(
    "name,data",
    [
        # truncated final record: no quality line at EOF
        ("trunc_noqual.fq", b"@r1\nACGT\n+\nIIII\n@r2\nACGTGT\n+\n"),
        # truncated after header
        ("trunc_hdr.fq", b"@r1\nACGT\n+\nIIII\n@r2\n"),
        # blank line between records
        ("blank.fq", b"@r1\nACGT\n+\nIIII\n\n@r2\nGG\n+\nII\n"),
    ],
)
def test_native_codec_truncated_equivalence(tmp_path, name, data):
    py, nat = _parse_both(_write(tmp_path, name, data))
    assert py == nat


def test_native_codec_gzip_chunked(tmp_path):
    recs = b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, b"ACGT" * (1 + i % 5), b"I" * 4 * (1 + i % 5))
        for i in range(257)
    )
    path = tmp_path / "many.fq.gz"
    path.write_bytes(gzip.compress(recs))
    rd = SeqReader(str(path), fast=True)
    a = rd.read_chunk(100)
    b = rd.read_chunk(100)
    c = rd.read_chunk(100)
    d = rd.read_chunk(100)
    rd.close()
    assert [len(a), len(b), len(c), len(d)] == [100, 100, 57, 0]
    assert a[0].name == "r0" and c[-1].name == "r256"


def test_sam_chunk_boundaries(tmp_path):
    rows = []
    for i in range(10):
        seq = "ACGT" * (1 + i % 3)
        rows.append(
            f"r{i}\t{0 if i % 2 else 256}\t*\t0\t{i}\t*\t*\t0\t0\t{seq}\t{'I' * len(seq)}"
        )
    data = ("@HD\tVN:1.6\n" + "\n".join(rows) + "\n").encode()
    path = _write(tmp_path, "t.sam", data)

    rd = SeqReader(path)
    whole = rd.read_chunk(100)
    rd.close()
    rd = SeqReader(path)
    parts = []
    while True:
        c = rd.read_chunk(3)
        if not c:
            break
        parts.extend(c)
    rd.close()
    # flag & 768 filtering drops the 0x100 rows in both paths
    assert [r.name for r in whole] == [f"r{i}" for i in range(10) if i % 2]
    assert [(r.name, r.seq.tobytes(), r.qual) for r in whole] == [
        (r.name, r.seq.tobytes(), r.qual) for r in parts
    ]


def test_sam_filter_flag_override(tmp_path):
    """-filter replaces the default 768 exclusion mask (io.c:469-562)."""
    rows = [
        "keep\t0\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",
        "sec\t256\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",  # 0x100 secondary
        "dup\t1024\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",  # 0x400 duplicate
    ]
    path = _write(tmp_path, "f.sam", ("\n".join(rows) + "\n").encode())

    def names(sam_filter=None):
        rd = SeqReader(path, sam_filter=sam_filter)
        out = [r.name for r in rd.read_chunk(100)]
        rd.close()
        return out

    assert names() == ["keep", "dup"]  # default 768 keeps duplicates
    assert names("1024") == ["keep", "sec"]  # filter only duplicates
    assert names("0x400") == ["keep", "sec"]  # samtools-style hex accepted


def test_stats_reads_shorter_than_P_linker(tmp_path):
    # 12nt 5' linker, 4nt reads: every suffix compare would run past the
    # read end in the C code; here it is a defined mismatch -> no samples
    data = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(20))
    path = _write(tmp_path, "short.fq", data)
    rs = build_read_structure(["P:AGGGAGGACGAT", "R:N"])
    ssi = get_sequence_stats(path, rs, 1000, -1, -1)
    # no exact-match samples -> falls back to the expected length, stdev 1
    assert ssi.mean_5_len == 12.0 and ssi.stdev_5_len == 1.0


def test_fingerprint_past_read_end_paths_agree():
    """-end beyond the read: F positions past the real length contribute 0
    bits, identically in extract_read and extract_batch."""
    from tagdust_tpu.extract import extract_batch, extract_read

    rs = build_read_structure(["R:N", "F:NNNN"])
    mb = init_model_bag(rs, make_ssi(avg=8, mx=16), 0.05, 0.1)

    # find label indices for R and F
    lab = np.asarray(mb.label)
    seg = lab & 0xFFFF
    r_lab = int(np.nonzero(seg == 0)[0][0])
    f_lab = int(np.nonzero(seg == 1)[0][0])

    L = 10  # decoded window via matchstart=0, matchend=10
    labels = np.zeros(L + 1, dtype=np.int32)
    labels[1:7] = r_lab
    labels[7:11] = f_lab  # last two F positions fall past the 8nt read

    def mk():
        r = Read(name="x", seq=np.arange(8, dtype=np.uint8) % 4, qual="I" * 8)
        r.mapq = 30.0
        return r

    r1 = mk()
    extract_read(mb, rs, r1, labels, 1, 0.0, 0, L)
    r2 = mk()
    extract_batch(mb, rs, [r2], labels[None, :], 1, 0.0, 0, L)
    assert r1.read_type == r2.read_type
    assert r1.fingerprint == r2.fingerprint
    # F hits j=6,7 (bases 2,3) then two past-end positions (0 bits each)
    assert (r1.fingerprint >> 8) == ((2 << 6) | (3 << 4))
