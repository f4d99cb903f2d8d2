"""Vectorised extract_batch must behave exactly like per-read extract_read.

Random label matrices (not just engine-produced ones) exercise every branch:
null-N barcode alternatives, fingerprint length mismatches, too-short R runs,
threshold rejections, matchstart/matchend offsets, qual rewriting.
"""

import copy

import numpy as np
import pytest

from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.extract import extract_batch, extract_read
from tagdust_tpu.io.fastq import Read
from tagdust_tpu.logsum import p2sp
from tagdust_tpu.model import init_model_bag
from tagdust_tpu.stats import SequenceStats


def _mb(segments):
    rs = build_read_structure(segments)
    ssi = SequenceStats()
    ssi.average_length = 30
    ssi.max_seq_len = 48
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    return rs, init_model_bag(rs, ssi, 0.05, 0.1)


def _random_reads(rng, B, Lmax, num_label_idx, with_qual=True):
    reads = []
    for i in range(B):
        L = int(rng.integers(0 if i == 0 else 5, Lmax + 1))
        r = Read(
            name=f"r{i}",
            seq=rng.integers(0, 5, L).astype(np.uint8),
            qual="".join(chr(int(c)) for c in rng.integers(33, 74, L))
            if with_qual
            else None,
        )
        r.mapq = float(rng.choice([0.0, 5.0, 15.0, 40.0, float("nan")]))
        reads.append(r)
    Lpad = Lmax + 4
    labels = rng.integers(0, num_label_idx, (B, Lpad + 1)).astype(np.int32)
    return reads, labels


@pytest.mark.parametrize(
    "segments,minlen,ms,me",
    [
        (["B:ACGTAC,TGCATG", "R:N"], 0, -1, -1),
        (["B:ACGT,TGCA", "F:NNNN", "R:N"], 3, -1, -1),
        (["F:NNNNNN", "R:N"], 5, -1, -1),
        (["R:N", "S:TATA", "R:N"], 4, -1, -1),
        (["B:ACGTAC,TGCATG", "R:N"], 2, 3, 20),
        (["P:AGGTC", "R:N"], 0, -1, -1),
    ],
)
def test_extract_batch_matches_per_read(segments, minlen, ms, me):
    rs, mb = _mb(segments)
    rng = np.random.default_rng(hash((tuple(segments), minlen, ms)) % 2**32)
    for threshold in (0.0, 10.0):
        reads, labels = _random_reads(rng, 64, 40, len(mb.label))
        ra = copy.deepcopy(reads)
        rb = copy.deepcopy(reads)
        for i, r in enumerate(ra):
            extract_read(mb, rs, r, labels[i], minlen, threshold, ms, me)
        extract_batch(mb, rs, rb, labels, minlen, threshold, ms, me)
        for i, (a, b) in enumerate(zip(ra, rb)):
            assert a.read_type == b.read_type, (i, a.read_type, b.read_type)
            assert a.barcode == b.barcode, i
            assert a.fingerprint == b.fingerprint, i
            np.testing.assert_array_equal(a.seq, b.seq, err_msg=str(i))
            assert a.qual == b.qual, i


def test_extract_batch_no_qual():
    rs, mb = _mb(["B:ACGT,TGCA", "R:N"])
    rng = np.random.default_rng(7)
    reads, labels = _random_reads(rng, 16, 24, len(mb.label), with_qual=False)
    ra = copy.deepcopy(reads)
    rb = copy.deepcopy(reads)
    for i, r in enumerate(ra):
        extract_read(mb, rs, r, labels[i], 0, 0.0)
    extract_batch(mb, rs, rb, labels, 0, 0.0)
    for a, b in zip(ra, rb):
        assert a.read_type == b.read_type
        np.testing.assert_array_equal(a.seq, b.seq)
        assert a.qual is None and b.qual is None


def test_dust_scores_batch_matches_scalar():
    from tagdust_tpu.filters import dust_score, dust_scores_batch
    from tagdust_tpu.constants import SPACER

    rng = np.random.default_rng(11)
    reads = []
    for i in range(300):
        L = int(rng.integers(0, 120))
        seq = rng.integers(0, 5, L).astype(np.uint8)
        # sprinkle spacers, sometimes a long leading run
        seq[rng.random(L) < 0.15] = SPACER
        if i % 7 == 0 and L > 3:
            seq[: int(rng.integers(1, L))] = SPACER
        if i % 11 == 0 and L > 10:
            seq[:] = 0  # poly-A: high dust score
        reads.append(Read(name=f"d{i}", seq=seq))
    batch = dust_scores_batch(reads)
    for i, r in enumerate(reads):
        expect = dust_score(r.seq, r.len)
        if np.isnan(expect):
            assert np.isnan(batch[i]), i
        else:
            np.testing.assert_allclose(batch[i], expect, atol=1e-9, err_msg=str(i))


def test_batched_artifact_filter_matches_scalar():
    from tagdust_tpu.constants import EXTRACT_SUCCESS, SPACER
    from tagdust_tpu.filters import (
        _bmp_single,
        match_to_reference,
        reverse_complement,
    )

    rng = np.random.default_rng(23)
    contaminants = [
        rng.integers(0, 4, int(rng.integers(10, 200))).astype(np.uint8)
        for _ in range(4)
    ]
    reads = []
    for i in range(200):
        L = int(rng.integers(1, 90))
        seq = rng.integers(0, 5, L).astype(np.uint8)
        seq[rng.random(L) < 0.2] = SPACER  # extracted reads carry spacers
        if i % 9 == 0:  # plant near-exact contaminant substrings
            c = contaminants[i % 4]
            take = min(L, c.shape[0])
            seq[:take] = c[:take]
        r = Read(name=f"a{i}", seq=seq)
        r.read_type = EXTRACT_SUCCESS
        reads.append(r)

    import copy

    ra = copy.deepcopy(reads)
    rb = copy.deepcopy(reads)
    # scalar reference loop (the pre-batch implementation)
    for r in ra:
        best, best_id = 100000, 0
        for j, ref in enumerate(contaminants):
            for pat in (r.seq, reverse_complement(r.seq)):
                d = _bmp_single(ref, pat, ref.shape[0], r.len)
                if d < best:
                    best, best_id = d, j + 1
        if best <= 2 and r.read_type == EXTRACT_SUCCESS:
            from tagdust_tpu.constants import EXTRACT_FAIL_MATCHES_ARTIFACTS
            r.read_type = (best_id << 8) | EXTRACT_FAIL_MATCHES_ARTIFACTS
    match_to_reference(rb, contaminants, 2)
    n_marked = 0
    for i, (a, b) in enumerate(zip(ra, rb)):
        assert a.read_type == b.read_type, (i, a.read_type, b.read_type)
        n_marked += a.read_type != EXTRACT_SUCCESS
    assert n_marked > 5  # the planted contaminants were caught


def test_device_myers_matches_host():
    """bpm_batch_device (uint32-pair lanes, lax.scan over the shared text)
    == the host uint64 batched kernel across pattern lengths 1..63."""
    import pytest

    pytest.importorskip("jax")
    from tagdust_tpu.constants import SPACER
    from tagdust_tpu.engine.myers_tpu import bpm_batch_device
    from tagdust_tpu.filters import _bpm_batch, _pattern_masks

    rng = np.random.default_rng(31)
    B = 97
    W = 63
    pats = np.full((B, W), SPACER, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i in range(B):
        L = int(rng.integers(1, 64))
        lens[i] = L
        row = rng.integers(0, 5, L).astype(np.uint8)
        row[rng.random(L) < 0.15] = SPACER
        pats[i, :L] = row
    B4 = _pattern_masks(pats, lens)
    for tl in (7, 64, 150):
        text = rng.integers(0, 4, tl).astype(np.uint8)
        host = _bpm_batch(text, B4, lens)
        dev = bpm_batch_device(text, B4, lens)
        np.testing.assert_array_equal(host, dev, err_msg=f"text len {tl}")


def test_threshold_f32_ceil_equivalence():
    """Device compare (q_f32 >= ceil32(thr)) must equal the host compare
    (thr_f64 <= float64(q_f32)) for every representable q — the decided
    pipeline's pass/fail gate rests on this."""
    import numpy as np

    from tagdust_tpu.engine.tpu import TpuEngine

    rng = np.random.default_rng(0)
    for _ in range(20000):
        thr = float(rng.uniform(0, 5))
        t32 = TpuEngine.threshold_f32_ceil(thr)
        m = np.float32(rng.uniform(0, 5))
        assert (thr <= float(np.float64(m))) == bool(m >= t32), (thr, m)
    # boundary: threshold not representable in f32, q at the neighbors
    thr = 2.636365
    t32 = TpuEngine.threshold_f32_ceil(thr)
    for m in (
        np.float32(thr),
        np.nextafter(np.float32(thr), np.float32(-1)),
        np.nextafter(np.float32(thr), np.float32(10)),
    ):
        assert (thr <= float(np.float64(m))) == bool(m >= t32), m
    # NaN q fails both ways
    assert not (thr <= float("nan"))
    assert not bool(np.float32("nan") >= t32)
