"""Unit tests for the numerics substrate and small components."""

import numpy as np
import pytest

from tagdust_tpu.arch import (
    assign_segment_sequences,
    build_read_structure,
    parse_arch_line,
    qc_read_structure,
)
from tagdust_tpu.constants import NUC_CODE
from tagdust_tpu.filters import bpm_check_error_global, dust_score
from tagdust_tpu.logsum import LOGSUM_TABLE, NEG_INF, logsum, p2sp, sp2p
from tagdust_tpu.namecheck import compare_read_names, reset_detection
from tagdust_tpu.rng import CRand


def test_logsum_basics():
    # identity with -inf
    assert logsum(NEG_INF, np.float32(-3.0)) == np.float32(-3.0)
    assert np.isneginf(logsum(NEG_INF, NEG_INF))
    # far apart -> max
    assert logsum(np.float32(0.0), np.float32(-20.0)) == np.float32(0.0)
    # table value
    v = logsum(np.float32(0.0), np.float32(0.0))
    assert abs(float(v) - np.log(2.0)) < 1e-3


def test_logsum_table_matches_c_formula():
    import math

    for i in (0, 1, 100, 15999):
        assert LOGSUM_TABLE[i] == np.float32(math.log(1.0 + math.exp(-i / 1000.0)))


def test_p2sp_roundtrip():
    assert np.isneginf(p2sp(0.0))
    assert sp2p(NEG_INF) == 0.0
    assert abs(float(sp2p(p2sp(0.25))) - 0.25) < 1e-6


def test_crand_sequence():
    # reference LCG with seed 42 (misc.c:878-887)
    r = CRand()
    r.srand(42)
    vals = [r.rand() for _ in range(4)]
    # recompute by hand
    s = 42
    expect = []
    for _ in range(4):
        s = (s * 1103515245 + 12345) & 0xFFFFFFFF
        expect.append((s // 65536) % 32768)
    assert vals == expect


def test_nuc_code():
    assert [int(NUC_CODE[ord(c)]) for c in "ACGTUacgtu.X"] == [
        0, 1, 2, 3, 3, 0, 1, 2, 3, 3, 5, 4,
    ]


def test_segment_parsing():
    t, alts = assign_segment_sequences("B:AC,GG")
    assert t == "B" and alts == ["AC", "GG", "NN"]  # null-N appended
    t, alts = assign_segment_sequences("S:TATA")
    assert alts == ["TATA", "NNNN"]
    t, alts = assign_segment_sequences("R:N")
    assert alts == ["N"]
    t, alts = assign_segment_sequences("F:NNNN")
    assert alts == ["NNNN"]
    with pytest.raises(ValueError):
        assign_segment_sequences("X:AA")


def test_qc_rejects_unequal_lengths():
    rs = build_read_structure(["B:AC,GGG"])
    with pytest.raises(ValueError):
        qc_read_structure(rs)


def test_arch_line_parse():
    line = "tagdust -1 B:TTGGCA,AAAAAA -2 R:N in.fq -o out.fq\n"
    assert parse_arch_line(line) == ["B:TTGGCA,AAAAAA", "R:N"]
    assert parse_arch_line("no options here") == []


def test_dust_score_low_complexity():
    seq = np.zeros(64, dtype=np.uint8)  # poly-A
    assert dust_score(seq, 64) > 100
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 64).astype(np.uint8)
    assert dust_score(seq, 64) < 100


def test_bpm_global_identical():
    a = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    assert bpm_check_error_global(a, a, 8, 8) == 0
    b = a.copy()
    b[3] = 0
    assert bpm_check_error_global(a, b, 8, 8) == 1


def test_name_check_generic_and_casava():
    reset_detection()
    assert compare_read_names("READ1;SEQ:AAA", "READ1;SEQ:TTT") == 0
    assert compare_read_names("READ1;SEQ:AAA", "READ2;SEQ:AAA") == 1
    reset_detection()
    n1 = "EAS139:136:FC706VJ:2:2104:15343:197393 1:Y:18:ATCACG"
    n2 = "EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG"
    assert compare_read_names(n1, n2) == 0
    n3 = "EAS139:136:FC706VJ:2:2104:15343:197394 2:Y:18:ATCACG"
    assert compare_read_names(n1, n3) == 1
    reset_detection()


def test_native_fastq_codec_equivalence(tmp_path):
    import os
    import random

    from tagdust_tpu.io.fastq import SeqReader

    random.seed(9)
    p = str(tmp_path / "x.fq")
    with open(p, "w") as f:
        for i in range(5000):
            L = random.randint(5, 80)
            seq = "".join(random.choice("ACGTN") for _ in range(L))
            f.write(f"@r{i} extra info\n{seq}\n+\n{'I' * L}\n")
    outs = []
    for fast in (False, True):
        r = SeqReader(p, fast=fast)
        reads = []
        while True:
            c = r.read_chunk(777)  # force chunk boundaries
            if not c:
                break
            reads.extend(c)
        r.close()
        outs.append(reads)
    a, b = outs
    assert len(a) == len(b) == 5000
    for x, y in zip(a, b):
        assert x.name == y.name and x.qual == y.qual
        assert np.array_equal(x.seq, y.seq)


def test_name_check_reference_utest_cases():
    """The full reference tagdustiotest matrix (io.c:2398-2572): CASAVA 1.8,
    CASAVA <1.7 (#0/1), cross-format, and coordinate mismatches."""
    cases = [
        ("EAS139:136:FC706VJ:2:2104:15343:197393 1:Y:18:ATCACG",
         "EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG", 0),
        ("EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG",
         "EAS139:136:FC706VJ:2:2104:15343:197393 1:Y:18:ATCACG", 0),
        ("HWUSI-EAS100R:6:73:941:1973#0/1",
         "HWUSI-EAS100R:6:73:941:1973#0/2", 0),
        ("HWUSI-EAS100R:6:73:941:1973#0/2",
         "HWUSI-EAS100R:6:73:941:1973#0/1", 0),
        ("EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG",
         "HWUSI-EAS100R:6:73:941:1973#0/1", 1),
        ("EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG",
         "EAS139:136:FC706VJ:2:2104:15343:197393 1:N:18:GGGACG", 0),
        ("EAS139:136:FC706VJ:2:2104:15343:197393 2:Y:18:ATCACG",
         "EAS139:136:FC706VJ:2:2104:15344:197393 1:N:18:GGGACG", 1),
        ("HWUSI-EAS747_0040_FC64GRTAAXX:8:1:3268:1065#0/1",
         "HWUSI-EAS747_0040_FC64GRTAAXX:8:1:3268:1065#0/2", 0),
    ]
    for n1, n2, want in cases:
        reset_detection()
        assert compare_read_names(n1, n2) == want, (n1, n2, want)


def test_batched_emitters_match_single_calls():
    """emit_read_batch / emit_random_batch reproduce the single-call
    emitters draw-for-draw (same LCG stream, same sequences), including
    the entry-state retry path for reads longer than the slab row."""
    import numpy as np

    from tagdust_tpu.arch import read_structure_from_params
    from tagdust_tpu.engine.native import FlatModel
    from tagdust_tpu.logsum import p2sp
    from tagdust_tpu.model import init_model_bag
    from tagdust_tpu.stats import SequenceStats

    rs = read_structure_from_params(["B:ACGTAC,TGCATG", "R:N"] + [None] * 8)
    ssi = SequenceStats()
    ssi.average_length = 30
    ssi.max_seq_len = 64
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    flat = FlatModel(mb)

    n = 500
    state0 = 42
    # single-call reference stream
    st = state0
    singles = []
    for _ in range(n):
        st, seq = flat.emit_read(st, 30)
        singles.append(seq)
    st_single_mid = st
    singles_r = []
    for _ in range(n):
        st, seq = flat.emit_random(st, 30)
        singles_r.append(seq)
    st_single_end = st

    st2, batch = flat.emit_read_batch(state0, 30, n)
    assert st2 == st_single_mid
    st3, batch_r = flat.emit_random_batch(st2, 30, n)
    assert st3 == st_single_end
    for a, b in zip(singles + singles_r, batch + batch_r):
        assert np.array_equal(a, b)

    # force the truncation-retry path: tiny slab rows via a tiny avg_len
    # ceiling is not reachable from the public API, so shrink the slab cap
    # by monkeypatching _emit_batch's cap through a small avg_len while
    # keeping the geometric tail likely to exceed it
    st4, short = flat.emit_random_batch(state0, 16, 200)
    st5 = state0
    for k in range(200):
        st5, seq = flat.emit_random(st5, 16)
        assert np.array_equal(seq, short[k])
    assert st4 == st5
