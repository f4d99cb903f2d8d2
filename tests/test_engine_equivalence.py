"""Numpy exact engine vs native C++ engine: bit-identical results.

The numpy implementation is the readable specification; the native engine is
the fast path.  Both must agree bit-for-bit on scores, bar_prob and labels.
"""

import numpy as np
import pytest

from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.engine.exact import ExactEngine
from tagdust_tpu.model import init_model_bag
from tagdust_tpu.stats import SequenceStats


def make_ssi(avg=30, mx=40):
    ssi = SequenceStats()
    ssi.average_length = avg
    ssi.max_seq_len = mx
    from tagdust_tpu.logsum import p2sp

    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    return ssi


ARCHS = [
    ["B:ACGTAC,TGCATG", "R:N"],
    ["F:NNNN", "B:ACC,GGT", "R:N"],
    ["S:TATA", "R:N"],
    ["O:N", "R:N"],
    ["G:G", "R:N"],
    ["R:N", "B:AAGG,CCTT", "R:N"],
]


@pytest.mark.parametrize("specs", ARCHS, ids=["+".join(a) for a in ARCHS])
def test_native_matches_numpy(specs):
    rs = build_read_structure(specs)
    ssi = make_ssi()
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    rng = np.random.default_rng(1)
    L = 24
    B = 8
    seqs = np.zeros((B, L + 1), dtype=np.uint8)
    seqs[:, :L] = rng.integers(0, 4, (B, L)).astype(np.uint8)

    nat = ExactEngine(mb, use_native=True)
    ref = ExactEngine(mb, use_native=False)
    if nat.flat is None:
        pytest.skip("native engine unavailable")
    a = nat.run_batch(seqs, L)
    b = ref.run_batch(seqs, L)
    np.testing.assert_array_equal(a.f_score, b.f_score)
    np.testing.assert_array_equal(a.b_score, b.b_score)
    np.testing.assert_array_equal(a.r_score, b.r_score)
    np.testing.assert_array_equal(a.bar_prob, b.bar_prob)
    np.testing.assert_array_equal(a.labels, b.labels)


def test_native_emitters_match_python():
    from tagdust_tpu.calibrate import emit_random_sequence, emit_read_sequence
    from tagdust_tpu.engine.native import FlatModel
    from tagdust_tpu.rng import CRand

    rs = build_read_structure(["B:ACGTAC,TGCATG", "R:N"])
    ssi = make_ssi()
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    flat = FlatModel(mb)

    rng = CRand()
    rng.srand(42)
    py_reads = [emit_read_sequence(mb, rng, 30) for _ in range(3)]
    py_rand = [emit_random_sequence(mb, rng, 30) for _ in range(3)]

    state = 42
    nat_reads = []
    for _ in range(3):
        state, s = flat.emit_read(state, 30)
        nat_reads.append(s)
    nat_rand = []
    for _ in range(3):
        state, s = flat.emit_random(state, 30)
        nat_rand.append(s)

    for a, b in zip(py_reads + py_rand, nat_reads + nat_rand):
        np.testing.assert_array_equal(a, b)
