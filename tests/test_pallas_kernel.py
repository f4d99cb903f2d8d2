"""Pallas fused kernels vs XLA scan engine: identical float32 results.

Runs in interpreter mode on the CPU backend (conftest); on TPU hardware the
same kernels compile via Mosaic."""

import numpy as np
import pytest

from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.logsum import p2sp
from tagdust_tpu.model import init_model_bag
from tagdust_tpu.stats import SequenceStats


def test_pallas_matches_xla_engine():
    jnp = pytest.importorskip("jax.numpy")
    import jax

    from tagdust_tpu.engine import pallas_kernel as PK
    from tagdust_tpu.engine.tpu import TpuEngine

    rs = build_read_structure(["B:ACGTAC,TGCATG", "R:N"])
    ssi = SequenceStats()
    ssi.average_length = 20
    ssi.max_seq_len = 32
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    eng = TpuEngine(mb)
    lat = eng.lat
    Lmap = np.asarray(eng._dev["Lmap"])
    ent_sel = np.asarray(eng._dev["ent_sel"])
    Lp, BT = 16, 8
    call, Sp, Kp, Hp = PK.make_fused_scorer(
        lat.A, lat.Uent, lat.Eent, lat.end, Lmap, ent_sel, lat.begin, Lp, BT,
        interpret=True, tmatrix=np.asarray(eng._dev["tmat"]),
    )
    rng = np.random.default_rng(0)
    B = 16
    seqs = rng.integers(0, 4, (B, Lp)).astype(np.int32)
    lens = np.full(B, 14, dtype=np.int32)
    lens[3] = 10  # ragged batch
    f_log, logpb, labels, tp = call(jnp.asarray(seqs), jnp.asarray(lens))
    ref = eng.run_batch(seqs.astype(np.uint8), lens)
    np.testing.assert_allclose(np.asarray(f_log), ref.f_score, atol=1e-5)
    bar = np.asarray(eng._dev["bar_fn"](jnp.asarray(np.asarray(tp))))
    np.testing.assert_allclose(bar, ref.bar_prob, atol=1e-5)
    labels = np.asarray(labels)
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_array_equal(
            labels[b, 1 : L + 1], ref.labels[b, 1 : L + 1]
        )


def test_pallas_long_reads_multibank_traceback():
    """Lp > 127 exercises the multi-bank label buffer in the traceback."""
    jnp = pytest.importorskip("jax.numpy")

    from tagdust_tpu.engine import pallas_kernel as PK
    from tagdust_tpu.engine.tpu import TpuEngine

    rs = build_read_structure(["B:ACGT,TGCA", "R:N"])
    ssi = SequenceStats()
    ssi.average_length = 120
    ssi.max_seq_len = 160
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    eng = TpuEngine(mb)
    lat = eng.lat
    Lp, BT = 150, 8
    call, *_ = PK.make_fused_scorer(
        lat.A, lat.Uent, lat.Eent, lat.end,
        np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
        lat.begin, Lp, BT,
        interpret=True, tmatrix=np.asarray(eng._dev["tmat"]),
    )
    rng = np.random.default_rng(3)
    B = 8
    seqs = rng.integers(0, 4, (B, Lp)).astype(np.int32)
    lens = rng.integers(100, Lp, B).astype(np.int32)
    f_log, logpb, labels, tp = call(jnp.asarray(seqs), jnp.asarray(lens))
    ref = eng.run_batch(seqs.astype(np.uint8), lens)
    np.testing.assert_allclose(np.asarray(f_log), ref.f_score, rtol=2e-4, atol=1e-3)
    labels = np.asarray(labels)
    assert labels.shape[1] == Lp + 1
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_array_equal(labels[b, 1 : L + 1], ref.labels[b, 1 : L + 1])


def test_pallas_label_dp_fast_equals_slow():
    """The structured label-DP step (diagonal columns + masked window
    reductions) must reproduce the unrolled max-plus loop exactly."""
    jnp = pytest.importorskip("jax.numpy")

    from tagdust_tpu.engine import pallas_kernel as PK
    from tagdust_tpu.engine.tpu import TpuEngine

    rs = build_read_structure(["F:NN", "B:ACGTAC,TGCATG,CCAAGG", "S:TA", "R:N"])
    ssi = SequenceStats()
    ssi.average_length = 26
    ssi.max_seq_len = 40
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    eng = TpuEngine(mb)
    lat = eng.lat
    Lp, BT = 24, 8
    kwargs = dict(interpret=True, tmatrix=np.asarray(eng._dev["tmat"]))
    args = (
        lat.A, lat.Uent, lat.Eent, lat.end,
        np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
        lat.begin, Lp, BT,
    )
    fast, *_ = PK.make_fused_scorer(*args, **kwargs)
    slow, *_ = PK.make_fused_scorer(*args, force_slow_label_dp=True, **kwargs)
    rng = np.random.default_rng(9)
    B = 16
    seqs = rng.integers(0, 4, (B, Lp)).astype(np.int32)
    lens = rng.integers(12, Lp, B).astype(np.int32)
    ff, lpf, labf, tpf = fast(jnp.asarray(seqs), jnp.asarray(lens))
    fs, lps, labs, tps = slow(jnp.asarray(seqs), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(labf), np.asarray(labs))
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fs), rtol=1e-6)


def _mk_model(segs, avg=50, mx=64, p_stats=False):
    ssi = SequenceStats()
    ssi.average_length = avg
    ssi.max_seq_len = mx
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    if p_stats:
        ssi.mean_5_len, ssi.stdev_5_len = 6.0, 1.5
        ssi.mean_3_len, ssi.stdev_3_len = 6.0, 1.5
        ssi.expected_5_len = ssi.expected_3_len = 7
    return init_model_bag(build_read_structure(segs), ssi, 0.05, 0.1)


def _barcodes(n):
    import itertools

    return ["".join(p) for p in itertools.product("ACGT", repeat=6)][7::83][:n]


def test_grouped_decomposition_reconstructs_A():
    """A == blockdiag + outer(silent exits, entry weights), to f32 exactness
    (lattice.grouped_step_decomposition — the Sp^2-cliff fast path)."""
    from tagdust_tpu.engine.lattice import (
        compile_lattice,
        grouped_step_decomposition,
    )

    for segs, p in [
        ([f"B:{','.join(_barcodes(48))}", "R:N"], False),
        (["P:GGGGGGG", f"B:{','.join(_barcodes(8))}", "R:N", "P:TTTTTTT"], True),
        (["F:NN", "B:ACGTAC,TGCATG,CCAAGG", "S:TA", "R:N"], False),
    ]:
        mb = _mk_model(segs, p_stats=p)
        lat = compile_lattice(mb)
        dec = grouped_step_decomposition(mb, lat)
        assert dec is not None
        entry = np.einsum("sj,cjt->cst", dec["Uexit"], dec["Went"])
        A2 = dec["D"] + entry.astype(np.float32)
        err = np.abs(A2 - lat.A).max()
        assert err <= 1e-8 * max(np.abs(lat.A).max(), 1.0) + 1e-12, (segs, err)
        # spans tile the state space, cut at chain boundaries, <=128 wide
        assert dec["spans"][0][0] == 0 and dec["spans"][-1][1] == lat.S
        for (a0, a1), (b0, b1) in zip(dec["spans"], dec["spans"][1:]):
            assert a1 == b0
        assert all(s1 - s0 <= 128 for s0, s1 in dec["spans"])


def test_grouped_pallas_matches_scan_48_barcodes(monkeypatch):
    """The grouped (block-banded) kernel path decides identically to the
    XLA scan engine on a 48-barcode architecture (591 states, 5 groups)."""
    from tagdust_tpu.engine.tpu import TpuEngine

    mb = _mk_model([f"B:{','.join(_barcodes(48))}", "R:N"])
    monkeypatch.setenv("TAGDUST_TPU_GROUPED", "1")
    eng = TpuEngine(mb)
    dec = eng._grouped_decomposition()
    assert dec is not None and len(dec["spans"]) == 5
    rng = np.random.default_rng(1)
    B, L = 8, 32
    seqs = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lens = np.full(B, 30, np.int32)
    lens[::3] = 24
    rg = eng.run_batch_pallas(seqs, lens)
    rs_ = eng.run_batch(seqs, lens)
    for i in range(B):
        n = int(lens[i])
        np.testing.assert_array_equal(
            rg.labels[i, 1 : n + 1].astype(np.int32),
            rs_.labels[i, 1 : n + 1].astype(np.int32),
        )
    np.testing.assert_allclose(rg.mapq, rs_.mapq, atol=1e-2)
    np.testing.assert_allclose(rg.f_score, rs_.f_score, rtol=1e-4)


def test_grouped_gate():
    """Auto mode: grouped engages only when it beats the dense tile count
    (48 barcodes yes, 20 barcodes no); env forces both ways."""
    import os

    from tagdust_tpu.engine.tpu import TpuEngine

    old = os.environ.pop("TAGDUST_TPU_GROUPED", None)
    try:
        assert TpuEngine(
            _mk_model([f"B:{','.join(_barcodes(48))}", "R:N"])
        )._grouped_decomposition() is not None
        assert TpuEngine(
            _mk_model([f"B:{','.join(_barcodes(20))}", "R:N"])
        )._grouped_decomposition() is None
        os.environ["TAGDUST_TPU_GROUPED"] = "0"
        assert TpuEngine(
            _mk_model([f"B:{','.join(_barcodes(48))}", "R:N"])
        )._grouped_decomposition() is None
    finally:
        os.environ.pop("TAGDUST_TPU_GROUPED", None)
        if old is not None:
            os.environ["TAGDUST_TPU_GROUPED"] = old


def test_backward_score_only_matches_scan():
    """The score-only backward kernel (MODE_ARCH_COMP flavor,
    VERDICT r4 item 6) must compute exactly the full backward kernel's
    logpb — same recurrence, stack spill disabled — and match the XLA
    scan recurrence it replaces in TpuEngine.backward_scores."""
    jnp = pytest.importorskip("jax.numpy")
    import functools

    import jax

    from tagdust_tpu.engine import pallas_kernel as PK
    from tagdust_tpu.engine.tpu import TpuEngine, _backward_scores

    rs = build_read_structure(["P:GGG", "B:ACGTAC,TGCATG", "R:N"])
    ssi = SequenceStats()
    ssi.average_length = 20
    ssi.max_seq_len = 32
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    mb = init_model_bag(rs, ssi, 0.05, 0.1)
    eng = TpuEngine(mb)
    lat = eng.lat
    args = (
        lat.A, lat.Uent, lat.Eent, lat.end, np.asarray(eng._dev["Lmap"]),
        np.asarray(eng._dev["ent_sel"]), lat.begin, 16, 8,
    )
    kwargs = dict(interpret=True, tmatrix=np.asarray(eng._dev["tmat"]))
    full, *_ = PK.make_fused_scorer(*args, **kwargs)
    score, *_ = PK.make_fused_scorer(*args, score_only=True, **kwargs)

    rng = np.random.default_rng(3)
    B = 16
    seqs = rng.integers(0, 4, (B, 16)).astype(np.int32)
    lens = rng.integers(8, 17, B).astype(np.int32)
    _, logpb_full, _, _ = full(jnp.asarray(seqs), jnp.asarray(lens))
    logpb_score = score(jnp.asarray(seqs), jnp.asarray(lens))
    # bit-identical: the two kernels run the same step body
    np.testing.assert_array_equal(
        np.asarray(logpb_score), np.asarray(logpb_full)
    )
    # and both match the scan recurrence (shared backward_scan numerics)
    scan = jax.jit(functools.partial(_backward_scores, eng._dev))(
        jnp.asarray(seqs), jnp.asarray(lens)
    )
    np.testing.assert_allclose(
        np.asarray(logpb_score), np.asarray(scan), atol=1e-5
    )
    # the engine-level entry point (pads to the batch tile) agrees too
    via_engine = eng.backward_scores(seqs.astype(np.uint8), lens)
    np.testing.assert_allclose(via_engine, np.asarray(scan), atol=1e-5)
