"""Fallback discipline: a broken fast path must warn loudly once, and
TAGDUST_TPU_STRICT=1 must re-raise instead of downgrading (VERDICT round 1,
"silent engine downgrade")."""

import numpy as np
import pytest

import tagdust_tpu.strict as strict_mod
from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.engine import runner
from tagdust_tpu.io.fastq import Read
from tagdust_tpu.model import init_model_bag

from test_tpu_engine import make_ssi


def _mk_reads(n=8, L=24, seed=0):
    rng = np.random.default_rng(seed)
    return [Read(name=f"r{i}", seq=rng.integers(0, 4, L).astype(np.uint8))
            for i in range(n)]


@pytest.fixture()
def poisoned_pallas(monkeypatch):
    """Make every fused-Pallas call raise, as a broken Mosaic build would."""
    from tagdust_tpu.engine.tpu import TpuEngine

    def boom(self, *a, **k):
        raise RuntimeError("poisoned pallas kernel")

    monkeypatch.setattr(TpuEngine, "run_batch_pallas", boom)
    monkeypatch.setattr(strict_mod, "_warned", set())
    yield


def test_poisoned_pallas_warns_and_falls_back(poisoned_pallas, monkeypatch, capsys):
    monkeypatch.delenv("TAGDUST_TPU_STRICT", raising=False)
    rs = build_read_structure(["B:ACC,GGT", "R:N"])
    mb = init_model_bag(rs, make_ssi(), 0.05, 0.1)
    reads = _mk_reads()
    runner.score_reads(mb, reads, engine_kind="tpu")
    # fallback produced real results on the XLA engine
    assert all(r.mapq >= 0.0 for r in reads)
    err = capsys.readouterr().err
    assert "pallas-scorer" in err and "poisoned pallas kernel" in err
    # second call: warning not repeated
    runner.score_reads(mb, _mk_reads(seed=1), engine_kind="tpu")
    assert capsys.readouterr().err.count("pallas-scorer") == 0


def test_poisoned_pallas_strict_raises(poisoned_pallas, monkeypatch):
    monkeypatch.setenv("TAGDUST_TPU_STRICT", "1")
    rs = build_read_structure(["B:ACC,GGT", "R:N"])
    mb = init_model_bag(rs, make_ssi(), 0.05, 0.1)
    with pytest.raises(RuntimeError, match="poisoned pallas kernel"):
        runner.score_reads(mb, _mk_reads(), engine_kind="tpu")


def test_grouped_kernel_128_segment_bound_is_loud(monkeypatch, capsys):
    """The block-banded kernel packs one silent-exit column per segment into
    a single 128-lane tile; an architecture beyond that bound must downgrade
    to the dense step path LOUDLY, not silently pay the Sp^2 cliff
    (VERDICT round 2, item 7).  Unreachable from the CLI grammar (max 10
    segments) but pinned here against future multi-file label fusions."""
    import jax.numpy as jnp

    from tagdust_tpu.engine import pallas_kernel as PK
    from tagdust_tpu.engine.lattice import grouped_step_decomposition
    from tagdust_tpu.engine.tpu import TpuEngine

    monkeypatch.delenv("TAGDUST_TPU_STRICT", raising=False)
    monkeypatch.setattr(strict_mod, "_warned", set())

    rs = build_read_structure(["B:ACGTAC,TGCATG", "R:N"])
    mb = init_model_bag(rs, make_ssi(), 0.05, 0.1)
    eng = TpuEngine(mb)
    lat = eng.lat
    dec = grouped_step_decomposition(mb, lat)
    assert dec is not None
    fat = dict(dec)
    fat["Uexit"] = np.zeros((lat.S, 129), dtype=np.float32)  # "129 segments"

    Lp, BT = 16, 8
    call, *_ = PK.make_fused_scorer(
        lat.A, lat.Uent, lat.Eent, lat.end,
        np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
        lat.begin, Lp, BT, interpret=True,
        tmatrix=np.asarray(eng._dev["tmat"]), grouped=fat,
    )
    err = capsys.readouterr().err
    assert "grouped-step-kernel" in err and "128-segment" in err

    # the dense downgrade still scores correctly
    rng = np.random.default_rng(0)
    B = 8
    seqs = rng.integers(0, 4, (B, Lp)).astype(np.int32)
    lens = np.full(B, 12, dtype=np.int32)
    f_log, logpb, labels, tp = call(jnp.asarray(seqs), jnp.asarray(lens))
    ref = eng.run_batch(seqs.astype(np.uint8), lens)
    np.testing.assert_allclose(np.asarray(f_log), ref.f_score, atol=1e-5)

    # strict mode refuses the downgrade instead
    monkeypatch.setenv("TAGDUST_TPU_STRICT", "1")
    monkeypatch.setattr(strict_mod, "_warned", set())
    with pytest.raises(ValueError, match="128-lane"):
        PK.make_fused_scorer(
            lat.A, lat.Uent, lat.Eent, lat.end,
            np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
            lat.begin, Lp, BT, interpret=True,
            tmatrix=np.asarray(eng._dev["tmat"]), grouped=fat,
        )
