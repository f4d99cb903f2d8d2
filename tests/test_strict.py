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
