"""Opt-in TPU-hardware gold run (VERDICT round 2, item 2).

The normal suite runs on the virtual CPU mesh (conftest pins
JAX_PLATFORMS=cpu); this wrapper is skipped there and only runs when
``TAGDUST_TPU_HW=1`` is set on a rig with the physical chip attached.  It
drives ``scripts/gold_tpu_hw.py`` — the dev/bar_read gold scenarios through
the REAL fused Pallas pipeline (no ``TAGDUST_TPU_PALLAS=0``) — and asserts
the committed-artifact invariants: gold metrics TSV, exact decision
identity vs the bit-exact engine, and the two-part decision-margin audit:
max |dQ| pallas-vs-exact < 0.15 on barread1 (no P linkers, so the exact
engine's table-logsum error is negligible), and max |dQ| pallas-vs-scan
< 0.6 on both scenarios (isolates kernel formulation from the known
table-logsum effect, which dominates pallas-vs-exact on barread2).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("TAGDUST_TPU_HW") != "1",
    reason="opt-in: set TAGDUST_TPU_HW=1 on a rig with the TPU attached",
)


def test_gold_scenarios_on_tpu_hw(tmp_path):
    env = dict(os.environ)
    # undo the conftest CPU pinning so the child claims the real chip (the
    # axon sitecustomize re-pins JAX_PLATFORMS when unset)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = tmp_path / "gold_tpu_hw.json"
    env["GOLD_OUT"] = str(out)
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "gold_tpu_hw.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    data = json.loads(out.read_text())
    assert "tpu" in data["platform"].lower() or "axon" in data["platform"].lower()
    for sc in ("barread1", "barread2", "barread3", "barread4"):
        assert data[sc]["gold_tsv"] == "match"
        assert data[sc]["max_abs_dQ_pallas_vs_scan"] < 0.6
        assert data[sc]["reads_compared"] > 8000
    assert data["barread1"]["max_abs_dQ_pallas_vs_exact"] < 0.15
    cas = data["casava_style"]
    assert cas["decision_identity"] == "exact == pallas == xla-scan"
    assert cas["reads_compared"] > 2500
