"""Compact version of the reference benchmark grid (benchmark/barread.sh:
error rate x barcode count sweeps scored with evalres).

Asserts accuracy bounds rather than gold files: the reference paper's claim
is sensitivity/precision dominance at >=1% error (Figs 2-5); at 2%/5% error
with 6nt ed>=3 tags the demuxer must stay near-perfect."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDITTAG = "/root/reference/dev/EDITTAG_6nt_ed_3.txt"

requires_dev = pytest.mark.skipif(
    not os.path.exists(EDITTAG), reason="reference dev fixtures not mounted"
)


def run_tool(mod, args, cwd):
    from conftest import spawn_env

    env = spawn_env()
    res = subprocess.run(
        [sys.executable, "-m", f"tagdust_tpu.cli.{mod}", *args],
        cwd=cwd, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, f"{mod} failed: {res.stderr[-2000:]}"
    return res


@requires_dev
@pytest.mark.parametrize("err,barnum", [(0.02, 8), (0.05, 8), (0.02, 24)])
def test_accuracy_grid(tmp_path, err, barnum):
    cwd = str(tmp_path)
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", str(barnum),
         "-sim_readlen", "20", "-sim_readlen_mod", "0",
         "-sim_numseq", "5000", "-sim_endloss", "0",
         "-sim_random_frac", "0.1", "-sim_error_rate", str(err),
         "-o", "grid.fq"],
        cwd,
    )
    run_tool(
        "tagdust",
        ["-seed", "42", "grid.fq", "-arch", "grid.fq_tagdust_arch.txt",
         "-o", "gt"],
        cwd,
    )
    outs = sorted(
        f for f in os.listdir(cwd) if f.startswith("gt_") and f.endswith(".fq")
    )
    run_tool("evalres", ["-name", "tagdust", *outs, "-o", "grid_res"], cwd)
    with open(os.path.join(cwd, "grid_res_results.txt")) as fh:
        header = fh.readline().split()
        row = fh.readline().split()
    m = dict(zip(header, row))
    sens = float(m["Sensitivity"])
    prec = float(m["Precision"])
    assert sens >= 0.90, (err, barnum, m)
    assert prec >= 0.95, (err, barnum, m)
