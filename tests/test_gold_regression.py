"""End-to-end golden regression tests.

Replicates dev/bar_read_test.sh (reference): simreads -> tagdust -> evalres
with seed 42 in RTEST mode, comparing the resulting metrics TSV against the
dev/ gold files.  All three tools are this framework's implementations; the
gold numbers were produced by the reference C build, so passing these tests
means end-to-end behavioural identity.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEV = "/root/reference/dev"
EDITTAG = os.path.join(DEV, "EDITTAG_6nt_ed_4.txt")

GOLD_BARREAD1 = (
    "tagdust\t1.0000\t0.9542\t0.9947\t0.9739\t0.0000\t"
    "8951.00\t48.00\t0.00\t1001.00"
)
GOLD_BARREAD2 = (
    "tagdust\t1.0000\t0.9775\t0.9974\t0.9874\t0.0013\t"
    "8976.00\t23.00\t0.00\t1001.00"
)
GOLD_PAIRED = (
    "tagdust\t1.0000\t0.9775\t0.9974\t0.9874\t0.0013\t"
    "8976.00\t23.00\t0.00\t1001.00"
)
GOLD_READ_PAIRED = (
    "tagdust\t1.0000\t1.0000\t1.0000\t1.0000\t0.0017\t"
    "8999.00\t0.00\t0.00\t1001.00"
)


def run_tool(tool, args, cwd):
    from conftest import spawn_env

    env = spawn_env()
    res = subprocess.run(
        [sys.executable, "-m", f"tagdust_tpu.cli.{tool}"] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, f"{tool} failed: {res.stderr[-2000:]}"
    return res


def read_results(path):
    with open(path) as fh:
        return fh.read().strip().splitlines()[1]


def simreads(cwd, out, barnum, extra=()):
    run_tool(
        "simreads",
        [
            EDITTAG,
            "-seed",
            "42",
            "-sim_barnum",
            str(barnum),
            *extra,
            "-sim_readlen",
            "20",
            "-sim_readlen_mod",
            "0",
            "-sim_numseq",
            "10000",
            "-sim_endloss",
            "0",
            "-sim_random_frac",
            "0.1" if barnum or extra else "0.1",
            "-o",
            out,
            "-sim_error_rate",
            "0.02",
        ],
        cwd,
    )


requires_dev = pytest.mark.skipif(
    not os.path.exists(EDITTAG), reason="reference dev fixtures not mounted"
)


@requires_dev
def test_barread1_gold(tmp_path):
    cwd = str(tmp_path)
    simreads(cwd, "barread1.fq", 4)
    run_tool(
        "tagdust",
        ["-seed", "42", "barread1.fq", "-arch", "barread1.fq_tagdust_arch.txt", "-o", "bt"],
        cwd,
    )
    outs = sorted(
        f for f in os.listdir(cwd) if f.startswith("bt_") and f.endswith(".fq")
    )
    run_tool("evalres", ["-name", "tagdust", *outs, "-o", "bt"], cwd)
    assert read_results(os.path.join(cwd, "bt_results.txt")) == GOLD_BARREAD1


@requires_dev
def test_barread2_gold(tmp_path):
    cwd = str(tmp_path)
    simreads(cwd, "barread2.fq", 4, extra=("-sim_5seq", "GGGGGGG", "-sim_3seq", "TTTTTTT"))
    run_tool(
        "tagdust",
        ["-seed", "42", "barread2.fq", "-arch", "barread2.fq_tagdust_arch.txt", "-o", "bt"],
        cwd,
    )
    outs = sorted(
        f for f in os.listdir(cwd) if f.startswith("bt_") and f.endswith(".fq")
    )
    run_tool("evalres", ["-name", "tagdust", *outs, "-o", "bt"], cwd)
    assert read_results(os.path.join(cwd, "bt_results.txt")) == GOLD_BARREAD2


@requires_dev
def test_paired_no_barcode_gold(tmp_path):
    cwd = str(tmp_path)
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "0", "-sim_5seq", "GGGGGGG",
         "-sim_3seq", "TTTTTTT", "-sim_readlen", "20", "-sim_readlen_mod", "0",
         "-sim_numseq", "10000", "-sim_endloss", "0", "-sim_random_frac", "0.1",
         "-o", "r1.fq", "-sim_error_rate", "0.02"],
        cwd,
    )
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "0", "-sim_readlen", "20",
         "-sim_readlen_mod", "0", "-sim_numseq", "10000", "-sim_endloss", "0",
         "-sim_random_frac", "0.00", "-o", "r2.fq", "-sim_error_rate", "0.02"],
        cwd,
    )
    with open(os.path.join(cwd, "combo.txt"), "w") as fh:
        for p in ("r1.fq_tagdust_arch.txt", "r2.fq_tagdust_arch.txt"):
            fh.write(open(os.path.join(cwd, p)).read())
    run_tool(
        "tagdust",
        ["-seed", "42", "-sim_numseq", "1", "r1.fq", "r2.fq", "-arch",
         "combo.txt", "-o", "pt"],
        cwd,
    )
    outs = sorted(
        f
        for f in os.listdir(cwd)
        if f.startswith("pt_") and f.endswith("READ1.fq")
    )
    run_tool("evalres", ["-name", "tagdust", *outs, "-o", "pt"], cwd)
    assert read_results(os.path.join(cwd, "pt_results.txt")) == GOLD_READ_PAIRED


@requires_dev
def test_paired_barcode_gold(tmp_path):
    cwd = str(tmp_path)
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "4", "-sim_5seq", "GGGGGGG",
         "-sim_3seq", "TTTTTTT", "-sim_readlen", "20", "-sim_readlen_mod", "0",
         "-sim_numseq", "10000", "-sim_endloss", "0", "-sim_random_frac", "0.1",
         "-o", "r1.fq", "-sim_error_rate", "0.02"],
        cwd,
    )
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "0", "-sim_readlen", "20",
         "-sim_readlen_mod", "0", "-sim_numseq", "10000", "-sim_endloss", "0",
         "-sim_random_frac", "0.00", "-o", "r2.fq", "-sim_error_rate", "0.02"],
        cwd,
    )
    with open(os.path.join(cwd, "combo.txt"), "w") as fh:
        for p in ("r1.fq_tagdust_arch.txt", "r2.fq_tagdust_arch.txt"):
            fh.write(open(os.path.join(cwd, p)).read())
    run_tool(
        "tagdust",
        ["-seed", "42", "-sim_numseq", "1", "r1.fq", "r2.fq", "-arch",
         "combo.txt", "-o", "pt"],
        cwd,
    )
    outs = sorted(
        f
        for f in os.listdir(cwd)
        if f.startswith("pt_") and f.endswith("READ1.fq")
    )
    run_tool("evalres", ["-name", "tagdust", *outs, "-o", "pt"], cwd)
    assert read_results(os.path.join(cwd, "pt_results.txt")) == GOLD_PAIRED
