"""DUST + artifact filter end-to-end regression (synthetic fixtures).

Expected MD5s come from runs verified byte-identical against the reference
C build (tagdust_rtest -seed 42 -ref) on the same inputs: a pure R:N
architecture where the filters operate on raw reads (contaminant hits get
the contaminant id encoded in read_type and are routed to the un-file;
low-complexity reads are DUST-flagged)."""

import hashlib
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONTAM = ">adapter1\nACGTACGTACGTACGTACGT\n>polyA\nAAAAAAAAAAAAAAAAAAAA\n"

EXPECTED = {
    "out.fq": "355583a027edee7c55af59439947bb45",
    "out_un.fq": "f60094542b4c1c24401c151d45ed3fed",
}


def _make_inputs(cwd: str) -> None:
    with open(os.path.join(cwd, "contam.fa"), "w") as fh:
        fh.write(CONTAM)
    with open(os.path.join(cwd, "arch.txt"), "w") as fh:
        fh.write("tagdust -1 R:N in.fq -o out.fq\n")
    random.seed(6)
    with open(os.path.join(cwd, "in.fq"), "w") as fh:
        for i in range(1000):
            if i % 7 == 0:
                read = "ACGTACGTACGTACGTACGT"
            else:
                read = "".join(random.choice("ACGT") for _ in range(20))
            fh.write(f"@READ{i}\n{read}\n+\n{'I' * len(read)}\n")


def _run_ours(cwd: str) -> None:
    from conftest import spawn_env

    env = spawn_env()
    res = subprocess.run(
        [
            sys.executable, "-m", "tagdust_tpu.cli.tagdust",
            "-seed", "42", "-ref", "contam.fa", "in.fq",
            "-arch", "arch.txt", "-o", "out",
        ],
        cwd=cwd, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_artifact_and_dust_filters(tmp_path):
    cwd = str(tmp_path)
    _make_inputs(cwd)
    _run_ours(cwd)
    for name, md5 in EXPECTED.items():
        h = hashlib.md5(open(os.path.join(cwd, name), "rb").read()).hexdigest()
        assert h == md5, f"{name}: {h} != {md5}"
    log = open(os.path.join(cwd, "out_logfile.txt")).read()
    assert "143\tmatch artifacts:" in log
    assert "143\tadapter1" in log


def test_filters_live_vs_reference_build(tmp_path, ref_bins):
    """Live byte-compare against a freshly compiled tagdust_rtest."""
    cwd = str(tmp_path)
    _make_inputs(cwd)
    _run_ours(cwd)
    res = subprocess.run(
        [
            ref_bins["tagdust_rtest"], "-seed", "42", "-ref", "contam.fa",
            "in.fq", "-arch", "arch.txt", "-o", "refout",
        ],
        cwd=cwd, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for ours_name, ref_name in (("out.fq", "refout.fq"),
                                ("out_un.fq", "refout_un.fq")):
        ours = open(os.path.join(cwd, ours_name), "rb").read()
        ref = open(os.path.join(cwd, ref_name), "rb").read()
        assert ours == ref, f"{ours_name} differs from the reference build"
    # per-contaminant artifact counters match too
    reflog = open(os.path.join(cwd, "refout_logfile.txt")).read()
    assert "143\tmatch artifacts:" in reflog and "143\tadapter1" in reflog
