"""CASAVA-style 3-file demultiplexing regression (synthetic fixture).

The reference casava_test.sh inputs (casava_read1/3.fastq.gz) are absent from
the snapshot, so this test freezes the behaviour on an equivalent synthetic
3-file dataset: R1 = read, R2 = 6nt index, R3 = read, with per-file
architecture auto-detection from the shipped casava_arch.txt grammar.  The
expected MD5s were produced by a run verified byte-identical against the
reference C build (tagdust_rtest, seed 42) on the same inputs.
"""

import hashlib
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED = {
    "out_BC_ACAGTG_READ1.fq": "f3ea493911f07ac880e1a43aff014a08",
    "out_BC_ACAGTG_READ2.fq": "46e8e7ca4ddccd35c37fe6868afc40aa",
    "out_BC_ACTTGA_READ1.fq": "15e71b6af3b912d843109a34de509c3d",
    "out_BC_ACTTGA_READ2.fq": "a218685954648547929b6abd7f353587",
    "out_BC_TTAGGC_READ1.fq": "39203600e6a38d0420a3c76648077c9e",
    "out_BC_TTAGGC_READ2.fq": "0251f7818efd1a74270ea81f42ed5b8e",
    "out_un_READ1.fq": "489bd8275e3277dc1335767bbe612aec",
    "out_un_READ2.fq": "9de01617e4d93bd468e99148e9104849",
}


def _make_inputs(cwd: str) -> None:
    random.seed(11)
    bcs = ["ACAGTG", "ACTTGA", "TTAGGC"]
    n = 3000
    f1 = open(os.path.join(cwd, "cas_r1.fq"), "w")
    f2 = open(os.path.join(cwd, "cas_r2.fq"), "w")
    f3 = open(os.path.join(cwd, "cas_r3.fq"), "w")
    for i in range(n):
        name = f"EAS139:136:FC706VJ:2:2104:{15000 + i}:{197000 + i}"
        bc = random.choice(bcs + ["GGGGGG"])
        idx = "".join(
            (c if random.random() > 0.02 else random.choice("ACGT")) for c in bc
        )
        r1 = "".join(random.choice("ACGT") for _ in range(40))
        r3 = "".join(random.choice("ACGT") for _ in range(40))
        f1.write(f"@{name} 1:N:0:\n{r1}\n+\n{'I' * 40}\n")
        f2.write(f"@{name} 2:N:0:\n{idx}\n+\n{'I' * len(idx)}\n")
        f3.write(f"@{name} 3:N:0:\n{r3}\n+\n{'I' * 40}\n")
    for f in (f1, f2, f3):
        f.close()
    with open(os.path.join(cwd, "cas_arch.txt"), "w") as fh:
        fh.write("tagdust -1 B:ACAGTG,ACTTGA,TTAGGC \n")
        fh.write("tagdust -1 R:N\n")


def _run_ours(cwd: str) -> None:
    from conftest import spawn_env

    env = spawn_env()
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "tagdust_tpu.cli.tagdust",
            "-seed",
            "42",
            "-arch",
            "cas_arch.txt",
            "cas_r1.fq",
            "cas_r2.fq",
            "cas_r3.fq",
            "-o",
            "out",
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_casava_style_three_file_demux(tmp_path):
    cwd = str(tmp_path)
    _make_inputs(cwd)
    _run_ours(cwd)
    for name, md5 in EXPECTED.items():
        p = os.path.join(cwd, name)
        assert os.path.exists(p), f"missing output {name}"
        h = hashlib.md5(open(p, "rb").read()).hexdigest()
        assert h == md5, f"{name}: {h} != {md5}"


def test_casava_style_live_vs_reference_build(tmp_path, ref_bins):
    """Same scenario compared LIVE against a freshly compiled
    tagdust_rtest (dev/casava_test.sh mechanism) — the frozen MD5s above
    stay as the compiler-independent regression."""
    cwd = str(tmp_path)
    _make_inputs(cwd)
    _run_ours(cwd)
    res = subprocess.run(
        [
            ref_bins["tagdust_rtest"], "-seed", "42", "-arch", "cas_arch.txt",
            "cas_r1.fq", "cas_r2.fq", "cas_r3.fq", "-o", "refout",
        ],
        cwd=cwd, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for name in EXPECTED:
        ours = open(os.path.join(cwd, name), "rb").read()
        ref = open(os.path.join(cwd, name.replace("out", "refout", 1)), "rb").read()
        assert ours == ref, f"{name} differs from the reference build"
