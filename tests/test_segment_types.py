"""Segment-grammar end-to-end regressions: F (UMI), G, S, O types and the
-start/-end window, with auto-calibration.

Expected MD5s were produced by runs verified byte-identical against the
reference C build (tagdust_rtest, seed 42) on the same synthetic inputs.
Covers: UMI decoding + FP headers (numeric and -show_finger_seq forms),
CAGE G-addition, exact spacers, optional-nt runs, and subsequence windows.
"""

import hashlib
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tagdust(cwd, args):
    from conftest import spawn_env

    env = spawn_env()
    res = subprocess.run(
        [sys.executable, "-m", "tagdust_tpu.cli.tagdust", "-seed", "42", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def md5(path):
    return hashlib.md5(open(path, "rb").read()).hexdigest()


def _umi_input(cwd):
    random.seed(21)
    with open(os.path.join(cwd, "in.fq"), "w") as f:
        for i in range(2000):
            bc = random.choice(["ACGTAC", "TGCATG"])
            umi = "".join(random.choice("ACGT") for _ in range(4))
            read = "".join(random.choice("ACGT") for _ in range(20))
            seq = umi + bc + read
            f.write(f"@READ{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(os.path.join(cwd, "arch.txt"), "w") as f:
        f.write("tagdust -1 F:NNNN -2 B:ACGTAC,TGCATG -3 R:N in.fq -o out.fq\n")


def test_umi_fingerprint(tmp_path):
    cwd = str(tmp_path)
    _umi_input(cwd)
    run_tagdust(cwd, ["in.fq", "-arch", "arch.txt", "-o", "out"])
    assert md5(os.path.join(cwd, "out_BC_ACGTAC.fq")) == (
        "52bbdd6a248794e4d75dc2db32ea7fa4"
    )


def test_umi_show_finger_seq(tmp_path):
    cwd = str(tmp_path)
    _umi_input(cwd)
    run_tagdust(cwd, ["-show_finger_seq", "in.fq", "-arch", "arch.txt", "-o", "out"])
    assert md5(os.path.join(cwd, "out_BC_ACGTAC.fq")) == (
        "7e2ddbd2a32c6fce3254511d75603979"
    )


def test_g_and_spacer_segments(tmp_path):
    cwd = str(tmp_path)
    random.seed(31)
    with open(os.path.join(cwd, "in.fq"), "w") as f:
        for i in range(2000):
            bc = random.choice(["ACGTAC", "TGCATG"])
            g = "G" * random.choice([1, 1, 1, 2])
            read = "".join(random.choice("ACGT") for _ in range(22))
            seq = g + bc + "TATA" + read
            f.write(f"@READ{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(os.path.join(cwd, "arch.txt"), "w") as f:
        f.write("tagdust -1 G:G -2 B:ACGTAC,TGCATG -3 S:TATA -4 R:N in.fq -o out.fq\n")
    run_tagdust(cwd, ["in.fq", "-arch", "arch.txt", "-o", "out"])
    assert md5(os.path.join(cwd, "out_BC_ACGTAC.fq")) == (
        "39e51de640b806f8ac1d4b54a934e72a"
    )
    assert md5(os.path.join(cwd, "out_un.fq")) == (
        "3af419d89064e306a419be78c5549f25"
    )


def test_optional_segment(tmp_path):
    cwd = str(tmp_path)
    random.seed(33)
    with open(os.path.join(cwd, "in.fq"), "w") as f:
        for i in range(1500):
            opt = "".join(
                random.choice("ACGT") for _ in range(random.choice([0, 1, 2, 3]))
            )
            bc = random.choice(["ACGTAC", "TGCATG"])
            read = "".join(random.choice("ACGT") for _ in range(20))
            f.write(
                f"@READ{i}\n{opt}{bc}{read}\n+\n{'I' * (len(opt) + 26)}\n"
            )
    with open(os.path.join(cwd, "arch.txt"), "w") as f:
        f.write("tagdust -1 O:N -2 B:ACGTAC,TGCATG -3 R:N in.fq -o out.fq\n")
    run_tagdust(cwd, ["in.fq", "-arch", "arch.txt", "-o", "out"])
    assert md5(os.path.join(cwd, "out_BC_ACGTAC.fq")) == (
        "f5dd6987c8ea2be38f025eafb1cdb424"
    )
