"""CLI-level tests for the auxiliary tools: merge, rename_qiime, SAM input.

Mirrors the reference's per-tool regression builds (src/Makefile.am:89-99)
with synthetic fixtures exercising the documented semantics
(merge.c:399-688; rename_illumina_demultiplexed_for_qiime.c:24-283;
read_sam_chunk io.c:1498-1667)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RC = str.maketrans("ACGT", "TGCA")


def _revcomp(s: str) -> str:
    return s[::-1].translate(_RC)


def _run(mod, args, cwd):
    from conftest import spawn_env

    env = spawn_env(rtest=False)
    res = subprocess.run(
        [sys.executable, "-m", mod, *args],
        cwd=cwd, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res


def test_merge_overlapping_pairs(tmp_path):
    cwd = str(tmp_path)
    rng = np.random.default_rng(3)
    full_reads = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, 60)) for _ in range(5)
    ]
    with open(os.path.join(cwd, "r1.fq"), "w") as f1, open(
        os.path.join(cwd, "r2.fq"), "w"
    ) as f2:
        for i, full in enumerate(full_reads):
            r1 = full[:40]
            r2 = _revcomp(full[20:])  # overlap = full[20:40], 20nt
            f1.write(f"@P{i};1\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@P{i};2\n{r2}\n+\n{'I' * len(r2)}\n")
    res = _run(
        "tagdust_tpu.cli.merge_tool", ["r1.fq", "r2.fq", "-Q", "0.9"], cwd
    )
    lines = res.stdout.strip().splitlines()
    assert len(lines) == 4 * len(full_reads)
    for i, full in enumerate(full_reads):
        assert lines[4 * i] == f"@P{i};1"
        assert lines[4 * i + 1] == full  # perfect-overlap consensus
        assert lines[4 * i + 3] == "I" * 60


def test_merge_live_vs_reference_build(tmp_path, ref_bins):
    """Merged stream byte-compared against a freshly compiled reference
    merge binary at -t 1 (deterministic output order; merge.c:330)."""
    cwd = str(tmp_path)
    rng = np.random.default_rng(11)
    with open(os.path.join(cwd, "r1.fq"), "w") as f1, open(
        os.path.join(cwd, "r2.fq"), "w"
    ) as f2:
        for i in range(200):
            full = "".join("ACGT"[c] for c in rng.integers(0, 4, 70))
            quals = "".join(chr(33 + int(q)) for q in rng.integers(10, 40, 70))
            cut = int(rng.integers(30, 50))
            r1, q1 = full[:cut], quals[:cut]
            r2 = _revcomp(full[cut - 25 :])
            q2 = quals[cut - 25 :][::-1]
            # sprinkle mismatches so the consensus pick path is exercised
            if i % 3 == 0:
                r1 = r1[:10] + ("A" if r1[10] != "A" else "C") + r1[11:]
            f1.write(f"@P{i};1\n{r1}\n+\n{q1}\n")
            f2.write(f"@P{i};2\n{r2}\n+\n{q2}\n")
    ours = _run(
        "tagdust_tpu.cli.merge_tool", ["r1.fq", "r2.fq", "-Q", "0.85"], cwd
    ).stdout
    ref = subprocess.run(
        [ref_bins["merge_ref"], "-t", "1", "r1.fq", "r2.fq", "-Q", "0.85"],
        cwd=cwd, capture_output=True, text=True,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    assert ours == ref.stdout


def test_merge_rejects_low_identity(tmp_path):
    cwd = str(tmp_path)
    a = "ACGT" * 15
    b = "TTGG" * 15  # unrelated: every overlap has low identity
    with open(os.path.join(cwd, "r1.fq"), "w") as f1, open(
        os.path.join(cwd, "r2.fq"), "w"
    ) as f2:
        f1.write(f"@X;1\n{a}\n+\n{'I' * 60}\n")
        f2.write(f"@X;2\n{b}\n+\n{'I' * 60}\n")
    res = _run(
        "tagdust_tpu.cli.merge_tool", ["r1.fq", "r2.fq", "-Q", "0.99"], cwd
    )
    assert res.stdout.strip() == ""


def test_rename_qiime_exact_and_mismatch(tmp_path):
    cwd = str(tmp_path)
    with open(os.path.join(cwd, "map.txt"), "w") as fh:
        fh.write("#comment line\nsampleA\tACGTAC\nsampleB\tTGCATG\n")
    with open(os.path.join(cwd, "in.fq"), "w") as fh:
        fh.write("@M01:1:XYZ:ACGTAC\nAAAACCCC\n+\nIIIIIIII\n")   # exact A
        fh.write("@M01:2:XYZ:TGCATG\nGGGGTTTT\n+\nIIIIIIII\n")   # exact B
        fh.write("@M01:3:XYZ:TGCATC\nACACACAC\n+\nIIIIIIII\n")   # 1-mismatch B
    res = _run("tagdust_tpu.cli.rename_qiime", ["map.txt", "in.fq"], cwd)
    lines = res.stdout.strip().splitlines()
    assert lines[0].startswith(">sampleA_1 ")
    assert "orig_bc=ACGTAC new_bc=ACGTAC bc_diffs=0" in lines[0]
    assert lines[1] == "AAAACCCC"
    assert lines[2].startswith(">sampleB_1 ")
    assert lines[4].startswith(">sampleB_2 ")
    assert "bc_diffs=1" in lines[4]


def test_sam_input_demux(tmp_path):
    """SAM reading drops secondary (0x100) and QC-fail (0x200) records and
    demultiplexes like FASTQ input (io.c:1498-1667; samtools view -F 768)."""
    cwd = str(tmp_path)
    rows = [
        ("r1", 0, "ACAGTG" + "ACGTACGTACGTACGTACGT", 'I' * 26),
        ("r2", 256, "ACAGTG" + "AAAAAAAAAAAAAAAAAAAA", 'I' * 26),  # secondary
        ("r3", 512, "ACTTGA" + "CCCCCCCCCCCCCCCCCCCC", 'I' * 26),  # qc-fail
        ("r4", 16, "ACTTGA" + "GTGTGTGTAACCGGTTACGT", 'I' * 26),
    ]
    with open(os.path.join(cwd, "in.sam"), "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n")
        for name, flag, seq, qual in rows:
            fh.write(
                f"{name}\t{flag}\tchr1\t1\t60\t26M\t*\t0\t0\t{seq}\t{qual}\n"
            )
    _run(
        "tagdust_tpu.cli.tagdust",
        ["-1", "B:ACAGTG,ACTTGA", "-2", "R:N", "-Q", "0", "-seed", "42",
         "in.sam", "-o", "out"],
        cwd,
    )
    log = open(os.path.join(cwd, "out_logfile.txt")).read()
    assert "2\ttotal input reads" in log  # flags 256/512 dropped
    bc1 = open(os.path.join(cwd, "out_BC_ACAGTG.fq")).read()
    bc2 = open(os.path.join(cwd, "out_BC_ACTTGA.fq")).read()
    assert "@r1;" in bc1 and "@r4;" in bc2
    assert "r2" not in bc1 + bc2 and "r3" not in bc1 + bc2


def test_cli_error_paths(tmp_path):
    """QC and validation failures exit cleanly with the reference's messages
    (interface.c:759-829; io.c:633-691; main.c:103-130)."""
    cwd = str(tmp_path)
    with open(os.path.join(cwd, "in.fq"), "w") as fh:
        fh.write("@a\nACGTACGT\n+\nIIIIIIII\n")

    def run(args):
        from conftest import spawn_env

        env = spawn_env(rtest=False)
        return subprocess.run(
            [sys.executable, "-m", "tagdust_tpu.cli.tagdust", *args],
            cwd=cwd, env=env, capture_output=True, text=True,
        )

    # skipped segment slot (-1 then -3)
    r = run(["-1", "B:ACGT,TGCA", "-3", "R:N", "-Q", "1", "in.fq", "-o", "x1"])
    assert r.returncode == 1
    assert "building block was skipped" in r.stderr
    assert "Traceback" not in r.stderr

    # unequal alternative lengths in one segment
    r = run(["-1", "B:AC,GGG", "-2", "R:N", "-Q", "1", "in.fq", "-o", "x2"])
    assert r.returncode == 1
    assert "same length" in r.stderr
    assert "Traceback" not in r.stderr

    # refuses to overwrite existing outputs
    open(os.path.join(cwd, "x3_BC_ACGT.fq"), "w").close()
    r = run(["-1", "B:ACGT,TGCA", "-2", "R:N", "-Q", "1", "in.fq", "-o", "x3"])
    assert r.returncode != 0
    assert "already exists" in (r.stderr + r.stdout)

    # missing input file
    r = run(["-1", "B:ACGT,TGCA", "-2", "R:N", "-Q", "1", "nope.fq", "-o", "x4"])
    assert "does not exists" in r.stdout
