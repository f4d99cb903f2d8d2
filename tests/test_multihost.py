"""Multi-host groundwork (VERDICT round 1, item 8).

Two coordinated `tagdust -multihost` processes (jax.distributed over CPU
gloo) must together produce exactly the outputs of a single-process run:
each process owns the chunks with index % nprocs == procid and writes its
own output shard; the shard union equals the single run (process-count
invariance), and every host's logfile reports the global outcome totals.
"""

import os
import socket
import subprocess
import sys

import pytest

from test_gold_regression import EDITTAG, run_tool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

requires_dev = pytest.mark.skipif(
    not os.path.exists(EDITTAG), reason="reference dev fixtures unavailable"
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _records(path):
    """FASTQ records as a set of 4-line tuples."""
    if not os.path.exists(path):
        return set()
    with open(path) as fh:
        lines = fh.read().splitlines()
    return {tuple(lines[i : i + 4]) for i in range(0, len(lines) - 3, 4)}


@requires_dev
def test_two_process_run_matches_single(tmp_path):
    cwd = str(tmp_path)
    run_tool(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "4", "-sim_readlen", "20",
         "-sim_readlen_mod", "0", "-sim_numseq", "2000", "-sim_endloss", "0",
         "-sim_random_frac", "0.1", "-o", "mh.fq"],
        cwd,
    )
    from conftest import spawn_env

    # TAGDUST_TPU_RTEST=1: chunk size 1000 -> 2 chunks, one per host
    base_env = spawn_env()
    common = ["mh.fq", "-arch", "mh.fq_tagdust_arch.txt", "-Q", "10"]

    res = subprocess.run(
        [sys.executable, "-m", "tagdust_tpu.cli.tagdust", *common,
         "-o", "single"],
        cwd=cwd, env=base_env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tagdust_tpu.cli.tagdust", *common,
             "-o", "multi", "-multihost",
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)],
            cwd=cwd, env=base_env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        with open(os.path.join(cwd, f"proc{i}.stderr"), "w") as fh:
            fh.write(err)
        assert p.returncode == 0, err[-2000:]

    single = sorted(
        f for f in os.listdir(cwd)
        if f.startswith("single_") and f.endswith(".fq")
    )
    assert single, "no single-run outputs"
    for f in single:
        suffix = f[len("single"):]
        union = _records(os.path.join(cwd, f"multi.h0{suffix}")) | _records(
            os.path.join(cwd, f"multi.h1{suffix}")
        )
        want = _records(os.path.join(cwd, f))
        assert union == want, f"{suffix}: shard union != single run"

    # both hosts' logfiles report the GLOBAL totals
    def counters(path):
        with open(path) as fh:
            txt = fh.read()
        out = {}
        for line in txt.splitlines():
            for key in ("total input reads", "successfully extracted"):
                if key in line:
                    out[key] = int(line.split("]", 1)[1].strip().split("\t")[0])
        return out

    want = counters(os.path.join(cwd, "single_logfile.txt"))
    assert want["total input reads"] == 2000
    for pid in range(2):
        got = counters(os.path.join(cwd, f"multi.h{pid}_logfile.txt"))
        assert got == want, (pid, got, want)
