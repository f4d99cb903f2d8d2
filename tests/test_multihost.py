"""Multi-host execution (VERDICT round 1 item 8; round 3 item 1).

Two coordinated `tagdust -multihost` processes (jax.distributed over CPU
gloo) must produce exactly the reference's single demultiplexed file set:
each process owns the chunks with index % nprocs == procid, boundary-skips
the rest (input-bandwidth sharding), writes its own transient output shard,
and host 0 interleaves the shards back in global chunk order at the end
(parallel/multihost.py:merge_output_shards).  Asserted here:

* the merged file set is byte-identical to a single-process run's — no
  shard unioning, the user-visible contract IS the reference's
  (io.c:757-1029);
* the transient ``.h<pid>`` shards and sidecars are removed;
* host 1 fully parses well under 60% of the input records (the rest are
  boundary-skipped), i.e. host-side parse bandwidth scales with nprocs;
* every host reports the GLOBAL outcome totals, host 0 under the
  reference-named ``<out>_logfile.txt``.
"""

import json
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
    base_env = spawn_env(TAGDUST_TPU_IO_STATS="1")
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

    # the user receives the reference's single file set, byte-identical to
    # a single-process run — NOT per-host shards
    single = sorted(
        f for f in os.listdir(cwd)
        if f.startswith("single_") and f.endswith(".fq")
    )
    assert single, "no single-run outputs"
    for f in single:
        suffix = f[len("single"):]
        merged = os.path.join(cwd, "multi" + suffix)
        assert os.path.exists(merged), f"merged output missing: {suffix}"
        with open(os.path.join(cwd, f), "rb") as fh:
            want = fh.read()
        with open(merged, "rb") as fh:
            got = fh.read()
        assert got == want, f"{suffix}: merged bytes != single run"

    # the transient shards and sidecars were cleaned up by the merge
    leftovers = [
        f for f in os.listdir(cwd)
        if (f.startswith("multi.h0") or f.startswith("multi.h1"))
        and not f.endswith(("_logfile.txt", ".iostats.json"))
    ]
    assert not leftovers, leftovers

    # input-bandwidth sharding: host 1 fully parses < 60% of the records
    # (its non-owned chunks only pay record-boundary scanning)
    with open(os.path.join(cwd, "multi.h1.iostats.json")) as fh:
        io_stats = json.load(fh)
    assert io_stats["parsed"] + io_stats["skipped"] == 2000, io_stats
    assert io_stats["parsed"] < 0.6 * 2000, io_stats

    # both hosts' logfiles report the GLOBAL totals; host 0 writes the
    # reference-named <out>_logfile.txt
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
    assert counters(os.path.join(cwd, "multi_logfile.txt")) == want
    assert counters(os.path.join(cwd, "multi.h1_logfile.txt")) == want


def test_skip_chunk_boundary_scan(tmp_path):
    """skip_chunk advances exactly chunk-sized record windows (identical
    boundaries to read_chunk_batch) and rejects the same malformed records
    the parser rejects — a skipping host must abort on the same inputs the
    owning host aborts on, or a pod run would hang at the next collective."""
    from tagdust_tpu.io.fastq import SeqReader

    p = tmp_path / "ok.fq"
    recs = [f"@r{i}\nACGTAC\n+\nIIIIII\n" for i in range(10)]
    p.write_text("".join(recs))

    r = SeqReader(str(p))
    assert r.skip_chunk(3) == 3
    rb = r.read_chunk_batch(3)
    assert rb.name(0) == "r3"
    assert r.skip_chunk(100) == 4
    assert r.records_parsed == 3 and r.records_skipped == 7
    r.close()

    bad = tmp_path / "bad.fq"
    bad.write_text("@r0\nACGT\n+\nIII\n")
    r = SeqReader(str(bad))
    with pytest.raises(SystemExit):
        r.skip_chunk(10)
    r.close()


@requires_dev
def test_two_file_paired_head_parse(tmp_path):
    """Paired-file multi-host: non-owning hosts parse only the <=1000-record
    HEAD of chunk 0 (what the read-name pairing check compares) and
    boundary-skip the rest — a 16-host pod must not pay a full-chunk parse
    per host just to run a 1000-name check (code-review round 4)."""
    cwd = str(tmp_path)
    common_sim = [
        EDITTAG, "-seed", "42", "-sim_readlen", "20",
        "-sim_readlen_mod", "0", "-sim_numseq", "4000", "-sim_endloss", "0",
        "-sim_random_frac", "0.1", "-sim_error_rate", "0.02",
    ]
    run_tool("simreads", [*common_sim, "-sim_barnum", "4", "-o", "p1.fq"], cwd)
    run_tool("simreads", [*common_sim, "-sim_barnum", "0", "-o", "p2.fq"], cwd)
    with open(os.path.join(cwd, "combo.txt"), "w") as fh:
        for p in ("p1.fq_tagdust_arch.txt", "p2.fq_tagdust_arch.txt"):
            fh.write(open(os.path.join(cwd, p)).read())

    from conftest import spawn_env

    # NON-rtest so TAGDUST_TPU_CHUNK applies: 2000-record chunks, 4000
    # records -> chunks {0,1}; host 1 owns chunk 1 only.
    base_env = spawn_env(
        rtest=False, TAGDUST_TPU_IO_STATS="1", TAGDUST_TPU_CHUNK="2000"
    )
    common = ["p1.fq", "p2.fq", "-arch", "combo.txt", "-Q", "10",
              "-seed", "42"]

    res = subprocess.run(
        [sys.executable, "-m", "tagdust_tpu.cli.tagdust", *common,
         "-o", "sgl"],
        cwd=cwd, env=base_env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tagdust_tpu.cli.tagdust", *common,
             "-o", "mlt", "-multihost",
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)],
            cwd=cwd, env=base_env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]

    # merged file set byte-identical to the single-process run
    single = sorted(
        f for f in os.listdir(cwd)
        if f.startswith("sgl_") and f.endswith(".fq")
    )
    assert single, "no single-run outputs"
    for f in single:
        suffix = f[len("sgl"):]
        merged = os.path.join(cwd, "mlt" + suffix)
        assert os.path.exists(merged), f"merged output missing: {suffix}"
        assert (
            open(os.path.join(cwd, f), "rb").read()
            == open(merged, "rb").read()
        ), f"{suffix}: merged bytes != single run"

    # 4000 records/file: host 1 parses the 1000-record chunk-0 head of
    # each file plus its owned chunk 1 (2000) and boundary-skips the
    # remaining 1000 of chunk 0
    with open(os.path.join(cwd, "mlt.h1.iostats.json")) as fh:
        st = json.load(fh)
    assert st["parsed"] + st["skipped"] == 2 * 4000, st
    # head (1000) + owned chunk 1 (2000) per file = 6000 parsed total
    assert st["parsed"] == 2 * 3000, st
