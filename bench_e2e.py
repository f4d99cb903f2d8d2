"""End-to-end CLI throughput bench: reads/s through the full production
pipeline (read -> score -> extract -> filter -> write), not just the device
kernel.

Generates (and caches) a simreads input, then times
`hmm_controller_multiple` exactly as the CLI drives it, with a fixed -Q
threshold (calibration is a one-time cost amortised over a whole run and
benchmarked separately).  Prints one JSON line per configuration.

Usage:
  python bench_e2e.py [--reads 1000000] [--engine tpu|exact] [--readlen 50]

Notes for interpreting numbers on this dev rig: the TPU is attached over a
tunneled PJRT link (~100x slower than production PCIe/ICI) and the host has
2 cores; production hosts shift the balance heavily toward the device
numbers in docs/PERFORMANCE.md.
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

EDITTAG = "/root/reference/dev/EDITTAG_6nt_ed_4.txt"


def make_input(n_reads: int, readlen: int, barnum: int) -> str:
    key = hashlib.md5(f"{n_reads}:{readlen}:{barnum}".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"tagdust_e2e_{key}")
    fq = base + ".fq"
    arch = fq + "_tagdust_arch.txt"
    if not (os.path.exists(fq) and os.path.exists(arch)):
        env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, "-m", "tagdust_tpu.cli.simreads", EDITTAG,
             "-seed", "42", "-sim_barnum", str(barnum),
             "-sim_readlen", str(readlen), "-sim_readlen_mod", "0",
             "-sim_numseq", str(n_reads), "-sim_endloss", "0",
             "-sim_random_frac", "0.1", "-o", fq],
            check=True, env=env, cwd=tempfile.gettempdir(),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    return fq


def run_once(fq: str, engine: str, outdir: str) -> dict:
    from tagdust_tpu.config import parse_args
    from tagdust_tpu.controller import MessageLog, hmm_controller_multiple

    out = os.path.join(outdir, f"bench_{engine}")
    args = [fq, "-arch", fq + "_tagdust_arch.txt", "-Q", "10", "-o", out]
    if engine == "tpu":
        args += ["-engine", "tpu"]
    param = parse_args(args)
    log = MessageLog()
    devnull = open(os.devnull, "w")
    old_err, sys.stderr = sys.stderr, devnull  # silence the run log
    try:
        t0 = time.perf_counter()
        hmm_controller_multiple(param, log=log)
        dt = time.perf_counter() - t0
    finally:
        sys.stderr = old_err
        devnull.close()
    total = 0
    for m in log.messages:
        # "[stamp]\t<N>\ttotal input reads\n"
        if "total input reads" in m:
            total = int(m.split("]", 1)[1].strip().split("\t")[0])
    return {"seconds": dt, "reads": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1000000)
    ap.add_argument("--readlen", type=int, default=50)
    ap.add_argument("--barnum", type=int, default=8)
    ap.add_argument("--engine", default="tpu", choices=["tpu", "exact", "both"])
    args = ap.parse_args()

    fq = make_input(args.reads, args.readlen, args.barnum)
    engines = ["tpu", "exact"] if args.engine == "both" else [args.engine]
    for engine in engines:
        with tempfile.TemporaryDirectory() as outdir:
            r = run_once(fq, engine, outdir)
        rps = r["reads"] / r["seconds"] if r["seconds"] else 0.0
        print(json.dumps({
            "metric": f"e2e CLI reads/s ({engine} engine, "
                      f"{args.barnum}x6nt barcodes, {args.readlen}nt reads)",
            "value": round(rps, 1),
            "unit": "reads/s",
            "reads": r["reads"],
            "seconds": round(r["seconds"], 2),
        }))


if __name__ == "__main__":
    main()
