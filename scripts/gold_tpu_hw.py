"""Gold scenarios through the REAL fused Pallas pipeline on TPU hardware.

Runs ALL the gold scenarios the exact engine passes (reference:
dev/bar_read_test.sh scenarios 1-4 and the casava-style 3-file stand-in,
dev/casava_test.sh) end-to-end with ``-engine tpu`` on the attached chip —
no ``TAGDUST_TPU_PALLAS=0`` crutch, streaming windows forced small so the
pipelined dispatch path (and its device-side DUST) is exercised.  The
paired scenarios (barread3/4) resolve their architectures via ``-arch``
auto-detection, which under ``-engine tpu`` runs the device MODE_ARCH_COMP
backward sweep (detect.py) — so detection parity is covered on hardware
too.  Each scenario is held to the gold bar:

* the evalres metrics TSV must equal the reference gold line verbatim;
* every read must land in the same output file with the same extracted
  seq/qual as under the bit-exact parity engine (decision identity);
* a two-part decision-margin audit.  |Q_exact - Q_pallas| mixes two
  effects: (a) the exact engine replicates the reference's 16k-entry
  TABLE logsum (misc.c:57-78) while the TPU engines use clean f32
  logsumexp — on the linker-heavy barread2 reads that approximation
  alone reaches |dQ| ~0.64 (measured scan-vs-exact on CPU f32,
  scripts/dq_probe.py) — and (b) the Pallas kernels' own numerics.
  So the audit asserts |Q_exact - Q_pallas| < 0.15 on barread1 (where
  the table effect is small; same bound as tests/test_gold_tpu_engine),
  bounds it < 1.0 on barread2, and also records |Q_scan - Q_pallas|
  against a TAGDUST_TPU_PALLAS=0 run on the same chip (< 0.6; both
  formulations run bf16 MXU inputs, so this measures how differently
  the two step orders truncate — the pure f32 formulation difference
  is only ~0.015, pinned by the interpret-mode audit in
  tests/test_gold_tpu_engine.py::test_decision_margin_audit_psegment).

Writes a machine-readable digest to GOLD_TPU_HW_r03.json (or $GOLD_OUT).
All runs happen in ONE process: this rig's tunneled device link stalls
minutes on a process's first device->host transfer, which says nothing
about the kernels under test.

Usage:  python scripts/gold_tpu_hw.py          (needs the TPU attached)
Opt-in pytest wrapper: tests/test_tpu_hw.py (TAGDUST_TPU_HW=1).
"""

import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

DEV = "/root/reference/dev"
EDITTAG = os.path.join(DEV, "EDITTAG_6nt_ed_4.txt")

GOLD = {
    "barread1": (
        "tagdust\t1.0000\t0.9542\t0.9947\t0.9739\t0.0000\t"
        "8951.00\t48.00\t0.00\t1001.00"
    ),
    "barread2": (
        "tagdust\t1.0000\t0.9775\t0.9974\t0.9874\t0.0013\t"
        "8976.00\t23.00\t0.00\t1001.00"
    ),
    # paired-end, no barcodes (dev/bar_read_test.sh scenario 3)
    "barread3": (
        "tagdust\t1.0000\t1.0000\t1.0000\t1.0000\t0.0017\t"
        "8999.00\t0.00\t0.00\t1001.00"
    ),
    # paired-end with barcodes (scenario 4)
    "barread4": (
        "tagdust\t1.0000\t0.9775\t0.9974\t0.9874\t0.0013\t"
        "8976.00\t23.00\t0.00\t1001.00"
    ),
}

_RQ = re.compile(r";RQ:-?[0-9.]+")  # RQ can be -1.00 (unscored read files)


def run_cli(tool, args, cwd, extra_env=None):
    """Run a tool's CLI main() in-process (same code path as the console
    script) with a scoped cwd/env."""
    import importlib

    mod = importlib.import_module(f"tagdust_tpu.cli.{tool}")
    old_cwd = os.getcwd()
    old_env = dict(os.environ)
    os.chdir(cwd)
    try:
        if extra_env:
            os.environ.update(extra_env)
        mod.main(args)
    finally:
        os.chdir(old_cwd)
        os.environ.clear()
        os.environ.update(old_env)


def simreads(cwd, out, extra=()):
    run_cli(
        "simreads",
        [EDITTAG, "-seed", "42", "-sim_barnum", "4", *extra,
         "-sim_readlen", "20", "-sim_readlen_mod", "0",
         "-sim_numseq", "10000", "-sim_endloss", "0",
         "-sim_random_frac", "0.1", "-o", out, "-sim_error_rate", "0.02"],
        cwd,
        extra_env={"TAGDUST_TPU_RTEST": "1"},
    )


def read_assignment(cwd, prefix):
    out = {}
    for f in sorted(os.listdir(cwd)):
        if not (f.startswith(prefix) and f.endswith(".fq")):
            continue
        with open(os.path.join(cwd, f)) as fh:
            lines = fh.read().splitlines()
        for i in range(0, len(lines) - 3, 4):
            out[_RQ.sub("", lines[i])] = (f[len(prefix):], lines[i + 1],
                                          lines[i + 3])
    return out


def mapq_by_name(cwd, prefix):
    out = {}
    rq = re.compile(r"^(@.*);RQ:(-?[0-9.]+)$")
    for f in sorted(os.listdir(cwd)):
        if not (f.startswith(prefix) and f.endswith(".fq")):
            continue
        with open(os.path.join(cwd, f)) as fh:
            lines = fh.read().splitlines()
        for i in range(0, len(lines) - 3, 4):
            m = rq.match(lines[i])
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def run_scenario(scenario, results):
    import jax

    extra = (("-sim_5seq", "GGGGGGG", "-sim_3seq", "TTTTTTT")
             if scenario == "barread2" else ())
    with tempfile.TemporaryDirectory() as cwd:
        simreads(cwd, f"{scenario}.fq", extra=extra)
        arch = f"{scenario}.fq_tagdust_arch.txt"
        base_env = {"TAGDUST_TPU_RTEST": "1", "TAGDUST_TPU_STRICT": "1"}
        run_cli(
            "tagdust",
            ["-seed", "42", f"{scenario}.fq", "-arch", arch, "-o", "ex"],
            cwd, extra_env=base_env,
        )
        t0 = time.time()
        run_cli(
            "tagdust",
            ["-seed", "42", f"{scenario}.fq", "-arch", arch,
             "-engine", "tpu", "-o", "tp"],
            cwd,
            extra_env={
                **base_env,
                # force the streaming pipelined path on the 1000-read RTEST
                # chunks so the production dispatch + device DUST run
                # (BT must stay below the chunk size or streaming disengages)
                "TAGDUST_TPU_WINDOW": "256",
                "TAGDUST_TPU_BT": "256",
            },
        )
        tpu_seconds = time.time() - t0
        outs = sorted(f for f in os.listdir(cwd)
                      if f.startswith("tp_") and f.endswith(".fq"))
        run_cli("evalres", ["-name", "tagdust", *outs, "-o", "tp"], cwd,
                extra_env=base_env)
        with open(os.path.join(cwd, "tp_results.txt")) as fh:
            got = fh.read().strip().splitlines()[1]
        assert got == GOLD[scenario], (
            f"{scenario}: metrics TSV != gold\n got: {got}\ngold: "
            f"{GOLD[scenario]}"
        )
        # barread1: table-logsum effect is small, hold the tight bound.
        # barread2: the P-linker chains amplify the exact engine's TABLE
        # logsum approximation to ~0.64 even vs clean CPU f32 math
        # (dq_probe.py) — bound loosely; the pallas-vs-scan bound inside
        # the helper is the kernel-isolated pin.
        _audit_vs_exact_and_scan(
            cwd, scenario,
            ["-seed", "42", f"{scenario}.fq", "-arch", arch],
            base_env, results,
            dq_exact_bound=0.15 if scenario == "barread1" else 1.0,
            tpu_seconds=tpu_seconds,
        )
    return results


def _audit_vs_exact_and_scan(cwd, scenario, args, base_env, results,
                             dq_exact_bound, tpu_seconds,
                             dq_kernel_bound=0.6, f32_pin=False):
    """Shared tail: decision identity ex==tp==sc, two-part dQ audit,
    digest + record (args = the tagdust CLI args WITHOUT -engine/-o).

    ``f32_pin=True`` adds a third leg: BOTH device flavors re-run with
    TAGDUST_TPU_PRECISION=highest (f32-clean MXU math in the Pallas
    kernels AND the XLA scan, engine/tpu.py:_f32_precision_wrap) and
    must agree to < 0.15 — on P-chain-heavy architectures the
    default-precision pallas-vs-scan delta is dominated by how the two
    formulations truncate bf16 MXU inputs, so this pin is what shows the
    kernel FORMULATION is right on the chip."""
    ex = read_assignment(cwd, "ex_")
    tp = read_assignment(cwd, "tp_")
    assert set(ex) == set(tp), f"{scenario}: read-name sets differ"
    diff = [n for n in ex if ex[n] != tp[n]]
    assert not diff, (
        f"{scenario}: {len(diff)} reads decided differently, e.g. {diff[:3]}"
    )
    qe = mapq_by_name(cwd, "ex_")
    qt = mapq_by_name(cwd, "tp_")
    max_dq = max(abs(qe[n] - qt[n]) for n in qe)
    assert max_dq < dq_exact_bound, f"{scenario}: max |dQ| = {max_dq}"
    run_cli(
        "tagdust", [*args, "-engine", "tpu", "-o", "sc"], cwd,
        extra_env={**base_env, "TAGDUST_TPU_PALLAS": "0"},
    )
    sc = read_assignment(cwd, "sc_")
    assert set(sc) == set(tp) and not [n for n in sc if sc[n] != tp[n]], (
        f"{scenario}: scan-flavor decisions differ from pallas"
    )
    qs = mapq_by_name(cwd, "sc_")
    max_dq_kernel = max(abs(qs[n] - qt[n]) for n in qs)
    assert max_dq_kernel < dq_kernel_bound, (
        f"{scenario}: pallas-vs-scan max |dQ| = {max_dq_kernel}"
    )
    digest = hashlib.sha256(
        "".join(f"{n}:{v}" for n, v in sorted(tp.items())).encode()
    ).hexdigest()
    results[scenario] = {
        "gold_tsv": "match",
        "reads_compared": len(ex),
        "decision_identity": "exact == pallas == xla-scan",
        "max_abs_dQ_pallas_vs_exact": round(max_dq, 4),
        "max_abs_dQ_pallas_vs_scan": round(max_dq_kernel, 4),
        "output_digest_sha256": digest,
        "tpu_engine_seconds": round(tpu_seconds, 2),
    }
    if f32_pin:
        hi = {"TAGDUST_TPU_PRECISION": "highest"}
        run_cli("tagdust", [*args, "-engine", "tpu", "-o", "hp"], cwd,
                extra_env={**base_env, **hi})
        run_cli("tagdust", [*args, "-engine", "tpu", "-o", "hs"], cwd,
                extra_env={**base_env, **hi, "TAGDUST_TPU_PALLAS": "0"})
        hp = read_assignment(cwd, "hp_")
        hs = read_assignment(cwd, "hs_")
        assert set(hp) == set(hs) and not [n for n in hp if hp[n] != hs[n]], (
            f"{scenario}: f32 pallas/scan decisions differ"
        )
        qhp = mapq_by_name(cwd, "hp_")
        qhs = mapq_by_name(cwd, "hs_")
        max_dq_f32 = max(abs(qhp[n] - qhs[n]) for n in qhp)
        assert max_dq_f32 < 0.15, (
            f"{scenario}: f32-pinned pallas-vs-scan max |dQ| = {max_dq_f32}"
        )
        results[scenario]["max_abs_dQ_pallas_vs_scan_f32"] = round(
            max_dq_f32, 4
        )
    print(
        f"{scenario}: OK (|dQ| vs exact {max_dq:.4f}, "
        f"vs scan {max_dq_kernel:.4f}"
        + (f", f32-pinned {results[scenario]['max_abs_dQ_pallas_vs_scan_f32']:.4f})"
           if f32_pin else ")")
    )


def run_paired_scenario(scenario, results):
    """barread3/4 (dev/bar_read_test.sh:102-212): paired-end without/with
    barcodes, architectures resolved by -arch auto-detection — under
    -engine tpu the detection backward sweep runs on the device too."""
    barnum = 0 if scenario == "barread3" else 4
    with tempfile.TemporaryDirectory() as cwd:
        run_cli(
            "simreads",
            [EDITTAG, "-seed", "42", "-sim_barnum", str(barnum),
             "-sim_5seq", "GGGGGGG", "-sim_3seq", "TTTTTTT",
             "-sim_readlen", "20", "-sim_readlen_mod", "0",
             "-sim_numseq", "10000", "-sim_endloss", "0",
             "-sim_random_frac", "0.1", "-o", "r1.fq",
             "-sim_error_rate", "0.02"],
            cwd, extra_env={"TAGDUST_TPU_RTEST": "1"},
        )
        run_cli(
            "simreads",
            [EDITTAG, "-seed", "42", "-sim_barnum", "0", "-sim_readlen",
             "20", "-sim_readlen_mod", "0", "-sim_numseq", "10000",
             "-sim_endloss", "0", "-sim_random_frac", "0.00", "-o", "r2.fq",
             "-sim_error_rate", "0.02"],
            cwd, extra_env={"TAGDUST_TPU_RTEST": "1"},
        )
        with open(os.path.join(cwd, "combo.txt"), "w") as fh:
            for p in ("r1.fq_tagdust_arch.txt", "r2.fq_tagdust_arch.txt"):
                fh.write(open(os.path.join(cwd, p)).read())
        base_env = {"TAGDUST_TPU_RTEST": "1", "TAGDUST_TPU_STRICT": "1"}
        args = ["-seed", "42", "-sim_numseq", "1", "r1.fq", "r2.fq",
                "-arch", "combo.txt"]
        run_cli("tagdust", [*args, "-o", "ex"], cwd, extra_env=base_env)
        t0 = time.time()
        run_cli(
            "tagdust", [*args, "-engine", "tpu", "-o", "tp"], cwd,
            extra_env={**base_env, "TAGDUST_TPU_WINDOW": "256",
                       "TAGDUST_TPU_BT": "256"},
        )
        tpu_seconds = time.time() - t0
        outs = sorted(f for f in os.listdir(cwd)
                      if f.startswith("tp_") and f.endswith("READ1.fq"))
        run_cli("evalres", ["-name", "tagdust", *outs, "-o", "tp"], cwd,
                extra_env=base_env)
        with open(os.path.join(cwd, "tp_results.txt")) as fh:
            got = fh.read().strip().splitlines()[1]
        assert got == GOLD[scenario], (
            f"{scenario}: metrics TSV != gold\n got: {got}\ngold: "
            f"{GOLD[scenario]}"
        )
        # The 5' AND 3' P-linker chains amplify BOTH approximation gaps:
        # the exact engine's table-logsum reaches max |dQ| = 1.6232 vs
        # clean CPU f32 on this very input (dq_probe.py --scenario
        # barread3, measured 2026-08-20), and the two device
        # formulations' bf16-MXU truncation differences reach ~1.08
        # (measured on-chip same day) — so the default-precision bounds
        # are 2.0 / 1.5 here, and the kernel-correctness pin is the
        # f32_pin leg: pallas vs scan BOTH at TAGDUST_TPU_PRECISION=
        # highest must agree < 0.15 on the chip.
        _audit_vs_exact_and_scan(cwd, scenario, args, base_env, results,
                                 dq_exact_bound=2.0, tpu_seconds=tpu_seconds,
                                 dq_kernel_bound=1.5, f32_pin=True)


def run_casava_scenario(results):
    """The casava-style 3-file stand-in (dev/casava_test.sh scenario; the
    reference's casava_read1/3.fastq.gz blobs are absent from the snapshot
    — tests/test_casava_style.py pins this synthetic equivalent against a
    freshly built tagdust_rtest)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_casava_style import EXPECTED, _make_inputs

    with tempfile.TemporaryDirectory() as cwd:
        _make_inputs(cwd)
        base_env = {"TAGDUST_TPU_RTEST": "1", "TAGDUST_TPU_STRICT": "1"}
        args = ["-seed", "42", "-arch", "cas_arch.txt",
                "cas_r1.fq", "cas_r2.fq", "cas_r3.fq"]
        run_cli("tagdust", [*args, "-o", "ex"], cwd, extra_env=base_env)
        # the exact run must reproduce the frozen reference-verified MD5s
        for name, md5 in EXPECTED.items():
            p = os.path.join(cwd, name.replace("out", "ex", 1))
            got = hashlib.md5(open(p, "rb").read()).hexdigest()
            assert got == md5, f"casava: {name} md5 {got} != {md5}"
        t0 = time.time()
        run_cli(
            "tagdust", [*args, "-engine", "tpu", "-o", "tp"], cwd,
            extra_env={**base_env, "TAGDUST_TPU_WINDOW": "256",
                       "TAGDUST_TPU_BT": "256"},
        )
        tpu_seconds = time.time() - t0
        results_key = "casava_style"
        _audit_vs_exact_and_scan(cwd, results_key, args, base_env, results,
                                 dq_exact_bound=0.25, tpu_seconds=tpu_seconds)
        results[results_key]["gold_tsv"] = "md5 (8 files, reference-verified)"


def main():
    import jax

    results = {
        "platform": str(jax.devices()[0]),
        "pallas_forced_off": os.environ.get("TAGDUST_TPU_PALLAS") == "0",
        "streaming_window": 256,
    }
    assert not results["pallas_forced_off"], "run without TAGDUST_TPU_PALLAS=0"
    for scenario in ("barread1", "barread2"):
        run_scenario(scenario, results)
    for scenario in ("barread3", "barread4"):
        run_paired_scenario(scenario, results)
    run_casava_scenario(results)
    out = os.environ.get("GOLD_OUT", os.path.join(REPO, "GOLD_TPU_HW_r04.json"))
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
