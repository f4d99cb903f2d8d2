"""Probe: where does the barread2 |dQ| come from?  Compares Q from the
exact engine vs the XLA-scan flavor (CPU) vs interpret-mode Pallas on the
barread2 gold scenario, per read.  Diagnostic only.

``--scenario barread3`` probes the paired scenario's read-1 file instead
(no barcodes, P linkers on BOTH ends, arch ``P:GGGGGGG R:N P:TTTTTTT``):
the doubled P chains push the pure table-logsum deviation (clean-f32
XLA scan vs the exact engine, no Pallas, no bf16) to max |dQ| = 1.6232
(measured 2026-08-20) — the basis for gold_tpu_hw.py's 2.0 vs-exact
bound on barread3/4."""

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TAGDUST_TPU_RTEST", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from scripts.gold_tpu_hw import run_cli, simreads, EDITTAG  # noqa: E402


def main():
    import re

    from tagdust_tpu.arch import read_structure_from_params
    from tagdust_tpu.engine.runner import score_reads
    from tagdust_tpu.io.fastq import SeqReader
    from tagdust_tpu.model import init_model_bag
    from tagdust_tpu.stats import get_sequence_stats

    barread3 = "--scenario" in sys.argv and "barread3" in sys.argv

    with tempfile.TemporaryDirectory() as cwd:
        if barread3:
            # the paired scenario's read-1 file: no barcodes, linkers on
            # both ends (gold_tpu_hw.py:run_paired_scenario)
            run_cli(
                "simreads",
                [EDITTAG, "-seed", "42", "-sim_barnum", "0",
                 "-sim_5seq", "GGGGGGG", "-sim_3seq", "TTTTTTT",
                 "-sim_readlen", "20", "-sim_readlen_mod", "0",
                 "-sim_numseq", "10000", "-sim_endloss", "0",
                 "-sim_random_frac", "0.1", "-o", "b2.fq",
                 "-sim_error_rate", "0.02"],
                cwd, extra_env={"TAGDUST_TPU_RTEST": "1"},
            )
        else:
            simreads(cwd, "b2.fq", extra=("-sim_5seq", "GGGGGGG",
                                          "-sim_3seq", "TTTTTTT"))
        path = os.path.join(cwd, "b2.fq")
        arch = os.path.join(cwd, "b2.fq_tagdust_arch.txt")
        with open(arch) as fh:
            toks = fh.read().split()
        segs = [None] * 10
        for i, tok in enumerate(toks):
            if tok.startswith("-") and tok[1:].isdigit():
                segs[int(tok[1:]) - 1] = toks[i + 1]
        rs = read_structure_from_params(segs)
        ssi = get_sequence_stats(path, rs, 100000, -1, -1)
        mb = init_model_bag(rs, ssi, 0.05, 0.1)

        def load():
            rd = SeqReader(path)
            reads = rd.read_chunk(100000)
            rd.close()
            return reads

        re_, rs_, rp_ = load(), load(), load()
        score_reads(mb, re_, engine_kind="exact")
        os.environ["TAGDUST_TPU_PALLAS"] = "0"
        score_reads(mb, rs_, engine_kind="tpu")
        os.environ["TAGDUST_TPU_PALLAS"] = "1"
        # interpret-mode pallas on a subsample around the worst scan reads
        qe = np.array([r.mapq for r in re_])
        qs = np.array([r.mapq for r in rs_])
        d_scan = np.abs(qe - qs)
        print("scan-vs-exact: max dQ=%.4f argmax=%d  p99=%.4f" % (
            d_scan.max(), d_scan.argmax(), np.percentile(d_scan, 99)))
        worst = np.argsort(d_scan)[-8:]
        sub = [rp_[i] for i in worst]
        score_reads(mb, sub, engine_kind="tpu")
        qp = np.array([r.mapq for r in sub])
        for k, i in enumerate(worst):
            print(
                f"read {i}: len={re_[i].len} Qexact={qe[i]:.3f} "
                f"Qscan={qs[i]:.3f} Qpallas={qp[k]:.3f} name={re_[i].name[:40]}"
            )


if __name__ == "__main__":
    main()
