"""Probe: where does the barread2 |dQ| come from?  Compares Q from the
exact engine vs the XLA-scan flavor (CPU) vs interpret-mode Pallas on the
barread2 gold scenario, per read.  Diagnostic only."""

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

    with tempfile.TemporaryDirectory() as cwd:
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
