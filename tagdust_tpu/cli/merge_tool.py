"""merge — paired-end read merger.

Re-implements the reference merge tool (``merge.c:45-688``): for each read
pair, reverse-complement read 2 (quality string reversed), build per-base
probability profiles from the quality values, score every overlap offset of
the two profiles by the summed log inner products, pick the best offset, and
emit a consensus where disagreements take the base with the higher profile
probability and qualities take the per-position maximum; pairs whose overlap
identity falls below the ``-Q`` threshold emit nothing.

Quirk preserved: consensus bases use the lookup "ACGTC" — an N (code 4)
prints as 'C' (``merge.c:572``).
"""

from __future__ import annotations

import math
import sys

import numpy as np

from ..config import parse_args
from ..io.fastq import SeqReader
from ..namecheck import compare_read_names

_OUT_ALPHA = "ACGTC"  # sic (merge.c:572)


def _profiles(seq: np.ndarray, qual: str) -> np.ndarray:
    n = seq.shape[0]
    p = np.empty((n, 4), dtype=np.float64)
    for i in range(n):
        score = 1.0 - 10.0 ** (-(ord(qual[i]) - 33) / 10.0)
        if seq[i] > 3:
            p[i, :] = 0.25
        else:
            p[i, :] = (1.0 - score) / 3.0
            p[i, int(seq[i])] = score
    return p


def overlap_reads(fseq, fqual, rseq, rqual, min_overlap: int, threshold: float):
    """merge.c:399-688. Returns (consensus, qual) or (None, None)."""
    pa = _profiles(fseq, fqual)
    pb = _profiles(rseq, rqual)
    len_f = fseq.shape[0]
    len_r = rseq.shape[0]

    max_score = -math.inf
    best_d = -1
    d = 0
    # offsets starting inside f
    for i in range(len_f):
        if len_f - i > min_overlap and len_r > min_overlap:
            n = min(len_f - i, len_r)
            s = np.sum(np.log(np.sum(pa[i : i + n] * pb[:n], axis=1)))
            if s > max_score:
                max_score = s
                best_d = d
        d += 1
    # offsets starting inside r
    for j in range(len_r):
        if len_f > min_overlap and len_r - j > min_overlap:
            n = min(len_f, len_r - j)
            s = np.sum(np.log(np.sum(pa[:n] * pb[j : j + n], axis=1)))
            if s > max_score:
                max_score = s
                best_d = d
        d += 1

    if best_d < 0:
        return None, None

    out = []
    oq = []
    if best_d < len_f:
        li, lj = best_d, 0
        for i in range(li):
            out.append(_OUT_ALPHA[int(fseq[i])])
            oq.append(fqual[i])
    else:
        li, lj = 0, best_d - len_f
        for j in range(lj):
            out.append(_OUT_ALPHA[int(rseq[j])])
            oq.append(rqual[j])
    ident = 0.0
    aligned = 0.0
    while li != len_f and lj != len_r:
        if fseq[li] == rseq[lj]:
            out.append(_OUT_ALPHA[int(fseq[li])])
            ident += 1.0
        else:
            mx = -math.inf
            nuc = 0
            for c in range(4):
                if pa[li, c] > mx:
                    mx = pa[li, c]
                    nuc = c
                if pb[lj, c] > mx:
                    mx = pb[lj, c]
                    nuc = c
            out.append(_OUT_ALPHA[nuc])
        oq.append(max(fqual[li], rqual[lj]))
        aligned += 1.0
        li += 1
        lj += 1
    for i in range(li, len_f):
        out.append(_OUT_ALPHA[int(fseq[i])])
        oq.append(fqual[i])
    for j in range(lj, len_r):
        out.append(_OUT_ALPHA[int(rseq[j])])
        oq.append(rqual[j])

    if aligned > 0 and ident / aligned >= threshold:
        return "".join(out), "".join(oq)
    return None, None


def main(argv=None) -> None:
    param = parse_args(sys.argv[1:] if argv is None else argv)
    if param.infiles < 2:
        raise SystemExit("Usage: merge <read1> <read2>")
    param.num_query = 1000 if param.rtest else 1000000

    from ..constants import REV_NUC_CODE, SPACER

    readers = [SeqReader(p) for p in param.infile]
    total = 0
    out = sys.stdout
    while True:
        chunks = [r.read_chunk(param.num_query) for r in readers]
        if sum(len(c) for c in chunks) == 0:
            break
        if len(chunks[0]) != len(chunks[1]):
            raise SystemExit("Input files differ in number of entries.")
        if total == 0:
            for c in range(min(1000, len(chunks[0]))):
                if compare_read_names(chunks[0][c].name, chunks[1][c].name):
                    raise SystemExit(
                        "Files seem to contain reads in different order"
                    )
        for r1, r2 in zip(chunks[0], chunks[1]):
            rc = np.empty_like(r2.seq)
            n = r2.seq.shape[0]
            for i in range(n):
                v = r2.seq[n - 1 - i]
                rc[i] = SPACER if v == SPACER else REV_NUC_CODE[int(v)]
            rq = r2.qual[::-1] if r2.qual else ""
            cons, cq = overlap_reads(
                r1.seq, r1.qual or "", rc, rq, param.minlen,
                param.confidence_threshold,
            )
            if cons:
                out.write(f"@{r1.name}\n{cons}\n+\n{cq}\n")
        total += len(chunks[0])
    for r in readers:
        r.close()


if __name__ == "__main__":
    main()
