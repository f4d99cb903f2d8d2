"""Q scoring and read extraction from decoded label paths.

* Q score: ``P_wrong = 1 - bar_prob*P(x|M) / (P(x|M)+P(x|R))`` converted to a
  phred-style value clamped to [0, 40] — mirrors ``do_label_thread`` /
  ``do_probability_estimation`` (``barcode_hmm.c:2290-2338``, ``:2192-2233``;
  formula doc ``doc/User-Manual.tex:1325-1336``).
* Extraction walks the per-base label path, decodes barcode / fingerprint
  segments, enforces per-R-segment minimum lengths, and rewrites the read so
  only R bases remain with 65-valued spacers in between — mirrors
  ``extract_reads`` (``barcode_hmm.c:3172-3313``) and ``make_extracted_read``
  (``:3325-3356``).
"""

from __future__ import annotations

import math

import numpy as np

from .constants import (
    EXTRACT_FAIL_ARCHITECTURE_MISMATCH,
    EXTRACT_FAIL_BAR_FINGER_NOT_FOUND,
    EXTRACT_FAIL_READ_TOO_SHORT,
    EXTRACT_SUCCESS,
    SPACER,
)
from .io.fastq import Read
from .logsum import NEG_INF, logsum
from .model import ModelBag

_F32 = np.float32


def compute_q(f_score, r_score, bar_prob) -> np.ndarray:
    """Vectorised Q computation (barcode_hmm.c:2298-2338), float32 exact.

    Transcendentals go through libm (math.exp/math.log10) per element to
    match glibc bit-for-bit after the 1-p cancellation."""
    f_score = np.asarray(f_score, dtype=np.float32)
    pbest = logsum(np.full_like(f_score, NEG_INF), f_score)
    pbest = logsum(pbest, np.asarray(r_score, dtype=np.float32))
    # ri->bar_prob is a double (io.h:86): the numerator and the subtraction
    # are evaluated in double precision before the float narrowing at the
    # scaledprob2prob() argument (barcode_hmm.c:2327)
    d64 = (
        np.asarray(bar_prob, dtype=np.float64)
        + f_score.astype(np.float64)
        - pbest.astype(np.float64)
    )
    d = d64.astype(np.float32)
    q = np.empty(d.shape, dtype=np.float32)
    for i, dv in enumerate(np.ravel(d)):
        e = 0.0 if np.isneginf(dv) else float(_F32(math.exp(float(dv))))
        p_wrong = float(_F32(1.0 - e))
        if p_wrong == 0.0:
            qq = _F32(40.0)
        elif p_wrong == 1.0:
            qq = _F32(0.0)
        elif p_wrong < 0.0 or math.isnan(p_wrong):
            qq = _F32(float("nan"))
        else:
            qq = _F32(-10.0 * math.log10(p_wrong))
        q.ravel()[i] = qq
    return q


def extract_read(
    mb: ModelBag,
    rs,
    read: Read,
    labels: np.ndarray,
    minlen: int,
    confidence_threshold: float,
    matchstart: int = -1,
    matchend: int = -1,
) -> None:
    """Apply extract_reads (barcode_hmm.c:3172-3313) to one read in place.

    ``labels`` holds label indices for positions 0..len of the decoded
    subsequence (index 0 is the pre-sequence slot)."""
    L = read.len
    offset = 0
    if matchstart != -1 or matchend != -1:
        offset = matchstart
        L = matchend - matchstart

    required_finger_len = 0
    for j in range(rs.num_segments):
        if rs.types[j] == "F":
            required_finger_len += len(rs.seqs[j][0])

    if confidence_threshold <= read.mapq:
        fingerlen = 0
        key = 0
        bar = -1
        mem = -1
        hmm_has_barcode = 0
        too_short = 0
        in_read = 0
        s_pos = 0
        lab_tab = mb.label
        for j in range(L):
            c1 = int(lab_tab[int(labels[j + 1])])
            c2 = c1 & 0xFFFF
            c3 = (c1 >> 16) & 0x7FFF
            t = rs.types[c2]
            if t == "F":
                fingerlen += 1
                key = (key << 2) | (int(read.seq[j + offset]) & 0x3)
            if t == "B":
                hmm_has_barcode = 1
                bar = c3
                if bar == rs.numseq_in_segment(c2) - 1:
                    hmm_has_barcode = -1
                mem = c2
            if t == "R":
                s_pos += 1
                in_read = 1
            else:
                if in_read and s_pos < minlen:
                    too_short = 1
                    break
                in_read = 0
                s_pos = 0
        if in_read and s_pos < minlen:
            too_short = 1

        if not too_short:
            if hmm_has_barcode == -1:
                read.read_type = EXTRACT_FAIL_BAR_FINGER_NOT_FOUND
            elif hmm_has_barcode and required_finger_len:
                if fingerlen == required_finger_len and bar != -1:
                    _make_extracted(mb, rs, read, labels)
                    read.barcode = (mem << 16) | bar
                    read.fingerprint = (key << 8) | min(required_finger_len, 255)
                    read.read_type = EXTRACT_SUCCESS
                else:
                    read.read_type = EXTRACT_FAIL_BAR_FINGER_NOT_FOUND
            elif hmm_has_barcode:
                if bar != -1:
                    _make_extracted(mb, rs, read, labels)
                    read.barcode = (mem << 16) | bar
                    read.read_type = EXTRACT_SUCCESS
                else:
                    read.read_type = EXTRACT_FAIL_BAR_FINGER_NOT_FOUND
            elif required_finger_len:
                if fingerlen == required_finger_len:
                    _make_extracted(mb, rs, read, labels)
                    read.fingerprint = (key << 8) | min(required_finger_len, 255)
                    read.read_type = EXTRACT_SUCCESS
                else:
                    read.read_type = EXTRACT_FAIL_BAR_FINGER_NOT_FOUND
            else:
                _make_extracted(mb, rs, read, labels)
                read.read_type = EXTRACT_SUCCESS
        else:
            read.read_type = EXTRACT_FAIL_READ_TOO_SHORT
    else:
        read.read_type = EXTRACT_FAIL_ARCHITECTURE_MISMATCH


def _make_extracted(mb: ModelBag, rs, read: Read, labels: np.ndarray) -> None:
    """make_extracted_read (barcode_hmm.c:3325-3356): non-R bases -> spacer.

    Walks the *full* read length; label slots beyond the decoded range read
    as 0 (matching the zero-initialised label buffer in the reference)."""
    L = read.len
    lab_tab = mb.label
    seq = read.seq
    qual = list(read.qual) if read.qual is not None else None
    new_seq = np.empty(L, dtype=np.uint8)
    for j in range(L):
        li = int(labels[j + 1]) if j + 1 < labels.shape[0] else 0
        c2 = int(lab_tab[li]) & 0xFFFF
        if rs.types[c2] == "R":
            new_seq[j] = seq[j]
            if qual is not None:
                qual[j] = read.qual[j]
        else:
            new_seq[j] = SPACER
            if qual is not None:
                qual[j] = chr(SPACER)
    read.seq = new_seq
    if qual is not None:
        read.qual = "".join(qual)
