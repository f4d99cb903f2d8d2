"""Batch orchestration over the DP engines: bucketing, scoring, extraction.

Plays the role of the reference's ``run_pHMM`` thread fan-out
(``barcode_hmm.c:1895-2029``): score every read, convert scores to Q, decode
labels, extract, then run the artifact/DUST filters.  Reads are bucketed by
length so each engine call sees a rectangular ``[B, L]`` batch; per-read
results are independent of the bucketing, exactly as the reference results
are independent of its thread split.

The thread-slice geometry (``interval = numseq/num_threads``,
``barcode_hmm.c:1911-1922``) is still emulated where it is observable: the
artifact filter's 4-wide batching has a per-slice remainder path
(``barcode_hmm.c:2496-2579``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..constants import EXTRACT_SUCCESS
from ..extract import compute_q, extract_batch
from ..filters import dust_reads, match_to_reference
from ..io.fastq import Read
from ..model import ModelBag
from ..strict import fallback
from .exact import ExactEngine

_F32 = np.float32


def thread_slices(numseq: int, num_threads: int) -> List[tuple]:
    """barcode_hmm.c:1911-1922."""
    interval = int(float(numseq) / float(num_threads))
    slices = [(t * interval, t * interval + interval) for t in range(num_threads)]
    s, _ = slices[-1]
    slices[-1] = (s, numseq)
    return slices


def _build_batches(reads: List[Read], matchstart: int, matchend: int):
    """Group read indices by effective DP length; build [B, L+1] buffers with
    the position after the subsequence (terminator 'A' or the next real
    char), as read by the backward pass."""
    buckets: Dict[int, List[int]] = {}
    for idx, r in enumerate(reads):
        L = r.len
        if matchstart != -1 or matchend != -1:
            L = matchend - matchstart
        buckets.setdefault(L, []).append(idx)
    out = []
    for L, idxs in buckets.items():
        B = len(idxs)
        seqs = np.zeros((B, L + 1), dtype=np.uint8)
        for bi, idx in enumerate(idxs):
            r = reads[idx]
            if matchstart != -1 or matchend != -1:
                sub = r.seq[matchstart : matchend + 1]
                seqs[bi, : sub.shape[0]] = sub
            else:
                seqs[bi, : r.len] = r.seq
        out.append((L, idxs, seqs))
    return out


_ENGINE_CACHE: dict = {}


def get_engine(mb: ModelBag, kind: str):
    key = (id(mb), kind)
    if key not in _ENGINE_CACHE:
        if kind == "tpu":
            from .tpu import TpuEngine

            _ENGINE_CACHE[key] = TpuEngine(mb)
        else:
            _ENGINE_CACHE[key] = ExactEngine(mb)
    return _ENGINE_CACHE[key]


def score_reads(
    mb: ModelBag,
    reads: List[Read],
    matchstart: int = -1,
    matchend: int = -1,
    want_labels: bool = True,
    engine: Optional[ExactEngine] = None,
    engine_kind: str = "exact",
):
    """backward + posterior decode + Q for every read; stores mapq (and
    labels) on the reads.  Mirrors do_label_thread / do_probability_estimation
    (barcode_hmm.c:2174-2340)."""
    if engine_kind == "tpu":
        return _score_reads_tpu(mb, reads, matchstart, matchend, want_labels)
    eng = engine or get_engine(mb, "exact")
    for L, idxs, seqs in _build_batches(reads, matchstart, matchend):
        if L <= 0:
            for idx in idxs:
                reads[idx].mapq = float("nan")
            continue
        res = eng.run_batch(seqs, L)
        q = compute_q(res.f_score, res.r_score, res.bar_prob)
        for bi, idx in enumerate(idxs):
            reads[idx].mapq = float(q[bi])
            if want_labels:
                reads[idx].labels = res.labels[bi]


def _mesh_scorer(eng, use_pallas: bool, batch: int):
    """Cached ShardedScorer over all local devices (production multi-chip
    path — the TPU analogue of run_pHMM's thread fan-out, with psum-reduced
    outcome counters).  Returns None on single-device rigs, when the batch
    is too small to fill every chip's tile, or when disabled via
    TAGDUST_TPU_MESH=0."""
    import jax

    if os.environ.get("TAGDUST_TPU_MESH", "1") == "0":
        return None
    n = len(jax.devices())
    if n < 2 or batch < n * (256 if use_pallas else 1):
        return None
    cache = getattr(eng, "_mesh_scorers", None)
    if cache is None:
        cache = eng._mesh_scorers = {}
    if use_pallas not in cache:
        from ..parallel.mesh import ShardedScorer, make_mesh

        cache[use_pallas] = ShardedScorer(
            eng, make_mesh(), use_pallas=use_pallas
        )
    return cache[use_pallas]


def _run_sharded(scorer, eng, seqs, lens_arr, want_labels):
    """Score one padded batch over the device mesh; slices so the per-shard
    backward stack stays inside the same HBM budget as the one-chip path."""
    from .tpu import TpuBatchResult

    B, Lp = seqs.shape
    if scorer.use_pallas:
        dec = eng._grouped_decomposition()
        if dec is not None:
            Sp = 128 * len(dec["spans"])
        else:
            Sp = (eng.lat.S + 127) // 128 * 128
        per_read = (Lp + 1) * (Sp + 128) * 4
        gran = scorer.n * 256
        max_b = max(gran, eng._PALLAS_STACK_BYTES * scorer.n // per_read
                    // gran * gran)
    else:
        max_b = B
    parts = [[] for _ in range(5)]
    for s in range(0, B, max_b):
        nb = min(max_b, B - s)
        out = scorer.run(seqs[s : s + nb], lens_arr[s : s + nb])
        for i in range(5):
            if i == 3 and not want_labels:
                continue  # skip the device->host label transfer
            parts[i].append(np.asarray(out[i])[:nb])
    cat = lambda p: p[0] if len(p) == 1 else np.concatenate(p)  # noqa: E731
    return TpuBatchResult(
        f_score=cat(parts[0]),
        r_score=cat(parts[1]),
        bar_prob=cat(parts[2]),
        labels=cat(parts[3]) if want_labels else None,
        mapq=cat(parts[4]),
    )


def _score_reads_tpu(mb, reads, matchstart, matchend, want_labels=True):
    """TPU path: one padded rectangular batch per chunk (length bucketed to
    multiples of 32 for compile-cache reuse; batch padded to powers of two
    up to 32k, then 32k granules, bounding the compile-cache shapes).

    With more than one visible device the batch is sharded data-parallel
    over the full device mesh (`parallel/mesh.py`), running the same fused
    Pallas pipeline per chip; decisions are device-count-invariant
    (asserted by tests/test_multichip.py)."""
    eng = get_engine(mb, "tpu")
    lens = []
    for r in reads:
        L = r.len
        if matchstart != -1 or matchend != -1:
            L = matchend - matchstart
        lens.append(L)
    if not lens:
        return None
    Lmax = max(lens)
    Lpad = ((Lmax + 31) // 32) * 32
    B = len(reads)
    if B <= 32768:
        Bpad = 1 << max(8, (B - 1).bit_length())
    else:
        Bpad = ((B + 32767) // 32768) * 32768
    seqs = np.zeros((Bpad, Lpad), dtype=np.uint8)
    lens_arr = np.ones(Bpad, dtype=np.int32)
    for i, r in enumerate(reads):
        if matchstart != -1 or matchend != -1:
            sub = r.seq[matchstart:matchend]
            seqs[i, : sub.shape[0]] = sub
        else:
            seqs[i, : r.len] = r.seq
        lens_arr[i] = lens[i]
    if Bpad > B:
        # pad with copies of read 0 (zero rows can be impossible reads ->
        # deliberate NaN Q in discarded rows, hostile to jax_debug_nans)
        seqs[B:] = seqs[0]
        lens_arr[B:] = lens_arr[0]
    # TAGDUST_TPU_PALLAS=0 forces the XLA scan flavor (same lattice, same
    # decisions — used by CPU test rigs where interpret-mode Pallas is slow)
    use_pallas = os.environ.get("TAGDUST_TPU_PALLAS", "1") == "1" and Lpad <= 4096
    scorer = _mesh_scorer(eng, use_pallas, B)
    try:
        if scorer is not None:
            res = _run_sharded(scorer, eng, seqs, lens_arr, want_labels)
        elif use_pallas:
            res = eng.run_batch_pallas(seqs, lens_arr, want_labels=want_labels)
        else:
            res = eng.run_batch(seqs, lens_arr)
    except Exception as e:  # noqa: BLE001 — loud downgrade, strict re-raise
        fallback(
            "pallas-scorer",
            e,
            "device scoring pipeline failed; scoring on the single-device "
            "XLA scan engine (~17x slower)",
        )
        res = eng.run_batch(seqs, lens_arr)
    for i, r in enumerate(reads):
        r.mapq = float(res.mapq[i])
        if res.labels is not None:
            r.labels = res.labels[i]
    return res.labels[:B] if res.labels is not None else None


def run_get_label(
    mb: ModelBag,
    rs,
    reads: List[Read],
    param,
    confidence_threshold: float,
    contaminants=None,
) -> None:
    """MODE_GET_LABEL (do_label_thread, barcode_hmm.c:2269-2360)."""
    kind = "tpu" if getattr(param, "engine", "auto") == "tpu" else "exact"
    labels_mat = score_reads(
        mb, reads, param.matchstart, param.matchend, want_labels=True,
        engine_kind=kind,
    )
    # extraction is a vectorised pass over the [B, Lpad+1] label matrix
    # instead of a per-base Python walk per read (both engines; equality
    # with the per-read extract_read path is asserted by tests).  Moderate
    # slices keep the numpy temporaries in reused (warm) malloc blocks —
    # first-touch page faults on fresh huge buffers are expensive on some
    # hosts.
    SL = 16384
    for s in range(0, len(reads), SL):
        grp = reads[s : s + SL]
        if labels_mat is not None:
            mat = labels_mat[s : s + SL]
        else:
            # exact engine: per-read label arrays -> one padded matrix
            wid = max(
                (r.labels.shape[0] if r.labels is not None else 1)
                for r in grp
            )
            mat = np.zeros((len(grp), wid), dtype=np.int32)
            for i, r in enumerate(grp):
                if r.labels is not None:
                    mat[i, : r.labels.shape[0]] = r.labels
        extract_batch(
            mb,
            rs,
            grp,
            mat,
            param.minlen,
            confidence_threshold,
            param.matchstart,
            param.matchend,
        )
    _apply_filters(reads, param, contaminants)


def run_rna_dust(reads: List[Read], param, contaminants=None) -> None:
    """MODE for pure R:N architectures (do_rna_dust, barcode_hmm.c:2370-2395)."""
    for r in reads:
        r.read_type = EXTRACT_SUCCESS
    _apply_filters(reads, param, contaminants)


def _apply_filters(reads: List[Read], param, contaminants) -> None:
    if contaminants is not None:
        on_device = getattr(param, "engine", "auto") == "tpu"
        for s, e in thread_slices(len(reads), param.num_threads):
            match_to_reference(
                reads[s:e], contaminants, param.filter_error, device=on_device
            )
    if param.dust:
        SL = 16384
        for s in range(0, len(reads), SL):
            dust_reads(reads[s : s + SL], param.dust)


def run_get_prob(
    mb: ModelBag, seq_list: List[np.ndarray], engine_kind: str = "exact"
) -> np.ndarray:
    """MODE_GET_PROB for calibration: mapq per raw sequence.

    With ``engine_kind='tpu'`` the threshold is calibrated on the same
    scoring function production uses (and the 400k-read sweep runs on
    device)."""
    reads = [Read(seq=s) for s in seq_list]
    score_reads(mb, reads, want_labels=False, engine_kind=engine_kind)
    return np.array([r.mapq for r in reads], dtype=np.float32)
