"""TPU DP engine: batched scaled forward/backward as MXU matmul scans.

Consumes the closure-compiled lattice (`engine/lattice.py`).  One DP step for
a batch of reads is a single dense matmul on the MXU:

    W[b, (s,c)] = v[b,s] * onehot(c_b)[c]        (VPU outer product)
    v[i]        = W @ A'                          (A': [5S, S])

i.e. the per-base transition-matrix selection is folded into a one-hot
expansion of the source vector, so the whole step is one
``[B,5S] x [5S, S+K]`` contraction (the K extra columns carry the
entry-only flows used for the barcode probability).  The backward pass uses
the transposed stack over the reversed sequence; per-position label
posteriors, the optimal-accuracy label DP (max-plus over the
label-compatibility matrix, mirroring ``barcode_hmm.c:4451-4514``) and the
traceback all stay on device.  Per-step max-rescaling keeps linear-space
probabilities in float32 range; per-read log-scales accumulate alongside.

Ragged batches: reads are right-padded; padded steps freeze the carry via
masks, so one compiled program serves a whole length bucket.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .lattice import Lattice, compile_lattice
from ..model import ModelBag


@dataclass
class TpuBatchResult:
    f_score: np.ndarray  # [B] log P(x|M), natural log
    r_score: np.ndarray  # [B] log P(x|R)
    bar_prob: np.ndarray  # [B] log barcode probability
    labels: np.ndarray  # [B, Lpad+1] int32 label path
    mapq: np.ndarray  # [B] Q values
    dust: Optional[np.ndarray] = None  # [B, 2] device DUST (extracted, raw)


def dust_scores_device(seqs, labels, lens, is_r_label):
    """Device replica of the DUST score (filters._dust_scores_core /
    barcode_hmm.c:2424-2453) over the first-64nt window, returning BOTH
    variants per read as [B, 2] float32:

    * column 0: on the extracted sequence (non-R-labelled bases = spacers) —
      what the filter sees for successfully extracted reads;
    * column 1: on the raw sequence — what it sees for rejected reads.

    The host picks per read by the post-extraction outcome.  Keys use the
    same 2-bit packing as the host core (pair counts are invariant under key
    relabeling); counts come from a one-hot [B, pos, 64] reduction XLA fuses
    onto the MXU.
    """
    B, Lp = seqs.shape
    W = 64
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    ln = jnp.minimum(lens, W).astype(jnp.int32)[:, None]
    if Lp >= W:
        arr = seqs[:, :W]
        lab = labels[:, 1 : W + 1]
    else:
        arr = jnp.pad(seqs, ((0, 0), (0, W - Lp)))
        lab = jnp.pad(labels, ((0, 0), (0, W - Lp)))[:, 1 : W + 1]
    non_r = jnp.take(
        jnp.asarray(~is_r_label), jnp.clip(lab, 0, is_r_label.shape[0] - 1)
    )
    beyond = pos >= ln
    b2 = (arr & 3).astype(jnp.int32)
    key = jnp.zeros((B, W), dtype=jnp.int32)
    key = key.at[:, 2:].set((b2[:, 2:] << 4) | (b2[:, 1:-1] << 2) | b2[:, :-2])

    def one(is_sp):
        real = ~is_sp
        lead = jnp.where(
            real.any(axis=1), jnp.argmax(real, axis=1), ln[:, 0]
        ).astype(jnp.int32)
        degenerate = (lead + 1) >= lens
        after = pos >= (lead + 2)[:, None]
        sp_after = is_sp & after
        first_sp = jnp.where(
            sp_after.any(axis=1), jnp.argmax(sp_after, axis=1), W
        ).astype(jnp.int32)
        counted = after & (pos < first_sp[:, None])
        oh = jax.nn.one_hot(jnp.where(counted, key, W + 1), W, dtype=jnp.float32)
        c = jnp.sum(oh, axis=1)  # [B, 64]
        s = jnp.sum(c * (c - 1.0) * 0.5, axis=1)
        ntrip = counted.sum(axis=1).astype(jnp.float32)
        c_final = lead.astype(jnp.float32) + 2.0 + ntrip
        denom = jnp.where(c_final == 3.0, jnp.nan, c_final - 3.0)
        return jnp.where(degenerate, 0.0, s / denom * 10.0)

    d_ext = one(non_r | beyond)
    d_raw = one(beyond)
    return jnp.stack([d_ext, d_raw], axis=1)


def nibble_uploads() -> bool:
    """Ship sequence uploads nibble-packed (2 bases/byte)?  Default on;
    TAGDUST_TPU_NIBBLE=0 reverts to plain uint8 uploads (A/B lever — the
    win depends on the host->device link's bytes/s vs the packing cost)."""
    return os.environ.get("TAGDUST_TPU_NIBBLE", "1") == "1"


def unpack_nibbles_device(sp, Lp: int):
    """Device inverse of TpuEngine.pack_nibbles: [B, Lp/2] packed uint8 ->
    [B, Lp] codes.  THE one unpack — the layout (base 2k in the low nibble,
    2k+1 in the high) must match the host pack everywhere."""
    B = sp.shape[0]
    lo = sp & 0xF
    hi = sp >> 4
    return jnp.stack([lo, hi], axis=2).reshape(B, Lp)


def _expand(v, oh, S):
    """[B,S] x [B,5] -> [B, 5S] with layout (c, s)."""
    return (oh[:, :, None] * v[:, None, :]).reshape(v.shape[0], 5 * S)


def backward_scan(Abwd, end, S, onehot, active, with_stack):
    """THE rescaled backward recurrence over the closure lattice — the one
    definition shared by the production scorer (_forward_backward), the
    detection scorer (_backward_scores) and the distributed Baum-Welch
    counts (parallel/mesh.py) so a numerics change (the m>0 clamp, the
    1e-38 floor) can never diverge between them.

    Returns (bfin, bls_fin, bwd_stack, bls_stack); the stacks are None
    when ``with_stack`` is False (score-only consumers skip the HBM
    round trip)."""
    B = onehot.shape[0]

    def bwd_step(carry, x):
        bv, ls = carry  # [B,S], [B]
        oh, act = x
        bn = _expand(bv, oh, S) @ Abwd  # [B,S]
        m = jnp.max(bn, axis=1, keepdims=True)
        m = jnp.where(m > 0, m, 1.0)
        bn = bn / m
        nls = ls + jnp.log(m[:, 0])
        bv = jnp.where(act[:, None], bn, bv)
        nls = jnp.where(act, nls, ls)
        return (bv, nls), ((bv, nls) if with_stack else None)

    b0 = jnp.broadcast_to(end[None, :], (B, S))
    ls0 = jnp.zeros((B,), jnp.float32)
    xs_b = (jnp.swapaxes(onehot, 0, 1)[::-1], active.T[::-1])
    (bfin, bls_fin), ys = jax.lax.scan(bwd_step, (b0, ls0), xs_b)
    if not with_stack:
        return bfin, bls_fin, None, None
    bstack, blstack = ys
    bwd_stack = jnp.concatenate([bstack[::-1][1:], b0[None, :, :]], axis=0)
    bls_stack = jnp.concatenate([blstack[::-1][1:], ls0[None, :]], axis=0)
    return bfin, bls_fin, bwd_stack, bls_stack


def _forward_backward(lat_dev, seqs, lens):
    """Core jitted computation. seqs [B, Lpad] int32, lens [B] int32."""
    Afwd = lat_dev["Afwd"]  # [5S, S+K]  (fused A | Aent)
    Abwd = lat_dev["Abwd"]  # [5S, S]    (transposed stack)
    end = lat_dev["end"]  # [S]
    Lmap = lat_dev["Lmap"]  # [S, H+1]
    ent_state = lat_dev["ent_state"]  # [K]
    tmat = lat_dev["tmat"]  # [H, H]
    bg = lat_dev["bg"]  # [5]
    avg_len = lat_dev["avg_len"]
    begin = lat_dev["begin"]
    S = lat_dev["S"]
    K = lat_dev["K"]

    B, Lpad = seqs.shape
    H = tmat.shape[0]

    pos = jnp.arange(Lpad)
    active = pos[None, :] < lens[:, None]  # [B, Lpad]
    onehot = jax.nn.one_hot(seqs, 5, dtype=jnp.float32)  # [B, Lpad, 5]

    def expand(v, oh):
        return _expand(v, oh, S)

    # ---------------- backward scan (reversed) ----------------
    bfin, bls_fin, bwd_stack, bls_stack = backward_scan(
        Abwd, end, S, onehot, active, with_stack=True
    )
    ls0 = jnp.zeros((B,), jnp.float32)  # forward scan's initial log-scale

    logP_b = jnp.log(jnp.maximum(bfin[:, begin], 1e-38)) + bls_fin

    # ------- forward scan: posterior reduction + fused label DP -------
    # (the label DP is the optimal-accuracy recursion of barcode_hmm.c:4451,
    #  fused into the forward sweep to avoid materialising the posterior
    #  stack)
    ent_sel = lat_dev["ent_sel"]  # [S, K] one-hot (MXU gather of bwd values)
    jidx = jnp.arange(H, dtype=jnp.int32)[None, :]

    def fwd_step(carry, x):
        v, ls, tp, dp = carry  # [B,S], [B], [B,K], [B,H]
        oh, act, bw, bls = x
        W = expand(v, oh)
        Y = W @ Afwd  # [B, S+K]
        vn = Y[:, :S]
        ve = Y[:, S:]
        # clamp: on inactive (padded) steps the stale scales can make the
        # exponent overflow; inf * 0 posteriors would produce masked-away
        # NaNs that still trip jax_debug_nans (active values are << e^60)
        w = jnp.exp(jnp.minimum(ls + bls - logP_b, 60.0))  # [B]
        post = vn * bw
        plab = (post @ Lmap) * w[:, None]
        tpn = tp + ve * (bw @ ent_sel) * w[:, None]
        m = jnp.max(vn, axis=1, keepdims=True)
        m = jnp.where(m > 0, m, 1.0)
        vn2 = vn / m
        nls = ls + jnp.log(m[:, 0])
        v = jnp.where(act[:, None], vn2, v)
        nls = jnp.where(act, nls, ls)
        tp = jnp.where(act[:, None], tpn, tp)
        # label DP step
        scores = dp[:, :, None] * tmat[None, :, :]  # [B,c,j]
        mv = jnp.argmax(scores, axis=1).astype(jnp.int32)
        mx = jnp.max(scores, axis=1)
        diag = dp * jnp.diagonal(tmat)[None, :]
        mv = jnp.where(diag == mx, jidx, mv)
        ndp = plab[:, :H] + mx
        dp = jnp.where(act[:, None], ndp, dp)
        mv = jnp.where(act[:, None], mv, jidx)
        return (v, nls, tp, dp), mv.astype(jnp.int8)

    v0 = jnp.zeros((B, S), jnp.float32).at[:, begin].set(1.0)
    tp0 = jnp.zeros((B, K), jnp.float32)
    dp0 = jnp.zeros((B, H), jnp.float32)
    xs_f = (jnp.swapaxes(onehot, 0, 1), active.T, bwd_stack, bls_stack)
    (vfin, fls_fin, total_ent, dpfin), path = jax.lax.scan(
        fwd_step, (v0, ls0, tp0, dp0), xs_f
    )
    f_lin = jnp.maximum(vfin @ end, 1e-38)
    f_log = jnp.log(f_lin) + fls_fin
    last = jnp.argmax(dpfin, axis=1).astype(jnp.int32)

    def tb_step(move, pth):
        nm = jnp.take_along_axis(pth.astype(jnp.int32), move[:, None], axis=1)[:, 0]
        return nm, nm

    _, lab_rev = jax.lax.scan(tb_step, last, path[::-1])
    labels = jnp.concatenate([lab_rev[::-1], last[None, :]], axis=0).T

    # ---------------- bar_prob & Q ----------------
    bar_log = lat_dev["bar_fn"](total_ent)

    bg_l = jnp.log(bg)
    r_per = jnp.log1p(-1.0 / avg_len)
    r_log = (
        jnp.sum(jnp.where(active, bg_l[seqs], 0.0), axis=1)
        + lens.astype(jnp.float32) * r_per
        + jnp.log(1.0 / avg_len)
    )

    mapq = _q_from_scores(f_log, r_log, bar_log)

    return f_log, r_log, bar_log, labels, mapq


def _backward_scores(lat_dev, seqs, lens):
    """Backward-only log P(x|M) — the device MODE_ARCH_COMP scorer
    (do_arch_comparison, barcode_hmm.c:2111-2148): just the backward scan of
    ``_forward_backward``, no posterior/label work and no per-step stacks,
    so architecture detection costs one sweep per candidate."""
    Abwd = lat_dev["Abwd"]
    end = lat_dev["end"]
    begin = lat_dev["begin"]
    S = lat_dev["S"]
    B, Lpad = seqs.shape
    pos = jnp.arange(Lpad)
    active = pos[None, :] < lens[:, None]
    onehot = jax.nn.one_hot(seqs, 5, dtype=jnp.float32)

    bfin, bls_fin, _, _ = backward_scan(
        Abwd, end, S, onehot, active, with_stack=False
    )
    return jnp.log(jnp.maximum(bfin[:, begin], 1e-38)) + bls_fin


def _f32_precision_wrap(fn):
    """Make the XLA-scan flavor honor TAGDUST_TPU_PRECISION like the
    Pallas kernels do (pallas_kernel._mxu_precision): under
    "high"/"highest" every jnp matmul traced inside `fn` runs f32-clean
    instead of the TPU default bf16-input passes.  This is what lets
    scripts/gold_tpu_hw.py pin pallas-vs-scan agreement at f32 ON THE
    CHIP, separating kernel-formulation error from bf16 truncation."""
    name = os.environ.get("TAGDUST_TPU_PRECISION", "default").lower()
    if name not in ("high", "highest"):
        return fn

    @functools.wraps(fn)
    def wrapped(*args):
        with jax.default_matmul_precision("float32"):
            return fn(*args)

    return wrapped


def _q_from_scores(f_log, r_log, bar_log):
    """Q exactly as do_label_thread computes it (barcode_hmm.c:2318-2336):
    p_wrong==0 -> 40, ==1 -> 0, else -10*log10(p_wrong) UNCLAMPED — Q above
    40 (and NaN for a negative p_wrong) flows through like the C double
    math.  An upper clamp here cost |dQ| up to 3.6 vs the exact engine on
    high-confidence reads (found by scripts/gold_tpu_hw.py on hardware)."""
    denom = jnp.logaddexp(f_log, r_log)
    p_wrong = 1.0 - jnp.exp(bar_log + f_log - denom)
    return jnp.where(
        p_wrong == 0.0,
        40.0,
        jnp.where(p_wrong == 1.0, 0.0, -10.0 * jnp.log10(p_wrong)),
    )


class TpuEngine:
    """Batched TPU scorer for one compiled model."""

    def __init__(self, mb: ModelBag, lattice: Optional[Lattice] = None):
        self.mb = mb
        lat = lattice or compile_lattice(mb)
        self.lat = lat
        S = lat.S
        K = lat.Aent.shape[2]
        ent_state = np.zeros(K, dtype=np.int32)
        k = 0
        si = 0
        for j, m in enumerate(mb.models):
            for f in range(m.num_hmms):
                if m.num_hmms > 1:
                    ent_state[k] = si  # M(j,f,0)
                    ent_state[k + 1] = si + 1  # I(j,f,0)
                    k += 2
                si += 2 * m.num_cols
        Lmap = np.zeros((S, lat.num_labels + 1), dtype=np.float32)
        for s in range(S):
            Lmap[s, lat.state_label[s]] = 1.0
        ent_sel = np.zeros((S, K), dtype=np.float32)
        for k in range(K):
            ent_sel[ent_state[k], k] = 1.0

        # fused step matrices, layout (c, s) on the contraction axis
        # Afwd[(c,s), t] = A[c][s, t] ; extra K columns = Aent
        Afwd = np.concatenate([lat.A, lat.Aent], axis=2)  # [5, S, S+K]
        Afwd = Afwd.reshape(5 * S, S + K)
        # Abwd[(c,t), s] = A[c][s, t]
        Abwd = np.swapaxes(lat.A, 1, 2).reshape(5 * S, S)

        bar_segments = lat.bar_segments

        def bar_fn(total_ent):
            B = total_ent.shape[0]
            if total_ent.shape[1] == 0:
                return jnp.zeros((B,), jnp.float32)
            per_f = total_ent[:, 0::2] + total_ent[:, 1::2]
            logs = jnp.log(jnp.maximum(per_f, 1e-38))
            out = jnp.zeros((B,), jnp.float32)
            col = 0
            for (lab0, Hn, j) in bar_segments:
                seg = logs[:, col : col + Hn]
                norm = jax.scipy.special.logsumexp(seg, axis=1)
                best = jnp.max(seg[:, : Hn - 1], axis=1) - norm
                out = out + best
                col += Hn
            return jnp.minimum(out, 0.0)

        self._dev = {
            "Afwd": jnp.asarray(Afwd),
            "Abwd": jnp.asarray(Abwd),
            "end": jnp.asarray(lat.end),
            "Lmap": jnp.asarray(Lmap),
            "ent_state": jnp.asarray(ent_state),
            "ent_sel": jnp.asarray(ent_sel),
            "tmat": jnp.asarray(lat.tmatrix),
            "bg": jnp.asarray(lat.background),
            "avg_len": jnp.float32(lat.avg_len),
            "begin": lat.begin,
            "S": S,
            "K": K,
            "bar_fn": bar_fn,
        }
        self._jit = jax.jit(
            _f32_precision_wrap(functools.partial(_forward_backward, self._dev))
        )

    def backward_scores(self, seqs: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """[B] backward-only log P(x|M) for architecture auto-detection
        (MODE_ARCH_COMP, test_architectures.c:182-184) — one masked backward
        sweep on device, no labels, no posterior stack.

        Served by the score-only flavor of the fused Pallas backward kernel
        (the flagship production kernel with the stack spill disabled), under
        the same batch tiling as production; `TAGDUST_TPU_PALLAS=0` or reads
        past the 4096nt kernel bound take the XLA scan recurrence — both
        compute the shared `backward_scan` numerics (parity asserted by
        tests/test_pallas_kernel.py)."""
        B, Lp = seqs.shape
        use_pallas = (
            os.environ.get("TAGDUST_TPU_PALLAS", "1") == "1" and Lp <= 4096
        )
        if use_pallas:
            try:
                return self._backward_scores_pallas(seqs, lens)
            except Exception as e:  # noqa: BLE001 — loud downgrade
                from ..strict import fallback

                fallback(
                    "bscore-pallas",
                    e,
                    "score-only Pallas backward failed; arch detection "
                    "scoring on the XLA scan recurrence",
                )
        if not hasattr(self, "_bscore_jit"):
            self._bscore_jit = jax.jit(
                _f32_precision_wrap(
                    functools.partial(_backward_scores, self._dev)
                )
            )
        out = self._bscore_jit(
            jnp.asarray(seqs.astype(np.int32)),
            jnp.asarray(lens.astype(np.int32)),
        )
        return np.asarray(out)

    def _backward_scores_pallas(self, seqs: np.ndarray, lens: np.ndarray):
        B, Lp = seqs.shape
        BT = self.default_batch_tile()
        key = ("bscore", Lp, BT)
        if not hasattr(self, "_pallas_cache"):
            self._pallas_cache = {}
        if key not in self._pallas_cache:
            from . import pallas_kernel as PK

            lat = self.lat
            call, _, _, _ = PK.make_fused_scorer(
                lat.A,
                lat.Uent,
                lat.Eent,
                lat.end,
                np.asarray(self._dev["Lmap"]),
                np.asarray(self._dev["ent_sel"]),
                lat.begin,
                Lp,
                BT,
                interpret=jax.default_backend() == "cpu",
                tmatrix=np.asarray(self._dev["tmat"]),
                grouped=self._grouped_decomposition(),
                score_only=True,
            )

            def score(seqs_i32, lens_i32):
                return call(seqs_i32, lens_i32)

            self._pallas_cache[key] = jax.jit(_f32_precision_wrap(score))
        fn = self._pallas_cache[key]
        pad = (-B) % BT
        if pad:
            # copies of read 0, not zero rows — see run_batch_pallas
            seqs = np.concatenate(
                [seqs, np.broadcast_to(seqs[:1], (pad, Lp))], axis=0
            )
            lens = np.concatenate([lens, np.broadcast_to(lens[:1], (pad,))])
        out = fn(
            jnp.asarray(seqs.astype(np.int32)),
            jnp.asarray(lens.astype(np.int32)),
        )
        return np.asarray(out)[:B]

    def run_batch(self, seqs: np.ndarray, lens: np.ndarray) -> TpuBatchResult:
        """seqs [B, Lpad] uint8 (padded with 0), lens [B]."""
        f_log, r_log, bar_log, labels, mapq = self._jit(
            jnp.asarray(seqs.astype(np.int32)), jnp.asarray(lens.astype(np.int32))
        )
        return TpuBatchResult(
            f_score=np.asarray(f_log),
            r_score=np.asarray(r_log),
            bar_prob=np.asarray(bar_log),
            labels=np.asarray(labels),
            mapq=np.asarray(mapq),
        )

    # ---------------- fused Pallas path ----------------
    def default_batch_tile(self) -> int:
        """Per-dispatch batch tile (BT) for the fused kernels.

        Larger tiles amortize the per-grid-step fixed costs (step dispatch,
        base extraction, the label-DP VPU ops that scale sub-linearly with
        BT).  Measured on the chip, flagship arch, Lp=64:
        BT=256 -> 860k, BT=512 -> 915k, BT=1024 -> 932k reads/s.  CPU
        interpret mode keeps 256 (tests pad batches to the tile).
        Override: TAGDUST_TPU_BT."""
        bt = os.environ.get("TAGDUST_TPU_BT")
        if bt:
            if jax.default_backend() == "cpu":
                # interpret-mode rigs may shrink below the hardware tile so
                # the streaming/mesh tests stay fast (8-row granularity)
                return max(int(bt) // 8 * 8, 8)
            return max(int(bt) // 256 * 256, 256)
        return 256 if jax.default_backend() == "cpu" else 1024

    def _grouped_decomposition(self):
        """Block-banded step decomposition for large lattices (the Sp^2
        cliff, VERDICT item 5).  Per step the grouped path issues
        5G (blocks) + 5G (entry weights) + G (exits) + 1 MXU tile ops vs
        the dense path's 5*ceil(S/128)^2; engaged when that is a clear
        win.  TAGDUST_TPU_GROUPED=0/1 forces dense/grouped."""
        import os

        if not hasattr(self, "_grouped_cache"):
            mode = os.environ.get("TAGDUST_TPU_GROUPED", "auto")
            dec = None
            if mode != "0":
                from .lattice import grouped_step_decomposition

                dec = grouped_step_decomposition(self.mb, self.lat)
                if dec is not None and mode != "1":
                    G = len(dec["spans"])
                    dense_tiles = -(-self.lat.S // 128)
                    if 11 * G + 1 >= 0.8 * 5 * dense_tiles * dense_tiles:
                        dec = None
            self._grouped_cache = dec
        return self._grouped_cache

    def _get_pallas(self, Lp: int, BT: Optional[int] = None):
        if BT is None:
            BT = self.default_batch_tile()
        key = (Lp, BT)
        if not hasattr(self, "_pallas_cache"):
            self._pallas_cache = {}
        if key not in self._pallas_cache:
            from . import pallas_kernel as PK

            lat = self.lat
            interp = jax.default_backend() == "cpu"
            call, _, _, Hp = PK.make_fused_scorer(
                lat.A,
                lat.Uent,
                lat.Eent,
                lat.end,
                np.asarray(self._dev["Lmap"]),
                np.asarray(self._dev["ent_sel"]),
                lat.begin,
                Lp,
                BT,
                interpret=interp,
                tmatrix=np.asarray(self._dev["tmat"]),
                grouped=self._grouped_decomposition(),
            )
            lat_dev = self._dev
            bg = lat_dev["bg"]
            avg_len = lat_dev["avg_len"]
            bar_fn = lat_dev["bar_fn"]

            # labels fit int8 whenever the label alphabet allows: shrinks the
            # device->host transfer 4x (labels dominate the result bytes)
            lab_dtype = jnp.int8 if self._lab_bytes() == 1 else jnp.int32

            def full(seqs_u8, lens):
                seqs = seqs_u8.astype(jnp.int32)
                f_log, logpb, labels, tp = call(seqs, lens)
                pos = jnp.arange(Lp)
                active = pos[None, :] < lens[:, None]
                bar_log = bar_fn(tp)
                bg_l = jnp.log(bg)
                r_per = jnp.log1p(-1.0 / avg_len)
                r_log = (
                    jnp.sum(jnp.where(active, bg_l[seqs], 0.0), axis=1)
                    + lens.astype(jnp.float32) * r_per
                    + jnp.log(1.0 / avg_len)
                )
                return (
                    f_log,
                    r_log,
                    bar_log,
                    labels.astype(lab_dtype),
                    _q_from_scores(f_log, r_log, bar_log),
                )

            # cache the raw fn too: parallel/mesh.py wraps it per-shard
            # under shard_map (the jit there happens around the shard_map).
            # The raw fn carries the f32 precision pin as well, so the
            # sharded path honours TAGDUST_TPU_PRECISION exactly like the
            # single-device jit (no-op wrapper under default precision).
            wrapped = _f32_precision_wrap(full)
            self._pallas_cache[key] = (jax.jit(wrapped), wrapped, BT)
        return self._pallas_cache[key]

    # HBM budget for the backward stack ((Lp+1) * B * (Sp+128) * 4 bytes):
    # long reads are scored in sub-batches that keep the stack bounded.
    _PALLAS_STACK_BYTES = 2 << 30

    def pallas_stack_bytes_per_read(self, Lp: int) -> int:
        from .pallas_kernel import stack_is_bf16

        dec = self._grouped_decomposition()
        if dec is not None:
            Sp = 128 * len(dec["spans"])
        else:
            Sp = (self.lat.S + 127) // 128 * 128
        sbytes = 2 if stack_is_bf16(jax.default_backend() == "cpu") else 4
        return (Lp + 1) * (Sp * sbytes + 128 * 4)

    def _get_pallas_packed(self, Lp: int, BT: Optional[int] = None):
        """Jitted variant returning ONE uint8 buffer per batch:
        [B, lab_bytes*(Lp+1) + 16] = bitcast labels | bitcast (f, r, bar, q).

        Each device->host fetch over a high-latency link costs a full round
        trip (~26ms on this rig's tunnel) REGARDLESS of size; fetching one
        packed array instead of five cuts the per-window result latency 5x.

        Returns ``(jitted_fn, raw_fn, lab_bytes, BT)``; the raw (unjitted,
        f32-pin-wrapped) fn is what `parallel/mesh.py` wraps per-shard under
        shard_map — the multi-chip streaming path runs the SAME packed
        program per chip.
        """
        # BT is env-overridable (TAGDUST_TPU_BT) and backend-dependent, so
        # the cache key must carry it: a stale packed fn with a different
        # tile would reject (or mis-pad) freshly computed windows
        if BT is None:
            BT = self.default_batch_tile()
        key = ("packed", Lp, BT)
        if not hasattr(self, "_pallas_cache"):
            self._pallas_cache = {}
        if key not in self._pallas_cache:
            _, full, _BT = self._get_pallas(Lp, BT)
            is_r = self._is_r_label()

            def full_packed(seqs_u8, lens):
                f, r, b, lab, q = full(seqs_u8, lens)
                dust = dust_scores_device(
                    seqs_u8.astype(jnp.int32), lab.astype(jnp.int32), lens,
                    is_r,
                )
                sc = jnp.stack([f, r, b, q], axis=1)  # [B, 4] f32
                sc = jnp.concatenate([sc, dust], axis=1)  # [B, 6] f32
                scb = jax.lax.bitcast_convert_type(sc, jnp.uint8).reshape(
                    sc.shape[0], 24
                )
                if lab.dtype == jnp.int8:
                    labb = lab.astype(jnp.uint8)  # values are 0..H, lossless
                else:
                    labb = jax.lax.bitcast_convert_type(
                        lab.astype(jnp.int32), jnp.uint8
                    ).reshape(lab.shape[0], -1)
                return jnp.concatenate([labb, scb], axis=1)

            lab_bytes = self._lab_bytes()
            wrapped = _f32_precision_wrap(full_packed)
            self._pallas_cache[key] = (
                jax.jit(wrapped), wrapped, lab_bytes, BT
            )
        return self._pallas_cache[key]

    def dispatch_pallas(self, seqs: np.ndarray, lens: np.ndarray):
        """Asynchronously dispatch one fused-pipeline batch; returns the
        packed device array WITHOUT blocking — callers overlap host work
        (extraction of the previous window) with device compute and the
        result transfer."""
        B, Lp = seqs.shape
        fn, _, _, BT = self._get_pallas_packed(Lp)
        if B % BT:
            raise ValueError(f"batch {B} not a multiple of the tile {BT}")
        return fn(
            jnp.asarray(seqs.astype(np.uint8)),
            jnp.asarray(lens.astype(np.int32)),
        )

    def required_finger_len(self) -> int:
        """Total F-segment length — delegates to the ONE definition in
        extract.py so the device gate and the host extractors agree."""
        from ..extract import required_finger_length

        return required_finger_length(self.mb.rs)

    def _label_tables(self) -> dict:
        """Per-label decode tables for the on-device extraction decisions —
        the SAME tables the host columnar extractor uses
        (extract.label_decode_tables); cached per engine."""
        cached = getattr(self, "_lab_tables_cache", None)
        if cached is None:
            from ..extract import label_decode_tables

            cached = self._lab_tables_cache = label_decode_tables(
                self.mb, self.mb.rs
            )
        return cached

    def _lab_bytes(self) -> int:
        """Bytes per label in packed rows: int8 whenever the label alphabet
        allows (values 0..H fit 127), else int32.  THE one cutoff shared by
        the kernel builder, the packed-row builder and the collector —
        mismatched copies would slice packed rows at wrong offsets."""
        n_labels = int(np.asarray(self._dev["Lmap"]).shape[1])
        return 1 if n_labels + 1 <= 127 else 4

    def _get_pallas_decided(self, Lp: int, BT: Optional[int] = None):
        """Packed pipeline WITH the per-read extraction decisions computed
        on device (VERDICT r4 item 5 — extract_reads' decision tree,
        barcode_hmm.c:3203-3304, evaluated on the label path while it is
        still resident):

        * pass/fail vs the confidence threshold (f32-ceiled so the compare
          equals the host's float64 semantics exactly),
        * per-R-segment minimum-length check,
        * barcode segment+alternative id with null-N rejection,
        * fingerprint 2-bit key packing (<= 27 F bases; two uint32 halves),
        * the keep-bit mask (label-is-R per position) the host needs for
          the spacer rewrite.

        One uint8 row per read:
        ``keep_bits[Lp/8] | read_type[1] | bar_mem i32[4] | fp_lo u32[4] |
        fp_hi u32[4] | q f32[4] | dust f32[8]`` — Lp/8 + 25 bytes, vs
        lab_bytes*(Lp+1) + 24 for the label-carrying row: the host no
        longer downloads (or walks) labels at all, and the raw f/r/bar
        scores stay on device too (production only consumes Q).
        Returns ``(jitted, raw, row_bytes, BT)``.
        """
        if BT is None:
            BT = self.default_batch_tile()
        nib = nibble_uploads()
        key = ("decided", Lp, BT, nib)
        if not hasattr(self, "_pallas_cache"):
            self._pallas_cache = {}
        if key not in self._pallas_cache:
            assert Lp % 8 == 0
            _, full, _BT = self._get_pallas(Lp, BT)
            T = self._label_tables()
            nlab = T["seg"].shape[0]
            is_R = jnp.asarray(T["is_R"])
            is_B = jnp.asarray(T["is_B"])
            is_F = jnp.asarray(T["is_F"])
            null_b = jnp.asarray(T["null_b"])
            alt_t = jnp.asarray(T["alt"])
            seg_t = jnp.asarray(T["seg"])
            is_r_full = self._is_r_label()
            rfl = self.required_finger_len()

            from ..constants import (
                EXTRACT_FAIL_ARCHITECTURE_MISMATCH,
                EXTRACT_FAIL_BAR_FINGER_NOT_FOUND,
                EXTRACT_FAIL_READ_TOO_SHORT,
                EXTRACT_SUCCESS,
            )

            bitw = jnp.asarray(
                [128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32
            )

            def full_decided(seqs_in, lens, thr32, minlen):
                # with TAGDUST_TPU_NIBBLE=1 inputs arrive nibble-packed
                # (2 bases/byte, codes 0-5 fit 4 bits): host->device uploads
                # are the streaming wall on high-latency links, so halving
                # the bytes buys more than the one VPU unpack costs
                seqs_u8 = (
                    unpack_nibbles_device(seqs_in, Lp) if nib else seqs_in
                )
                f, r, b, lab, q = full(seqs_u8, lens)
                seqs = seqs_u8.astype(jnp.int32)
                dust = dust_scores_device(
                    seqs, lab.astype(jnp.int32), lens, is_r_full
                )
                B = seqs.shape[0]
                labd = jnp.clip(lab.astype(jnp.int32)[:, 1:], 0, nlab - 1)
                pos = jnp.arange(Lp, dtype=jnp.int32)[None, :]
                valid = pos < lens[:, None]
                keep = jnp.take(is_R, labd)  # [B, Lp] bool (unmasked)
                tR = keep & valid
                tB = jnp.take(is_B, labd) & valid
                tF = jnp.take(is_F, labd) & valid

                # keep bits, big-endian within each byte (np.unpackbits order)
                keep_bytes = jnp.sum(
                    keep.reshape(B, Lp // 8, 8).astype(jnp.int32)
                    * bitw[None, None, :],
                    axis=2,
                ).astype(jnp.uint8)

                passed = q >= thr32  # NaN -> False, like the host compare

                fingerlen = jnp.sum(tF.astype(jnp.int32), axis=1)
                has_b = tB.any(axis=1)
                last_b = jnp.where(
                    has_b, Lp - 1 - jnp.argmax(tB[:, ::-1], axis=1), 0
                )
                lab_last = jnp.take_along_axis(
                    labd, last_b[:, None], axis=1
                )[:, 0]
                bar = jnp.where(has_b, jnp.take(alt_t, lab_last), -1)
                mem = jnp.where(has_b, jnp.take(seg_t, lab_last), -1)
                hb = jnp.where(
                    has_b, jnp.where(jnp.take(null_b, lab_last), -1, 1), 0
                )

                # too-short: every maximal R run must reach minlen
                idxs = jnp.broadcast_to(pos, tR.shape)
                last_nonr = jax.lax.cummax(
                    jnp.where(tR, -1, idxs), axis=1
                )
                runlen = idxs - last_nonr
                nxt = jnp.pad(tR[:, 1:], ((0, 0), (0, 1)))
                run_end = tR & ~nxt
                too_short = jnp.any(run_end & (runlen < minlen), axis=1)

                # fingerprint key: 2-bit packed F bases, two uint32 halves
                if rfl and rfl <= 27:
                    cum = jnp.cumsum(tF.astype(jnp.int32), axis=1)
                    shift = 2 * (fingerlen[:, None] - cum)  # at F positions
                    bits = (seqs[:, :Lp] & 3).astype(jnp.uint32)
                    sh_lo = jnp.clip(shift, 0, 31).astype(jnp.uint32)
                    lo = jnp.sum(
                        jnp.where(tF & (shift < 32), bits << sh_lo, 0),
                        axis=1, dtype=jnp.uint32,
                    )
                    sh_hi = jnp.clip(shift - 32, 0, 31).astype(jnp.uint32)
                    hi = jnp.sum(
                        jnp.where(tF & (shift >= 32), bits << sh_hi, 0),
                        axis=1, dtype=jnp.uint32,
                    )
                else:
                    lo = jnp.zeros((B,), jnp.uint32)
                    hi = jnp.zeros((B,), jnp.uint32)

                finger_ok = fingerlen == rfl
                if rfl:
                    core = jnp.where(
                        hb == 1,
                        finger_ok & (bar != -1),
                        jnp.where(hb == 0, finger_ok, False),
                    )
                else:
                    core = jnp.where(hb == 1, bar != -1, hb == 0)
                success = passed & ~too_short & core
                read_type = jnp.where(
                    passed,
                    jnp.where(
                        too_short,
                        EXTRACT_FAIL_READ_TOO_SHORT,
                        jnp.where(
                            success,
                            EXTRACT_SUCCESS,
                            EXTRACT_FAIL_BAR_FINGER_NOT_FOUND,
                        ),
                    ),
                    EXTRACT_FAIL_ARCHITECTURE_MISMATCH,
                ).astype(jnp.uint8)
                bar_mem = jnp.where(
                    success & (hb == 1), (mem << 16) | bar, -1
                ).astype(jnp.int32)

                u8 = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
                    x, jnp.uint8
                ).reshape(B, -1)
                return jnp.concatenate(
                    [
                        keep_bytes,
                        read_type[:, None],
                        u8(bar_mem[:, None]),
                        u8(lo[:, None]),
                        u8(hi[:, None]),
                        u8(q[:, None]),
                        u8(dust),
                    ],
                    axis=1,
                )

            wrapped = _f32_precision_wrap(full_decided)
            self._pallas_cache[key] = (
                jax.jit(wrapped), wrapped, Lp // 8 + 25, BT
            )
        return self._pallas_cache[key]

    @staticmethod
    def pack_nibbles(seqs: np.ndarray) -> np.ndarray:
        """[B, Lp] codes (0-5) -> [B, Lp/2] nibble-packed uint8."""
        return (seqs[:, 0::2] | (seqs[:, 1::2] << 4)).astype(np.uint8)

    def dispatch_pallas_decided(
        self, seqs: np.ndarray, lens: np.ndarray, thr32, minlen: int
    ):
        """Asynchronous dispatch of the decided-mode pipeline (labels never
        leave the device; the host receives decisions + keep bits; the
        upload is nibble-packed)."""
        B, Lp = seqs.shape
        fn, _, _, BT = self._get_pallas_decided(Lp)
        if B % BT:
            raise ValueError(f"batch {B} not a multiple of the tile {BT}")
        up = seqs.astype(np.uint8)
        if nibble_uploads():
            up = self.pack_nibbles(up)
        return fn(
            jnp.asarray(up),
            jnp.asarray(lens.astype(np.int32)),
            jnp.float32(thr32),
            jnp.int32(minlen),
        )

    @staticmethod
    def threshold_f32_ceil(thr: float) -> np.float32:
        """Smallest float32 >= thr: makes the device compare
        ``q_f32 >= thr32`` decide exactly like the host's float64
        ``thr <= float64(q_f32)`` for every representable q."""
        t32 = np.float32(thr)
        if float(t32) < float(thr):
            t32 = np.nextafter(t32, np.float32(np.inf), dtype=np.float32)
        return t32

    def collect_pallas_decided(self, out, n: int, Lp: int) -> dict:
        """Parse one fetched decided-mode window back to host arrays."""
        a = np.asarray(out)[:n]
        kb = Lp // 8
        keep = np.unpackbits(
            np.ascontiguousarray(a[:, :kb]), axis=1
        ).astype(bool)
        read_type = a[:, kb].astype(np.int64)
        bar_mem = np.ascontiguousarray(a[:, kb + 1 : kb + 5]).view(np.int32)[
            :, 0
        ]
        lo = np.ascontiguousarray(a[:, kb + 5 : kb + 9]).view(np.uint32)[:, 0]
        hi = np.ascontiguousarray(a[:, kb + 9 : kb + 13]).view(np.uint32)[:, 0]
        fp_key = (hi.astype(np.int64) << 32) | lo.astype(np.int64)
        sc = np.ascontiguousarray(a[:, kb + 13 : kb + 25]).view(np.float32)
        return {
            "keep": keep,
            "read_type": read_type,
            "bar_mem": bar_mem,
            "fp_key": fp_key,
            "mapq": sc[:, 0],
            "dust": sc[:, 1:3],
        }

    def _is_r_label(self) -> np.ndarray:
        """[n_labels+2] bool: does label index li label an R-segment base?"""
        cached = getattr(self, "_is_r_cache", None)
        if cached is None:
            n_labels = int(np.asarray(self._dev["Lmap"]).shape[1])
            out = np.zeros(n_labels + 2, dtype=bool)
            lab_tab = np.asarray(self.mb.label, dtype=np.int64)
            types = self.mb.rs.types if self.mb.rs is not None else []
            for li in range(min(n_labels + 2, lab_tab.shape[0])):
                seg = int(lab_tab[li]) & 0xFFFF
                if seg < len(types) and types[seg] == "R":
                    out[li] = True
            cached = self._is_r_cache = out
        return cached

    def collect_pallas(self, out, n: int, Lp: int) -> TpuBatchResult:
        """Convert one fetched packed window back to host-side arrays."""
        a = np.asarray(out)[:n]
        # lab_bytes is a model property (label-alphabet size), independent
        # of the dispatching tile — don't touch the packed-fn cache here
        lab_bytes = self._lab_bytes()
        lw = lab_bytes * (Lp + 1)
        labs = np.ascontiguousarray(a[:, :lw])
        labels = (
            labs.view(np.int8)
            if lab_bytes == 1
            else labs.view(np.int32).reshape(n, Lp + 1)
        )
        sc = np.ascontiguousarray(a[:, lw : lw + 24]).view(np.float32)
        return TpuBatchResult(
            f_score=sc[:, 0],
            r_score=sc[:, 1],
            bar_prob=sc[:, 2],
            labels=labels,
            mapq=sc[:, 3],
            dust=sc[:, 4:6],
        )

    def run_batch_pallas(
        self, seqs: np.ndarray, lens: np.ndarray, want_labels: bool = True
    ) -> TpuBatchResult:
        """Fused-kernel path; B must be a multiple of the tile (padded here).

        ``want_labels=False`` skips the device->host label transfer (the bulk
        of the result bytes) — used by calibration/arch-detection, which only
        consume scores."""
        B, Lp = seqs.shape
        fullfn, _, BT = self._get_pallas(Lp)
        pack = Lp % 2 == 0 and nibble_uploads()
        if pack:
            # nibble-packed upload entry (same body, half the link bytes —
            # this is the calibration sweep's dominant transfer)
            key = ("full_nibble", Lp, BT)
            if key not in self._pallas_cache:
                _, full, _ = self._get_pallas(Lp, BT)

                def full_nibble(sp, lens_):
                    return full(unpack_nibbles_device(sp, Lp), lens_)

                self._pallas_cache[key] = jax.jit(full_nibble)
            fullfn = self._pallas_cache[key]
        max_b = self._PALLAS_STACK_BYTES // self.pallas_stack_bytes_per_read(Lp)
        max_b = max(BT, max_b // BT * BT)
        pad = (-B) % BT
        if pad:
            # pad with copies of read 0: zero-filled length-1 pad reads can
            # be impossible under the model (P(x|M)=0 -> deliberate NaN Q),
            # which would leak NaNs into the discarded rows of the jit
            # output and trip jax_debug_nans
            seqs = np.concatenate(
                [seqs, np.broadcast_to(seqs[:1], (pad, Lp))], axis=0
            )
            lens = np.concatenate([lens, np.broadcast_to(lens[:1], (pad,))])
        outs = []
        for s in range(0, seqs.shape[0], max_b):
            sb = seqs[s : s + max_b]
            lb = lens[s : s + max_b]
            if s > 0 and sb.shape[0] < max_b:
                # pad the final sub-batch up to max_b so every dispatch of
                # this Lp compiles ONE (max_b, Lp) program — remainder
                # shapes used to each cost their own ~1-2 min cold compile;
                # the conversion below slices [:B], dropping the pad rows
                pad_n = max_b - sb.shape[0]
                sb = np.concatenate(
                    [sb, np.broadcast_to(sb[:1], (pad_n, Lp))], axis=0
                )
                lb = np.concatenate([lb, np.broadcast_to(lb[:1], (pad_n,))])
            up = (
                self.pack_nibbles(sb.astype(np.uint8))
                if pack
                else sb.astype(np.uint8)
            )
            outs.append(
                fullfn(
                    jnp.asarray(up),
                    jnp.asarray(lb.astype(np.int32)),
                )
            )
        f_log, r_log, bar_log, labels, mapq = (
            outs[0]
            if len(outs) == 1
            else tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
        )
        return TpuBatchResult(
            f_score=np.asarray(f_log)[:B],
            r_score=np.asarray(r_log)[:B],
            bar_prob=np.asarray(bar_log)[:B],
            labels=np.asarray(labels)[:B] if want_labels else None,
            mapq=np.asarray(mapq)[:B],
        )
