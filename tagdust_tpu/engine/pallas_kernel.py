"""Fused Pallas TPU kernel for the read-classification DP.

One grid program owns a tile of BT reads and runs the *entire* dynamic
program with all state resident in VMEM:

  phase A (backward):  b[i-1] = select_base(b[i]) @ Abwd, rescaled, stored to
                       a VMEM stack (the whole [Lp, BT, S] stack fits because
                       the tile is small);
  phase B (forward):   v[i] = select_base(v[i-1]) @ Afwd; per-position label
                       posteriors reduce against the stacked backward values
                       ((v*b) @ Lmap), entry-only barcode posteriors
                       accumulate, per-read scales carry in SMEM-width
                       columns.

The base-dependent transition matrix is applied as 5 masked [BT,S]x[S,S]
MXU matmuls (mask on the source rows — no [5,B,S] intermediates, no
gathers).  The optimal-accuracy label DP + traceback run outside the kernel
(tiny [B,H] tensors).  Numerics match `engine/tpu.py` (clean float32
linear-space with per-step max rescaling).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_fused_scorer(
    A: np.ndarray,  # [5, S, S] f32
    Aent: np.ndarray,  # [5, S, K]
    end: np.ndarray,  # [S]
    Lmap: np.ndarray,  # [S, H+1]
    ent_sel: np.ndarray,  # [S, K]
    begin: int,
    Lp: int,
    BT: int = 64,
    interpret: bool = False,
):
    """Returns fn(seqs [B, Lp] i32, lens [B] i32) ->
    (f_log, logP_b, plab [Lp, B, Hp], tp [B, Kp])."""
    S = A.shape[1]
    K = Aent.shape[2]
    Sp = _round_up(S, 128)
    Kp = _round_up(max(K, 1), 128)
    Hp = _round_up(Lmap.shape[1], 128)

    # padded fused matrices
    Afwd = np.zeros((5 * Sp, Sp + Kp), dtype=np.float32)
    Abwd = np.zeros((5 * Sp, Sp), dtype=np.float32)
    for c in range(5):
        Afwd[c * Sp : c * Sp + S, :S] = A[c]
        Afwd[c * Sp : c * Sp + S, Sp : Sp + K] = Aent[c]
        Abwd[c * Sp : c * Sp + S, :S] = A[c].T
    endp = np.zeros((Sp, 128), dtype=np.float32)
    endp[:S, 0] = end
    lmapp = np.zeros((Sp, Hp), dtype=np.float32)
    lmapp[:S, : Lmap.shape[1]] = Lmap
    entp = np.zeros((Sp, Kp), dtype=np.float32)
    if K:
        entp[:S, :K] = ent_sel

    def kernel(
        seq_ref,  # [BT, Lp] i32
        lens_ref,  # [BT, 128] i32 (len broadcast in col 0)
        afwd_ref,  # [5Sp, Sp+Kp]
        abwd_ref,  # [5Sp, Sp]
        end_ref,  # [Sp, 128]
        lmap_ref,  # [Sp, Hp]
        entsel_ref,  # [Sp, Kp]
        flog_ref,  # out [BT, 128]
        logpb_ref,  # out [BT, 128]
        plab_ref,  # out [Lp, BT, Hp]
        tp_ref,  # out [BT, Kp]
        bstack,  # scratch [Lp + 1, BT, Sp]
        blstack,  # scratch [Lp + 1, BT, 128]
    ):
        lens = lens_ref[:, :1]  # [BT,1]

        def select_matmul(v, base_col, mat_ref, ncols):
            acc = jnp.zeros((BT, ncols), jnp.float32)
            for c in range(5):
                vc = jnp.where(base_col == c, v, 0.0)
                acc = acc + jnp.dot(
                    vc,
                    mat_ref[c * Sp : (c + 1) * Sp, :],
                    preferred_element_type=jnp.float32,
                )
            return acc

        # ---- phase A: backward ----
        b0 = jnp.broadcast_to(end_ref[:, 0][None, :], (BT, Sp))
        bstack[Lp] = b0
        blstack[Lp] = jnp.zeros((BT, 128), jnp.float32)

        def bwd_body(k, carry):
            b, bls = carry  # [BT,Sp], [BT,1]
            i = Lp - k  # i from Lp..1, computes bwd[i-1]
            base = seq_ref[:, pl.ds(i - 1, 1)]  # [BT,1]
            bn = select_matmul(b, base, abwd_ref, Sp)
            m = jnp.max(bn, axis=1, keepdims=True)
            m = jnp.where(m > 0, m, 1.0)
            bn = bn / m
            nls = bls + jnp.log(m)
            act = (i - 1) < lens
            b = jnp.where(act, bn, b)
            bls = jnp.where(act, nls, bls)
            bstack[pl.ds(i - 1, 1)] = b[None]
            blstack[pl.ds(i - 1, 1)] = jnp.broadcast_to(bls, (BT, 128))[None]
            return (b, bls)

        b_fin, bls_fin = jax.lax.fori_loop(
            0, Lp, bwd_body, (b0, jnp.zeros((BT, 1), jnp.float32))
        )
        logpb = jnp.log(jnp.maximum(b_fin[:, begin : begin + 1], 1e-38)) + bls_fin
        logpb_ref[:, :] = jnp.broadcast_to(logpb, (BT, 128))

        # ---- phase B: forward + posterior ----
        col = jax.lax.broadcasted_iota(jnp.int32, (BT, Sp), 1)
        v0 = jnp.where(col == begin, 1.0, 0.0).astype(jnp.float32)

        def fwd_body(i1, carry):
            v, fls, tp = carry  # [BT,Sp], [BT,1], [BT,Kp]
            base = seq_ref[:, pl.ds(i1, 1)]
            Y = select_matmul(v, base, afwd_ref, Sp + Kp)
            vn = Y[:, :Sp]
            ve = Y[:, Sp:]
            bw = bstack[pl.ds(i1 + 1, 1)][0]  # [BT,Sp]
            bls_i = blstack[pl.ds(i1 + 1, 1)][0][:, :1]
            w = jnp.exp(fls + bls_i - logpb)  # [BT,1]
            plab = (
                jnp.dot(vn * bw, lmap_ref[:, :], preferred_element_type=jnp.float32)
                * w
            )
            bwsel = jnp.dot(bw, entsel_ref[:, :], preferred_element_type=jnp.float32)
            tpn = tp + ve * bwsel * w
            m = jnp.max(vn, axis=1, keepdims=True)
            m = jnp.where(m > 0, m, 1.0)
            vn2 = vn / m
            nls = fls + jnp.log(m)
            act = i1 < lens
            v = jnp.where(act, vn2, v)
            fls = jnp.where(act, nls, fls)
            tp = jnp.where(act, tpn, tp)
            plab = jnp.where(act, plab, 0.0)
            plab_ref[pl.ds(i1, 1)] = plab[None]
            return (v, fls, tp)

        v_fin, fls_fin, tp_fin = jax.lax.fori_loop(
            0,
            Lp,
            fwd_body,
            (v0, jnp.zeros((BT, 1), jnp.float32), jnp.zeros((BT, Kp), jnp.float32)),
        )
        f_lin = jnp.dot(v_fin, end_ref[:, :], preferred_element_type=jnp.float32)[
            :, :1
        ]
        flog = jnp.log(jnp.maximum(f_lin, 1e-38)) + fls_fin
        flog_ref[:, :] = jnp.broadcast_to(flog, (BT, 128))
        tp_ref[:, :] = tp_fin

    grid = lambda B: (B // BT,)

    def call(seqs, lens):
        B = seqs.shape[0]
        f_log, logpb, plab, tp = pl.pallas_call(
            kernel,
            grid=(B // BT,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((BT, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((5 * Sp, Sp + Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((5 * Sp, Sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Sp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Sp, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Sp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Lp, BT, Hp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 128), jnp.float32),
                jax.ShapeDtypeStruct((B, 128), jnp.float32),
                jax.ShapeDtypeStruct((Lp, B, Hp), jnp.float32),
                jax.ShapeDtypeStruct((B, Kp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lp + 1, BT, Sp), jnp.float32),
                pltpu.VMEM((Lp + 1, BT, 128), jnp.float32),
            ],
        )(
            seqs,
            jnp.broadcast_to(lens[:, None], (B, 128)).astype(jnp.int32),
            jnp.asarray(Afwd),
            jnp.asarray(Abwd),
            jnp.asarray(endp),
            jnp.asarray(lmapp),
            jnp.asarray(entp),
        )
        return f_log[:, 0], logpb[:, 0], plab, tp[:, :K] if K else tp[:, :0]

    return call, Sp, Kp, Hp
