"""Multi-chip scale-out: data-parallel read sharding over a device mesh.

The reference's only parallelism is a pthread fan-out over reads with
per-thread model copies and a join-then-reduce step
(``barcode_hmm.c:1895-2029``).  The TPU-native equivalent implemented here:

* HMM parameter tensors (the compiled lattice) are **replicated** to every
  chip;
* read batches are **sharded on the batch axis** across the mesh
  (`jax.sharding.NamedSharding` over a 1-D ``reads`` mesh axis — ICI within
  a slice, DCN across hosts);
* per-outcome counters and architecture posteriors are reduced with
  ``psum`` (`shard_map`), the collective analogue of the reference's
  join-then-reduce.

Reads never split across chips: the sequence axis is the scan dimension of
the per-chip kernel (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.tpu import TpuEngine, _forward_backward


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("reads",))


class ShardedScorer:
    """Data-parallel scorer: same per-chip program as `TpuEngine`, plus a
    psum-reduced outcome histogram (the distributed analogue of
    ``log_information`` counting, barcode_hmm.c:354-385)."""

    def __init__(self, engine: TpuEngine, mesh: Optional[Mesh] = None):
        self.engine = engine
        self.mesh = mesh or make_mesh()
        lat_dev = engine._dev

        def per_shard(seqs, lens, threshold):
            f_log, r_log, bar_log, labels, mapq = _forward_backward(
                lat_dev, seqs, lens
            )
            # outcome accounting reduced across chips (psum == the
            # reference's join-then-reduce, barcode_hmm.c:1987-1992)
            accept = mapq >= threshold
            counts = jnp.stack(
                [
                    jnp.sum(accept.astype(jnp.int32)),
                    jnp.sum((~accept).astype(jnp.int32)),
                ]
            )
            counts = jax.lax.psum(counts, "reads")
            return f_log, r_log, bar_log, labels, mapq, counts

        self._fn = jax.jit(
            shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P("reads", None), P("reads"), P()),
                out_specs=(
                    P("reads"),
                    P("reads"),
                    P("reads"),
                    P("reads", None),
                    P("reads"),
                    P(),
                ),
                check_vma=False,
            )
        )

    def run(self, seqs: np.ndarray, lens: np.ndarray, threshold: float = 0.0):
        n = self.mesh.devices.size
        B = seqs.shape[0]
        pad = (-B) % n
        if pad:
            seqs = np.concatenate([seqs, np.zeros((pad, seqs.shape[1]), seqs.dtype)])
            lens = np.concatenate([lens, np.ones(pad, lens.dtype)])
        sharding = NamedSharding(self.mesh, P("reads", None))
        seqs_d = jax.device_put(jnp.asarray(seqs.astype(np.int32)), sharding)
        lens_d = jax.device_put(
            jnp.asarray(lens.astype(np.int32)), NamedSharding(self.mesh, P("reads"))
        )
        out = self._fn(seqs_d, lens_d, jnp.float32(threshold))
        return out
