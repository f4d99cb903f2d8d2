"""Multi-host execution groundwork (VERDICT round 1, item 8; SURVEY §5
"Distributed communication backend" row).

The reference is strictly single-node (pthreads, barcode_hmm.c:1895-2029).
The TPU-native scale-out story has two layers:

* **within a process**: the device mesh (`parallel.mesh`) — data-parallel
  read sharding over the chips local to this host, wired into the runner;
* **across hosts** (this module): `jax.distributed` initialization plus
  per-host *input* sharding — each process owns the read chunks with
  ``global_chunk_index % process_count == process_index`` and writes its
  own output shard (``<out>.h<pid>_...``); outcome counters are summed
  across hosts with a collective so every host's logfile reports the
  global totals.  The union of the per-host output shards equals a
  single-process run's outputs (process-count invariance, asserted by
  tests/test_multihost.py on a 2-process CPU gloo rig).

Calibration and architecture detection are deterministic given ``-seed``,
so every host computes identical thresholds independently; a broadcast
would only save duplicated work, not change results.
"""

from __future__ import annotations

from typing import Optional


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed (idempotent) and return
    (process_index, process_count).

    With no arguments, jax.distributed auto-detects cluster environments
    (TPU pods, SLURM, ...); explicit coordinator/nprocs/procid serve
    manual launches and the CPU test rig.
    """
    import jax
    from jax._src import distributed as _dist

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if _dist.global_state.client is not None and kwargs:
        # an auto-detected (e.g. single-process TPU-env) client may already
        # exist; explicit -coordinator/-nprocs/-procid override it
        if (
            num_processes is not None
            and _dist.global_state.num_processes != num_processes
        ):
            jax.distributed.shutdown()
    if _dist.global_state.client is None:
        jax.distributed.initialize(**kwargs)
    if (
        num_processes is not None
        and num_processes > 1
        and jax.process_count() != num_processes
    ):
        raise SystemExit(
            f"ERROR: multi-host init requested {num_processes} processes "
            f"but the backend reports {jax.process_count()} — a JAX backend "
            "was initialized before tagdust started (check that no library "
            "touches jax.devices() at import time)."
        )
    return jax.process_index(), jax.process_count()


def global_counter_sum(counters: dict) -> dict:
    """Sum an ordered int-counter dict across all processes (the cross-host
    analogue of the reference's join-then-reduce on log_information,
    barcode_hmm.c:354-385).  No-op for single-process runs."""
    import jax

    if jax.process_count() == 1:
        return dict(counters)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(counters)
    vec = jnp.asarray([int(counters[k]) for k in keys], dtype=jnp.int64)
    allv = multihost_utils.process_allgather(vec)  # [P, len(keys)]
    tot = allv.sum(axis=0)
    return {k: int(tot[i]) for i, k in enumerate(keys)}
