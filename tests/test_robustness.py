"""Failure-path robustness: counter overflow and pipeline-thread faults.

* ``global_counter_sum`` must survive counters past int32 under the default
  JAX config (no ``jax_enable_x64``) — VERDICT round 2, item 8;
* a writer-thread failure (disk full, broken pipe) must RAISE on the main
  thread instead of deadlocking the depth-1 pipeline queues — ADVICE
  round 2, medium.
"""

import os
import threading

import numpy as np
import pytest


def test_global_counter_sum_past_int32(monkeypatch):
    """Counters > 2^31 survive the cross-host sum exactly: values travel as
    two int32 halves (device-collective-safe without x64) and are summed in
    numpy int64 on the host."""
    import jax
    from jax.experimental import multihost_utils

    from tagdust_tpu.parallel import multihost as mh

    seen = {}

    def fake_allgather(x):
        x = np.asarray(x)
        seen["dtype"] = x.dtype
        return np.stack([x] * 20)  # 20 identical hosts

    monkeypatch.setattr(jax, "process_count", lambda: 20)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    counters = {
        "total": 110_622_138 * 3,  # the reference's production log x3/host
        "success": 3_000_000_001,  # already past int32 per host
        "arch_mismatch": 0,
    }
    out = mh.global_counter_sum(counters)
    assert seen["dtype"] == np.int32  # no silent x64-off narrowing possible
    assert out == {k: v * 20 for k, v in counters.items()}


def _write_fastq(path, n):
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(f"@r{i}\nACGTACGTACGTACGTACGT\n+\n{'I' * 20}\n")


def test_writer_failure_raises_not_hangs(tmp_path, monkeypatch):
    """With maxsize-1 queues, a writer death must not leave the main thread
    blocked on write_q.put(); the error surfaces as the run's exception."""
    from tagdust_tpu.config import parse_args
    from tagdust_tpu.controller import MessageLog, hmm_controller_multiple
    from tagdust_tpu.io import writer as writer_mod

    fq = os.path.join(str(tmp_path), "in.fq")
    _write_fastq(fq, 4000)  # 4 chunks at the rtest chunk size of 1000

    calls = {"n": 0}

    def failing_write_batch(self, *a, **k):
        calls["n"] += 1
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(
        writer_mod.DemuxWriter, "write_batch_columnar", failing_write_batch
    )

    param = parse_args(
        [fq, "-o", os.path.join(str(tmp_path), "out"), "-Q", "10", "-rtest"]
    )
    result = {}

    def run():
        try:
            hmm_controller_multiple(param, log=MessageLog())
            result["exc"] = None
        except BaseException as e:  # noqa: BLE001
            result["exc"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "controller deadlocked after writer failure"
    assert isinstance(result["exc"], OSError)
    assert calls["n"] >= 1
