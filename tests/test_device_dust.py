"""Device DUST replica vs the host core (filters._dust_scores_core)."""

import numpy as np
import pytest

from tagdust_tpu.constants import SPACER
from tagdust_tpu.filters import _dust_scores_core


def _host_scores(seq_mat, lens):
    W = 64
    B = seq_mat.shape[0]
    arr = np.full((B, W), SPACER, dtype=np.uint8)
    w = min(W, seq_mat.shape[1])
    pos = np.arange(w)[None, :]
    src = seq_mat[:, :w].copy()
    src[pos >= lens[:, None]] = SPACER
    arr[:, :w] = src
    return _dust_scores_core(arr, lens.astype(np.int32))


@pytest.mark.parametrize("Lp", [64, 96, 32])
def test_device_dust_matches_host(Lp):
    from tagdust_tpu.engine.tpu import dust_scores_device

    rng = np.random.default_rng(11)
    B = 257
    lens = rng.integers(1, Lp + 1, B).astype(np.int32)
    seqs = rng.integers(0, 5, (B, Lp)).astype(np.int32)
    # low-complexity rows to exercise high scores
    seqs[::7] = 0
    # labels: 0 = R, 1 = non-R; random non-R prefixes/infixes
    labels = np.zeros((B, Lp + 1), dtype=np.int32)
    pre = rng.integers(0, 10, B)
    pos = np.arange(Lp + 1)[None, :]
    labels[(pos <= pre[:, None]) & (pos > 0)] = 1
    labels[::5, Lp // 2] = 1  # interior non-R -> spacer splits the run
    is_r = np.array([True, False, False])

    out = np.asarray(
        dust_scores_device(seqs, labels, lens, is_r)
    )

    # raw variant: device vs host on the raw codes
    raw_host = _host_scores(seqs.astype(np.uint8), lens)
    np.testing.assert_allclose(out[:, 1], raw_host, rtol=1e-6, equal_nan=True)

    # extracted variant: spacer where the label is non-R
    ext = seqs.astype(np.uint8).copy()
    lab_body = labels[:, 1 : Lp + 1]
    ext[~is_r[np.clip(lab_body, 0, 2)]] = SPACER
    ext_host = _host_scores(ext, lens)
    np.testing.assert_allclose(out[:, 0], ext_host, rtol=1e-6, equal_nan=True)
