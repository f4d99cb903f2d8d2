"""Baum-Welch expectations: forward/backward consistency + sane counts.

Mirrors the reference's use of its training path as a correctness check for
the forward/backward implementation (barcode_hmm.c:3385-3391)."""

import numpy as np

from tagdust_tpu.arch import build_read_structure
from tagdust_tpu.engine.exact import ExactEngine
from tagdust_tpu.engine.train import expected_counts, reestimate
from tagdust_tpu.logsum import p2sp
from tagdust_tpu.model import init_model_bag
from tagdust_tpu.stats import SequenceStats


def _mb():
    rs = build_read_structure(["B:ACGTAC,TGCATG", "R:N"])
    ssi = SequenceStats()
    ssi.average_length = 24
    ssi.max_seq_len = 40
    ssi.background = [float(p2sp(p)) for p in (0.27, 0.24, 0.26, 0.22, 0.01)]
    ssi.mean_5_len = ssi.stdev_5_len = -1.0
    ssi.mean_3_len = ssi.stdev_3_len = -1.0
    return rs, ssi, init_model_bag(rs, ssi, 0.05, 0.1)


def test_forward_backward_consistency():
    _, _, mb = _mb()
    rng = np.random.default_rng(0)
    B, L = 16, 24
    seqs = np.zeros((B, L + 1), dtype=np.uint8)
    seqs[:, :L] = rng.integers(0, 4, (B, L))
    eng = ExactEngine(mb, use_native=False)
    res = eng.run_batch(seqs, L)
    # f and b compute the same likelihood through different recursions;
    # the reference uses this as its fwd/bwd verification
    assert np.allclose(res.f_score, res.b_score, atol=2e-3)


def test_expected_counts_and_reestimate():
    _, _, mb = _mb()
    rng = np.random.default_rng(1)
    B, L = 12, 24
    seqs = np.zeros((B, L + 1), dtype=np.uint8)
    seqs[:, :L] = rng.integers(0, 4, (B, L))
    # plant the first barcode so its states get posterior mass
    bc = np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8)
    seqs[: B // 2, :6] = bc

    counts = expected_counts(mb, seqs, L)
    # total emission mass over all states ~= total emitted bases
    tot = sum(c.sum() for c in counts.m_emit) + sum(c.sum() for c in counts.i_emit)
    assert abs(tot - B * L) / (B * L) < 0.05
    # planted barcode (alt 0) must out-weigh the null-N alternative
    bseg = counts.m_emit[0]
    assert bseg[0].sum() > bseg[2].sum()

    mb2 = reestimate(mb, counts)
    for m in mb2.models:
        for f in range(m.num_hmms):
            for g in range(m.num_cols):
                em = np.exp(m.m_emit[f, g].astype(np.float64))
                assert abs(em.sum() - 1.0) < 1e-3


def test_distributed_counts_map_to_reference_counts():
    """DistributedTrainer counts (lattice space, psum-reduced) mapped back
    via lattice_counts_to_counts must agree with the host expected_counts
    (the forward_extract_posteriors replica) up to engine float drift."""
    import jax
    import numpy as np

    from tagdust_tpu.engine.tpu import TpuEngine
    from tagdust_tpu.engine.train import (
        expected_counts,
        lattice_counts_to_counts,
    )
    from tagdust_tpu.parallel.mesh import DistributedTrainer, make_mesh

    _, _, mb = _mb()
    rng = np.random.default_rng(12)
    B, L = 12, 16
    seqs_core = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lens = np.full(B, L, dtype=np.int32)

    # host reference: [B, L+1] with terminator slot like ExactEngine
    seqs_term = np.zeros((B, L + 1), dtype=np.uint8)
    seqs_term[:, :L] = seqs_core
    host = expected_counts(mb, seqs_term, L)

    eng = TpuEngine(mb)
    trainer = DistributedTrainer(eng, make_mesh(jax.devices()[:2]))
    CT, E, total = trainer.run(seqs_core, lens)
    assert total == int(lens.sum())
    mapped = lattice_counts_to_counts(mb, CT, E)

    for j in range(mb.num_models):
        np.testing.assert_allclose(
            mapped.m_emit[j], host.m_emit[j], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            mapped.i_emit[j], host.i_emit[j], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            mapped.s2M[j], host.s2M[j], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            mapped.s2I[j], host.s2I[j], rtol=2e-3, atol=2e-3
        )
        for tr in (0, 1, 3, 4, 6):  # MM, MI, II, IM, DM
            np.testing.assert_allclose(
                mapped.trans[j][..., tr],
                host.trans[j][..., tr],
                rtol=5e-3,
                atol=5e-3,
                err_msg=f"segment {j} trans {tr}",
            )
