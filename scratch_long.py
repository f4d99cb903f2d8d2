import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_engine
eng = _flagship_engine()
rng = np.random.default_rng(1)
B, Lp = 512, 200
seqs = rng.integers(0, 4, (B, Lp)).astype(np.uint8)
lens = rng.integers(60, 200, B).astype(np.int32)
t0=time.time(); res_p = eng.run_batch_pallas(seqs, lens); print("pallas Lp=200 done", time.time()-t0, flush=True)
t0=time.time(); res_x = eng.run_batch(seqs, lens); print("xla done", time.time()-t0, flush=True)
np.testing.assert_allclose(res_p.f_score, res_x.f_score, rtol=2e-4, atol=1e-3)
np.testing.assert_allclose(res_p.bar_prob, res_x.bar_prob, rtol=2e-4, atol=8e-3)
np.testing.assert_allclose(res_p.mapq, res_x.mapq, rtol=2e-3, atol=3e-2)
bad = sum(not np.array_equal(res_p.labels[b,1:int(lens[b])+1], res_x.labels[b,1:int(lens[b])+1]) for b in range(B))
print("label mismatches:", bad, "/", B)
assert bad == 0
print("Lp=200 OK")
