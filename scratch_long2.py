import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax
from __graft_entry__ import _flagship_engine
eng = _flagship_engine()
rng = np.random.default_rng(2)
B2, Lp2 = 256, 500
seqs2 = rng.integers(0, 4, (B2, Lp2)).astype(np.uint8)
lens2 = rng.integers(300, 500, B2).astype(np.int32)
t0=time.time(); r2p = eng.run_batch_pallas(seqs2, lens2); print("pallas", time.time()-t0, flush=True)
t0=time.time(); r2x = eng.run_batch(seqs2, lens2); print("xla", time.time()-t0, flush=True)
np.testing.assert_allclose(r2p.f_score, r2x.f_score, rtol=5e-4, atol=1e-2)
bad = sum(not np.array_equal(r2p.labels[b,1:int(lens2[b])+1], r2x.labels[b,1:int(lens2[b])+1]) for b in range(B2))
print("label mismatches:", bad, "/", B2)
assert bad == 0
print("Lp=500 OK")
