import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_engine
eng = _flagship_engine()
L, B = 64, 16384
rng = np.random.default_rng(0)
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jnp.asarray(np.full(B, 56, dtype=np.int32))
fullfn, BT = eng._get_pallas(L)
jax.block_until_ready(fullfn(seqs, lens))
for NB in (4, 8, 16):
    outs = [fullfn(seqs, lens) for _ in range(2)]  # prime pipeline
    jax.block_until_ready(outs)
    t0 = time.time()
    outs = [fullfn(seqs, lens) for _ in range(NB)]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    print(f"pipelined x{NB}: {dt*1e3:.1f} ms -> {NB*B/dt/1e3:.0f}k reads/s")
