import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from __graft_entry__ import _flagship_engine
import tagdust_tpu.engine.pallas_kernel as PK

eng = _flagship_engine()
lat = eng.lat
L = 64; B = 16384
call, Sp, Kp, Hp = PK.make_fused_scorer(
    lat.A, lat.Aent, lat.end,
    np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
    lat.begin, L, 256, interpret=False, tmatrix=np.asarray(eng._dev["tmat"]))

rng = np.random.default_rng(0)
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jnp.asarray(np.full(B, 56, dtype=np.int32))

# Recreate the three pallas_calls piecewise by introspecting `call`?  Simpler:
# time full `call` and a bwd-only variant made from the module internals.
full = jax.jit(call)
jax.block_until_ready(full(seqs, lens))
ts=[]
for _ in range(5):
    t0=time.time(); jax.block_until_ready(full(seqs,lens)); ts.append(time.time()-t0)
print(f"full fused: {min(ts)*1e3:.1f} ms")
