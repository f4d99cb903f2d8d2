import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp

# load a copy of pallas_kernel with a stage-returning `call`
import importlib.util, types, re
src = open("tagdust_tpu/engine/pallas_kernel.py").read()
# stage hooks: after bwd return sums; after fwd return sums
src = src.replace(
    ")(seqs, lens_b, Abwd_j, endp_j)",
    ")(seqs, lens_b, Abwd_j, endp_j)\n"
    "        if _STAGE == 1:\n"
    "            return logpb[:, 0], bstack.sum(), blstack.sum()\n", 1)
src = src.replace(
    "          bstack, blstack, logpb)",
    "          bstack, blstack, logpb)\n"
    "        if _STAGE == 2:\n"
    "            return flog[:, 0], path.sum(), dpfin.sum()\n", 1)
src = src.replace("from __future__ import annotations", "from __future__ import annotations\n_STAGE = 0")
mod = types.ModuleType("pk_stage"); exec(compile(src, "pk_stage", "exec"), mod.__dict__)

from __graft_entry__ import _flagship_engine
eng = _flagship_engine(); lat = eng.lat
L, B = 64, 16384
rng = np.random.default_rng(0)
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jnp.asarray(np.full(B, 56, dtype=np.int32))

for stage, name in [(1, "bwd only"), (2, "bwd+fwd"), (0, "all three")]:
    mod._STAGE = stage
    call, *_ = mod.make_fused_scorer(
        lat.A, lat.Aent, lat.end,
        np.asarray(eng._dev["Lmap"]), np.asarray(eng._dev["ent_sel"]),
        lat.begin, L, 256, interpret=False, tmatrix=np.asarray(eng._dev["tmat"]))
    f = jax.jit(call)
    jax.block_until_ready(f(seqs, lens))
    ts=[]
    for _ in range(5):
        t0=time.time(); jax.block_until_ready(f(seqs,lens)); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms")
