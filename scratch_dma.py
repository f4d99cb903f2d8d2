import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp, types

src = open("tagdust_tpu/engine/pallas_kernel.py").read()
src = src.replace("from __future__ import annotations",
                  "from __future__ import annotations\n_STAGE = 0")
src = src.replace(
    ")(seqs, lens_b, Abwd_j, endp_j)",
    ")(seqs, lens_b, Abwd_j, endp_j)\n"
    "        if _STAGE:\n"
    "            return logpb[:, 0], bstack.sum(), blstack.sum()\n", 1)
variants = {}
# variant: constant output slot (no growing stack DMA)
v = src.replace(
    "pl.BlockSpec((1, BT, Sp), lambda i, k: (Lp - k, i, 0), memory_space=pltpu.VMEM),\n"
    "                pl.BlockSpec((1, BT, 128), lambda i, k: (Lp - k, i, 0), memory_space=pltpu.VMEM),",
    "pl.BlockSpec((1, BT, Sp), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),\n"
    "                pl.BlockSpec((1, BT, 128), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),")
assert v != src
variants["bwd no-stack-dma"] = v
variants["bwd with stack"] = src

from __graft_entry__ import _flagship_engine
eng = _flagship_engine(); lat = eng.lat
L, B = 64, 16384
rng = np.random.default_rng(0)
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jnp.asarray(np.full(B, 56, dtype=np.int32))

for name, s in variants.items():
    mod = types.ModuleType("pk_v"); exec(compile(s, "pk_v", "exec"), mod.__dict__)
    mod._STAGE = 1
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
