import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp

# monkeypatch _select_matmul precision via env toggle
import tagdust_tpu.engine.pallas_kernel as PK
mode = sys.argv[1] if len(sys.argv) > 1 else "default"

orig_dot = jnp.dot
def make_dot(prec=None, cast=False):
    def d(a, b, **kw):
        if cast:
            a = a.astype(jnp.bfloat16); b = b.astype(jnp.bfloat16)
        if prec is not None:
            kw["precision"] = prec
        return orig_dot(a, b, **kw)
    return d

if mode == "highest":
    PK.jnp = type(jnp)("jnp_patched"); PK.jnp.__dict__.update(jnp.__dict__)
    PK.jnp.dot = make_dot(prec=jax.lax.Precision.HIGHEST)
elif mode == "bf16":
    PK.jnp = type(jnp)("jnp_patched"); PK.jnp.__dict__.update(jnp.__dict__)
    PK.jnp.dot = make_dot(cast=True)

from __graft_entry__ import _flagship_engine
eng = _flagship_engine()
rng = np.random.default_rng(0)
B, L = 16384, 64
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jnp.asarray(np.full(B, 56, dtype=np.int32))
fullfn, BT = eng._get_pallas(L)
jax.block_until_ready(fullfn(seqs, lens))
ts = []
for _ in range(6):
    t0 = time.time(); jax.block_until_ready(fullfn(seqs, lens)); ts.append(time.time()-t0)
t = min(ts)
print(f"{mode}: {t*1e3:.2f} ms -> {B/t/1e3:.0f}k reads/s")
