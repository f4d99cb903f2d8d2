"""Scratch: per-kernel timing of the fused pallas pipeline on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_engine

eng = _flagship_engine()
lat = eng.lat
print("S =", lat.S, "K =", lat.Aent.shape[2], "H =", lat.num_labels)

rng = np.random.default_rng(0)
B, L = 16384, 64
seqs = rng.integers(0, 4, (B, L)).astype(np.int32)
lens = np.full(B, 56, dtype=np.int32)
seqs_d = jnp.asarray(seqs)
lens_d = jnp.asarray(lens)

fullfn, BT = eng._get_pallas(L)

def timeit(f, n=6):
    jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.time(); jax.block_until_ready(f()); ts.append(time.time()-t0)
    return min(ts)

t_full = timeit(lambda: fullfn(seqs_d, lens_d))
print(f"full pipeline: {t_full*1e3:.2f} ms -> {B/t_full/1e3:.0f}k reads/s")

# time raw matmul throughput for the same shapes, f32 vs bf16
from tagdust_tpu.engine import pallas_kernel as PK
Sp = PK._round_up(lat.S, 128)
Kp = PK._round_up(max(lat.Aent.shape[2],1), 128)
print("Sp,Kp =", Sp, Kp)
a = jnp.asarray(rng.standard_normal((B, Sp)), jnp.float32)
m = jnp.asarray(rng.standard_normal((5*Sp, Sp+Kp)), jnp.float32)

@jax.jit
def mm_f32(a, m):
    acc = jnp.zeros((a.shape[0], m.shape[1]), jnp.float32)
    for c in range(5):
        acc += jnp.dot(a, m[c*Sp:(c+1)*Sp], preferred_element_type=jnp.float32)
    return acc

@jax.jit
def mm_bf16(a, m):
    ab = a.astype(jnp.bfloat16); mb = m.astype(jnp.bfloat16)
    acc = jnp.zeros((a.shape[0], m.shape[1]), jnp.float32)
    for c in range(5):
        acc += jnp.dot(ab, mb[c*Sp:(c+1)*Sp], preferred_element_type=jnp.float32)
    return acc

t32 = timeit(lambda: mm_f32(a, m))
t16 = timeit(lambda: mm_bf16(a, m))
flops = 5 * B * Sp * (Sp+Kp) * 2
print(f"one step (5 matmuls, XLA): f32 {t32*1e3:.3f} ms ({flops/t32/1e12:.1f} TF), "
      f"bf16 {t16*1e3:.3f} ms ({flops/t16/1e12:.1f} TF)")
# per-position cost x L positions x 2 passes (fwd+bwd) as lower bound
print(f"matmul-only lower bound fwd+bwd: f32 {(t32*L*2)*1e3:.1f} ms, bf16 {(t16*L*2)*1e3:.1f} ms; "
      f"actual full {t_full*1e3:.1f} ms")
