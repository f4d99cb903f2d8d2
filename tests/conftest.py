import os

# TPU-path tests run on a virtual 8-device CPU mesh; the deterministic gold
# tests don't touch JAX at all.  The axon sitecustomize pins
# JAX_PLATFORMS=axon, so force-override (not setdefault) before jax
# initialises a backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
