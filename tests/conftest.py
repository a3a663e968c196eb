"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip behavior is validated on virtual CPU devices (SURVEY.md §4) — the
real TPU is reserved for bench runs, and first-compile latency on TPU would
dominate unit tests anyway.
"""
import os

# FORCE cpu: the harness environment pre-sets JAX_PLATFORMS=axon (remote TPU
# via a relay tunnel) — unit tests must never round-trip ops over it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: deliberately NO persistent compilation cache here.  The cache-key
# computation hashes every inlined MLIR constant (MANO blend tables, YCB
# vertex banks — megabytes) per compile, which dominates wall time on small
# hosts and dwarfs the compile itself.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax at interpreter boot and forces
# jax_platforms="axon,cpu" via config (which OVERRIDES the env var) — so the
# env assignment above is not sufficient: tests would silently round-trip
# every op over the TPU relay (and inherit its bf16-grade conv precision).
# config.update after import wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, jax.devices()

jax.config.update("jax_enable_x64", False)
# test-side verification math must not run at the bf16-grade default matmul
# precision; library geometry code pins Precision.HIGHEST explicitly where it
# matters, NN-trunk code intentionally keeps the fast default
jax.config.update("jax_default_matmul_precision", "highest")
