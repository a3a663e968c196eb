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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vpho_jax_cache")
# threshold 0: compilation may be forwarded to a remote service (axon
# remote-compile), which reports ~zero local compile time — every entry must
# be cached or reruns pay the round-trip again
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# test-side verification math must not run at the bf16-grade default matmul
# precision; library geometry code pins Precision.HIGHEST explicitly where it
# matters, NN-trunk code intentionally keeps the fast default
jax.config.update("jax_default_matmul_precision", "highest")
