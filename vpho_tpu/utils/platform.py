"""Entry-point platform selection.

Environments that pre-register an accelerator PJRT plugin (from
sitecustomize) set the platform list via ``jax.config``, which OVERRIDES the
``JAX_PLATFORMS`` env var — a user-forced ``JAX_PLATFORMS=cpu python ...``
would still initialize (or hang on an unreachable) accelerator backend.
``jax.config.update`` after import wins as long as no backend has been
initialized yet, so every CLI/bench entry point calls this FIRST, before any
module that might touch a device.
"""
import os


def honor_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS", "")
    if env:
        import jax

        jax.config.update("jax_platforms", env)
