"""Shared CLI bootstrap: honor JAX_PLATFORMS even when the environment
pre-imports jax (sitecustomize) so the env var alone is ignored."""
import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
