"""Test harness config: force a deterministic 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon at import, so the platform
must be overridden through jax.config (env vars are ignored)."""


def pytest_configure(config):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
