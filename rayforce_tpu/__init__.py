"""rayforce-tpu: a TPU-native columnar query engine with the Rayfall
language (capabilities of RayforceDB/rayforce, re-architected for JAX/XLA/
Pallas over HBM-resident columns)."""

import os as _os

# RAYFORCE_PLATFORM=cpu|tpu|axon overrides the JAX backend before it
# initializes (env JAX_PLATFORMS alone is pinned by the axon
# sitecustomize; jax.config wins). Lets the CLI run host-side when the
# TPU relay is unreachable.
_plat = _os.environ.get("RAYFORCE_PLATFORM")
if _plat:
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from .core.builtins import Runtime  # noqa: F401,E402

__version__ = "0.1.0"
