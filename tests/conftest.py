"""Test harness config: force a deterministic 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon at import, so the platform
must be overridden through jax.config (env vars are ignored)."""
import pytest


def pytest_configure(config):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    try:
        # the default persistent compilation cache is shared with
        # axon-relay runs whose XLA:CPU AOT artifacts carry relay-side
        # machine features (prefer-no-scatter/gather) — loading them
        # locally warns "could lead to SIGILL". Tests keep a cache of
        # their own: isolated from relay artifacts, still warm across
        # suite runs (fully cold runs cost ~2x wall time).
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/rayforce_jax_cpu_tests")
    except Exception:
        pass


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except Exception:
        return 0


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules once the process
    map count gets high. Every jitted plan pins mapped code pages for
    the life of the process; across the full suite that exhausts
    vm.max_map_count (65530) and XLA dies with MemoryError/segfaults
    mid-compile (reproduced: the map count marches to ~65.4k right
    before the crash). Clearing only above a threshold keeps warm-jit
    speed for most modules; engine plan caches are cleared too so no
    stale plan holds a dropped executable."""
    yield
    if _map_count() > 30_000:
        import jax
        from rayforce_tpu.engine import select as _sel
        _sel._plan_cache.clear()
        jax.clear_caches()
