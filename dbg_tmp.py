import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.device_get(jnp.zeros(8) + 1)
from rayforce_tpu.engine import groupby as G

N = 10_000_000
rng = np.random.default_rng(0)
v_np = rng.uniform(0, 100, N)
v = jnp.asarray(v_np)

for n in (1024, 10_000, 100_000):
    c_np = rng.integers(0, n, N).astype(np.int32)
    c = jnp.asarray(c_np)

    def f(c, v, n=n):
        hi, lo = G.f64_twofloat_weights(v)
        s = G.matmul_tasks_scan(c, [hi, lo], n, N)
        return s[0] + s[1]

    jf = jax.jit(f)
    r = jf(c, v); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = jf(c, v); jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)*1000
    got = np.asarray(r)
    exact = np.zeros(n)
    np.add.at(exact, c_np, v_np)
    abs_err = np.max(np.abs(got - exact))
    rel_err = np.max(np.abs(got - exact) / np.maximum(np.abs(exact), 1))
    # display flips at %.2f
    flips = np.sum(np.round(got, 2) != np.round(exact, 2))
    print(f"n={n}: {dt:.1f} ms  abs_err={abs_err:.2e} rel={rel_err:.2e} "
          f"%.2f-flips={flips}/{n}", flush=True)
