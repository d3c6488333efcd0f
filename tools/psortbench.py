import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from rayforce_tpu.engine import psort

def log(*a): print(*a, file=sys.stderr, flush=True)

N = 10_000_000
key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, dtype=jnp.int32)
val = jnp.arange(N, dtype=jnp.int32)
jax.block_until_ready((key, val))

def timeit(f, reps=5):
    f()  # warm/compile
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, (time.perf_counter() - t0) * 1000)
    return best

t0 = time.perf_counter()
def run_psort():
    out = psort.sort_i32([key, val], n_keys=1)
    jax.block_until_ready(out)
    return out
out = run_psort()
log(f"psort compile+first run: {time.perf_counter()-t0:.1f}s")
# correctness vs lax.sort
ref = jax.lax.sort([key, val], num_keys=1, is_stable=False)
ok_key = bool(jnp.all(out[0] == ref[0]))
kv = jnp.take(key, out[1])
ok_pair = bool(jnp.all(kv == out[0]))
log("key ok:", ok_key, "pair ok:", ok_pair)

t_ps = timeit(run_psort)
def run_lax():
    out = jax.lax.sort([key, val], num_keys=1, is_stable=False)
    jax.block_until_ready(out)
t_lx = timeit(run_lax)
log(f"psort {t_ps:.1f} ms   lax.sort {t_lx:.1f} ms   speedup {t_lx/t_ps:.2f}x")
print(json.dumps({"psort_ms": round(t_ps,1), "lax_ms": round(t_lx,1), "ok": ok_key and ok_pair}))
