"""Micro-rate probe for the per-corner hash kernels vs the XLA gather path.

Times value_and_grad of sum(encode^2) at the reference table geometry
(L16 F2 2^19) for the dense (1.05M pts) and pruned (524k pts) per-step
point counts. Run on the real TPU:  python scripts/experiments/corner_rates.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from torch_nerf_tpu.models import instant_ngp

L, logT, F = 16, 19, 2
key = jax.random.PRNGKey(0)
tables = instant_ngp.init_hash_table(key, L, logT, F)
res = jnp.asarray(instant_ngp.level_resolutions(L, 16, 512))

def bench(fn, n, iters=10):
    pts = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32, -3.5, 3.5)
    f = jax.jit(jax.value_and_grad(lambda t: jnp.sum(fn(t, pts) ** 2)))
    v, g = f(tables); jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = f(tables)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    rows = n * L * 8 * 2  # fwd + bwd gathered/scattered rows
    print(f"  n={n}: {dt*1e3:8.2f} ms/step  {rows/dt/1e6:7.1f} Mrows/s (fwd+bwd)")
    return dt

print("per-corner Pallas kernel (hash_encode_corner128):")
for n in (524288, 1048576):
    bench(lambda t, p: instant_ngp.hash_encode_corner128(t, p, res), n)

print("XLA gather (hash_encode):")
for n in (524288,):
    bench(lambda t, p: instant_ngp.hash_encode(t, p, res), n, iters=2)
