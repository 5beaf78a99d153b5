"""Decompose the flagship hierarchical train step: what binds the ~47% MFU?

Times each stage of the fused train step in isolation at the production
operating point (4096 rays, 64c + 192f, 256-wide MLPs, bf16) and prints the
budget next to the measured full step. The fused kernel's FLOP-time is
computed from the per-pass model FLOPs; the residual between the stage sum
and the full step is XLA glue (dispatch, donation copies).

Run on the real TPU:  python scripts/experiments/flagship_step_decomposition.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import train
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.logging_utils import device_peak_flops
from torch_nerf_tpu.ops import sampling
from torch_nerf_tpu.ops.pallas.fused_train import fused_train_pass
from torch_nerf_tpu.renderer import RenderSettings

N, SC, SF = 4096, 64, 128
settings = RenderSettings(num_samples_coarse=SC, num_samples_fine=SF, t_near=2.0, t_far=6.0)
field = make_nerf_field(compute_dtype=jnp.bfloat16, use_pallas=True)
optim = train.OptimConfig()
state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)

rng = np.random.default_rng(0)
ray_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
ray_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
rgb_gt = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
key = jax.random.PRNGKey(1)
rand = train.draw_train_randomness(key, N, settings)


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


bins, bin_size = sampling.t_bins(settings.t_near, settings.t_far, SC)
t_coarse = bins[None, :] + bin_size * rand["coarse_jitter"]
delta_coarse = sampling.t_deltas(t_coarse)

# stage 1: fused coarse pass (64 samples) fwd+bwd
coarse = jax.jit(
    lambda p: fused_train_pass(
        p, ray_o, ray_d, t_coarse, delta_coarse, rgb_gt, field.fused_cfg, N
    )
)
t_c = timeit(coarse, state.params["coarse"])

# stage 2: hierarchical sampling glue (inverse-CDF + merge sort)
weights = jax.jit(lambda p: coarse(p)[1])(state.params["coarse"])
sampler = jax.jit(
    lambda w: sampling.hierarchical_t_samples_from_uniforms(
        w, settings.t_near, settings.t_far,
        rand["fine_coarse_jitter"], rand["fine_u"], rand["fine_jitter"],
    )
)
t_s = timeit(sampler, weights)

# stage 3: fused fine pass (192 samples) fwd+bwd
t_fine = sampler(weights)
delta_fine = sampling.t_deltas(t_fine)
fine = jax.jit(
    lambda p: fused_train_pass(
        p, ray_o, ray_d, t_fine, delta_fine, rgb_gt, field.fused_cfg, N
    )
)
t_f = timeit(fine, state.params["fine"])

# stage 4: Adam update on both parameter sets
optimizer = train.make_optimizer(optim)
grads = jax.tree.map(jnp.zeros_like, state.params)
adam = jax.jit(lambda g, o, p: optimizer.update(g, o, p))
t_a = timeit(adam, grads, state.opt_state, state.params)

# full step for reference
ray_step = jax.jit(train.make_ray_train_step(field, settings, optim))
t_full = timeit(ray_step, state, ray_o, ray_d, rgb_gt, key)

# FLOP budget: fused passes carry ~all model FLOPs
from torch_nerf_tpu.encoders import positional_encoding_dim
from torch_nerf_tpu.models.nerf import layer_dims

pos_dim = positional_encoding_dim(3, 10, True)
dir_dim = positional_encoding_dim(3, 4, True)
macs = sum(i * o for i, o in layer_dims(pos_dim, dir_dim, 256).values())
f_c = 3.0 * 2.0 * macs * N * SC
f_f = 3.0 * 2.0 * macs * N * (SC + SF)
peak = device_peak_flops() or 197e12

glue = t_full - (t_c + t_s + t_f + t_a)
print(f"coarse fused pass (64s):  {t_c:7.2f} ms  ({f_c / (t_c / 1e3) / peak:5.1%} of peak)")
print(f"hierarchical sampler:     {t_s:7.2f} ms")
print(f"fine fused pass (192s):   {t_f:7.2f} ms  ({f_f / (t_f / 1e3) / peak:5.1%} of peak)")
print(f"adam (2 x 1.2M params):   {t_a:7.2f} ms")
print(f"full step:                {t_full:7.2f} ms  -> residual glue {glue:.2f} ms")
print(
    f"kernel-only MFU bound: {(f_c + f_f) / ((t_c + t_f) / 1e3) / peak:.1%}; "
    f"whole step: {(f_c + f_f) / (t_full / 1e3) / peak:.1%}"
)
