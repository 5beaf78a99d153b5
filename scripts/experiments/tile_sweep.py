"""Sweep the fused TRAIN kernel's point-budget (train_tile) on the real TPU.

The optimum moved twice this round: the (S, S) scan-mask rework freed ~14 MB
of per-tile VMEM (8 -> 24 rays at 192 samples), and the poly-trig encode
shrank the serial VPU block by ~12%. Re-measure the fine (192-sample) and
coarse (64-sample) fused passes across tile budgets.

Run on the real TPU:  python scripts/experiments/tile_sweep.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.ops.pallas import fused_train as ft

N = 4096
field = make_nerf_field(compute_dtype=jnp.bfloat16, use_pallas=True)
params = field.init(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
ray_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
ray_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
rgb_gt = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))


def time_pass(samples, train_tile, iters=30):
    cfg = dataclasses.replace(field.fused_cfg, train_tile=train_tile)
    t = jnp.sort(
        jnp.asarray(rng.uniform(2, 6, size=(N, samples)).astype(np.float32)), axis=1
    )
    delta = jnp.concatenate([t[:, 1:] - t[:, :-1], jnp.full((N, 1), 1e8)], axis=1)

    @jax.jit
    def chained(t_cur):
        rgb, w, grads = ft.fused_train_pass(
            params, ray_o, ray_d, t_cur, delta, rgb_gt, cfg, N
        )
        bump = grads["fc_in"]["w"][0:1, 0:1] * jnp.float32(1e-30)
        return t_cur + bump

    t_cur = chained(t)
    _ = float(np.asarray(t_cur[0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        t_cur = chained(t_cur)
    _ = float(np.asarray(t_cur[0, 0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for samples in (192, 64):
        for tile in (3072, 4608, 6144, 9216, 12288):
            rays = ft.tile_rays(samples, max_points=tile)
            try:
                ms = time_pass(samples, tile)
            except Exception as e:  # noqa: BLE001 - VMEM OOM expected at the top end
                print(f"S={samples:3d} tile={tile:5d} ({rays:3d} rays): FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"S={samples:3d} tile={tile:5d} ({rays:3d} rays): {ms:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
