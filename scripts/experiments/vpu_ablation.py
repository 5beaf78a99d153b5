"""Quantify the fused train kernel's non-MXU VPU blocks one by one.

fused_train_ablation.py (round 5) bounded the in-kernel inefficiency:
``mlp_only`` runs 21.3 ms against ~16.4 ms of padding-aware MXU time. This
script asks WHERE the ~5 ms gap sits by swapping individual VPU blocks for
cheaper (mathematically wrong, structurally identical) stand-ins and timing
the production ``fused_train_pass`` pipeline unchanged otherwise.

Measured (v5e, 4096 rays x 192 samples, fwd+bwd, vs the pre-poly-trig
baseline's exact-sincos encode):

    baseline            :   25.98 ms
    single_sin          :   25.68 ms  (-0.30)
    no_trans            :   22.70 ms  (-3.28)
    no_relu_grad        :   25.86 ms  (-0.12)

Readings:
* The sin+cos block is 3.28 ms — 12.6% of the pass — but computing ONE
  transcendental instead of two (``single_sin``: cos via a mask-derived
  pi/2 phase) recovers only 0.3 ms: XLA's sincos shares its RANGE
  REDUCTION between the pair, and the reduction is the cost, not the
  polynomial. That finding drove the production fix: the encoder's
  frequencies are powers of two, so the reduction is replaced by
  fixed-point phase arithmetic (``r = v - round(v)`` on cycles) + a
  degree-9 polynomial — ``_encode_poly`` in fused_nerf.py, gated to the
  bf16 compute path. After that change this script's encode patches no
  longer hit the production path (they patch ``_encode_fast``, which bf16
  no longer routes through); the numbers above are the motivating record.
* ``_relu_grad`` is already ~free (the bf16 saturating-multiply mask).
* A "skip the f32->bf16 conversion pass" variant (matmuls emitted with
  preferred_element_type=bf16) is structurally impossible: Mosaic rejects
  it with 'tpu.matmul' op Expected matmul acc to be 32-bit — the f32
  accumulate + convert is part of the floor, not an optimization target.

Run on the real TPU:  python scripts/experiments/vpu_ablation.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.ops.pallas import fused_nerf as fn
from torch_nerf_tpu.ops.pallas import fused_train as ft

N, S = 4096, 192
field = make_nerf_field(compute_dtype=jnp.bfloat16, use_pallas=True)
CFG = field.fused_cfg
params = field.init(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
ray_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
ray_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
rgb_gt = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
t = jnp.sort(jnp.asarray(rng.uniform(2, 6, size=(N, S)).astype(np.float32)), axis=1)
delta = jnp.concatenate([t[:, 1:] - t[:, :-1], jnp.full((N, 1), 1e8)], axis=1)


def timeit(f, iters=30):
    """Chained timing (see fused_train_ablation.timeit): each iteration's
    depth input depends on the previous grads so the device serializes."""

    @jax.jit
    def chained(t_cur):
        rgb, w, grads = ft.fused_train_pass(
            params, ray_o, ray_d, t_cur, delta, rgb_gt, CFG, N
        )
        bump = grads["fc_in"]["w"][0:1, 0:1] * jnp.float32(1e-30)
        return t_cur + bump

    del f
    t_cur = chained(t)
    _ = float(np.asarray(t_cur[0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        t_cur = chained(t_cur)
    _ = float(np.asarray(t_cur[0, 0]))
    return (time.perf_counter() - t0) / iters * 1e3


# --- patchable stand-ins ----------------------------------------------------

def _encode_single_sin(x, tables, dtype):
    sel, freq, sin_mask, id_mask = tables
    spread = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    # phase = pi/2 on cos columns — derived from the masks already in VMEM
    # (a captured constant table is not allowed in a pallas kernel body)
    phase = (1.0 - sin_mask - id_mask) * jnp.float32(np.pi / 2.0)
    y = spread * freq + phase
    enc = id_mask * spread + (1.0 - id_mask) * jnp.sin(y)
    return enc.astype(dtype), spread


def _encode_no_trans(x, tables, dtype):
    sel, freq, sin_mask, id_mask = tables
    spread = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    return (spread * freq).astype(dtype), spread


def _relu_grad_free(act, dh, dt):
    return dh.astype(dt)


# NOTE: a "skip the f32->bf16 conversion pass" variant (matmuls emitted with
# preferred_element_type=bf16) is NOT here because Mosaic rejects it outright:
# 'tpu.matmul' op Expected matmul acc to be 32-bit — the f32 accumulate +
# convert is mandatory on this hardware, so the per-layer conversions are
# part of the floor, not an optimization target.
VARIANTS = {
    "baseline": {},
    "single_sin": {"_encode_fast": _encode_single_sin},
    "no_trans": {"_encode_fast": _encode_no_trans},
    "no_relu_grad": {"_relu_grad": _relu_grad_free},
}


def main():
    base = None
    for name, patches in VARIANTS.items():
        saved = {k: getattr(fn, k) for k in patches}
        for k, v in patches.items():
            setattr(fn, k, v)
        try:
            ms = timeit(None)
        finally:
            for k, v in saved.items():
                setattr(fn, k, v)
        if base is None:
            base = ms
        print(f"{name:20s}: {ms:7.2f} ms  ({ms - base:+.2f} vs baseline)", flush=True)


if __name__ == "__main__":
    main()
