"""The classic NeRF MLP (ECCV 2020) as a JAX parameter pytree.

Architecture mirrors the reference exactly
(``/root/reference/torch_nerf/src/network/nerf.py:11-136``):

* 8-layer, 256-wide ReLU trunk; the raw encoded position is re-concatenated
  *in front of* the layer-5 features (``nerf.py:108`` does
  ``cat([pos, x])`` — note the ordering, it differs from some public impls).
* ``fc_8`` outputs ``feat_dim + 1`` channels; ``sigma = relu(out[:, 0])``
  and the remaining 256 channels feed the view-dependent branch.
* View branch: ``fc_9(concat([feat, view_dir])) -> 128 -> relu -> fc_out ->
  sigmoid`` RGB.

TPU-first design notes: parameters are a flat dict of ``{"w": (in, out),
"b": (out,)}`` arrays (x @ W + b). The apply function is pure and vectorized
over an arbitrary leading batch; matmuls can run in bfloat16 with float32
accumulation (``preferred_element_type``) so XLA tiles them onto the MXU.
Weight init matches PyTorch ``nn.Linear`` defaults
(``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both weight and bias) so golden
parity tests can compare against reference-initialized networks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

LAYER_NAMES = (
    "fc_in",
    "fc_1",
    "fc_2",
    "fc_3",
    "fc_4",
    "fc_5",
    "fc_6",
    "fc_7",
    "fc_8",
    "fc_9",
    "fc_out",
)


def layer_dims(pos_dim: int, view_dir_dim: int, feat_dim: int = 256) -> Dict[str, Tuple[int, int]]:
    """(in, out) sizes of every linear layer, per ``nerf.py:49-59``."""
    return {
        "fc_in": (pos_dim, feat_dim),
        "fc_1": (feat_dim, feat_dim),
        "fc_2": (feat_dim, feat_dim),
        "fc_3": (feat_dim, feat_dim),
        "fc_4": (feat_dim, feat_dim),
        "fc_5": (feat_dim + pos_dim, feat_dim),
        "fc_6": (feat_dim, feat_dim),
        "fc_7": (feat_dim, feat_dim),
        "fc_8": (feat_dim, feat_dim + 1),
        "fc_9": (feat_dim + view_dir_dim, feat_dim // 2),
        "fc_out": (feat_dim // 2, 3),
    }


def _init_linear(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """PyTorch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(
    key: jax.Array, pos_dim: int, view_dir_dim: int, feat_dim: int = 256
) -> Params:
    """Initialize the full parameter pytree."""
    dims = layer_dims(pos_dim, view_dir_dim, feat_dim)
    keys = jax.random.split(key, len(LAYER_NAMES))
    return {
        name: _init_linear(k, *dims[name]) for name, k in zip(LAYER_NAMES, keys)
    }


def _linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray, dtype) -> jnp.ndarray:
    w = p["w"].astype(dtype)
    b = p["b"].astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(dtype) + b


def nerf_apply(
    params: Params,
    pos: jnp.ndarray,
    view_dir: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass. ``pos``: (..., pos_dim) encoded positions, ``view_dir``:
    (..., view_dir_dim) encoded view directions.

    Returns ``(sigma, rgb)`` with shapes ``(...,)`` and ``(..., 3)`` in
    float32, matching ``nerf.py:102-121`` (sigma = relu of channel 0 of the
    fc_8 output; rgb = sigmoid of the view-branch output).
    """
    pos = pos.astype(compute_dtype)
    view_dir = view_dir.astype(compute_dtype)

    x = jax.nn.relu(_linear(params["fc_in"], pos, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_1"], x, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_2"], x, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_3"], x, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_4"], x, compute_dtype))

    x = jnp.concatenate([pos, x], axis=-1)

    x = jax.nn.relu(_linear(params["fc_5"], x, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_6"], x, compute_dtype))
    x = jax.nn.relu(_linear(params["fc_7"], x, compute_dtype))
    x = _linear(params["fc_8"], x, compute_dtype)

    sigma = jax.nn.relu(x[..., 0]).astype(jnp.float32)
    x = jnp.concatenate([x[..., 1:], view_dir], axis=-1)

    x = jax.nn.relu(_linear(params["fc_9"], x, compute_dtype))
    rgb = jax.nn.sigmoid(_linear(params["fc_out"], x, compute_dtype)).astype(jnp.float32)

    return sigma, rgb


def params_from_torch_state_dict(state_dict) -> Params:
    """Convert a reference PyTorch ``NeRF.state_dict()`` into our pytree.

    PyTorch stores ``weight`` as (out, in); we store (in, out). Accepts any
    mapping of name -> array-like (numpy arrays or torch tensors).
    """
    import numpy as np

    params: Params = {}
    for name in LAYER_NAMES:
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        params[name] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    return params
