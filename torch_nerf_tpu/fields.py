"""Radiance-field abstraction: encode inputs, query the network.

Functional replacement for the reference's scene layer
(``/root/reference/torch_nerf/src/scene/primitives/cube.py:39-76`` — encode
position/direction with the registered encoders, flatten, query the network,
reshape back). Here a field is just a pair of pure functions bundled with its
static configuration; the renderer composes them inside one jit, so there is
no flatten/reshape round-trip through HBM — XLA sees the whole
(encode -> MLP -> composite) chain at once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from torch_nerf_tpu import encoders
from torch_nerf_tpu.models import nerf as nerf_model

# (params, pts (..., 3), dirs (..., 3)) -> (sigma (...), rgb (..., 3))
FieldApplyFn = Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
FieldInitFn = Callable[[jax.Array], Any]


@dataclasses.dataclass(frozen=True)
class Field:
    """A neural radiance field: ``init(key) -> params``; ``apply(params, pts,
    dirs) -> (sigma, rgb)``. Hashable (function identity) so it can be a
    static argument of jitted closures."""

    init: FieldInitFn
    apply: FieldApplyFn
    name: str = "field"
    # set when the field's loss pipeline can run through the fully-fused
    # Pallas train kernel (ops.pallas.fused_train): the FusedNeRFConfig of
    # the underlying kernel. None -> generic autodiff training path.
    fused_cfg: Any = None


def make_nerf_field(
    pos_dim: int = 3,
    view_dir_dim: int = 3,
    coord_encode_level: int = 10,
    dir_encode_level: int = 4,
    include_input: bool = True,
    feat_dim: int = 256,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Field:
    """Classic NeRF: positional encoding + the 8-layer MLP.

    Defaults mirror ``configs/signal_encoder/positional_encoding.yaml:1-4``
    and ``configs/network/nerf.yaml`` (PE levels 10/4 with raw input included
    -> 63-d coords / 27-d dirs into a 256-wide MLP).

    ``use_pallas=True`` routes the encode+MLP hot path through the fused
    Pallas TPU kernel (``ops.pallas.fused_nerf``) — same math, weights
    resident in VMEM, custom VJP. ``pallas_interpret`` runs the kernel in
    interpreter mode (CPU testing).
    """
    enc_pos_dim = encoders.positional_encoding_dim(pos_dim, coord_encode_level, include_input)
    enc_dir_dim = encoders.positional_encoding_dim(view_dir_dim, dir_encode_level, include_input)

    def init(key: jax.Array):
        return nerf_model.init_nerf_params(key, enc_pos_dim, enc_dir_dim, feat_dim)

    if use_pallas:
        from torch_nerf_tpu.ops.pallas.fused_nerf import (  # noqa: PLC0415
            FusedNeRFConfig,
            fused_nerf_apply,
        )

        cfg = FusedNeRFConfig(
            coord_encode_level=coord_encode_level,
            dir_encode_level=dir_encode_level,
            include_input=include_input,
            feat_dim=feat_dim,
            compute_dtype=compute_dtype,
            interpret=pallas_interpret,
        )

        def apply(params, pts: jnp.ndarray, dirs: jnp.ndarray):
            batch_shape = pts.shape[:-1]
            sigma, rgb = fused_nerf_apply(
                params, pts.reshape(-1, 3), dirs.reshape(-1, 3), cfg
            )
            return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)

        return Field(init=init, apply=apply, name="nerf_pallas", fused_cfg=cfg)

    def apply(params, pts: jnp.ndarray, dirs: jnp.ndarray):
        pos_enc = encoders.positional_encoding(pts, coord_encode_level, include_input)
        dir_enc = encoders.positional_encoding(dirs, dir_encode_level, include_input)
        return nerf_model.nerf_apply(params, pos_enc, dir_enc, compute_dtype=compute_dtype)

    return Field(init=init, apply=apply, name="nerf")


def make_scene_field(primitives: "dict[str, Field]", active: str) -> Field:
    """Multi-primitive scene container -> one queryable ``Field``.

    Functional counterpart of the reference's ``Scene`` aggregate
    (``/root/reference/torch_nerf/src/scene/scene.py:7-45``): it registers a
    collection of primitives and forwards ``query_points`` to the one being
    rendered. (The reference's version holds a Sequence but calls
    ``query_points`` on the collection itself — a latent bug, since the
    runners always bypass ``Scene`` and query the primitive directly at
    ``runner_utils.py:630-633``; here the container actually works.)
    Params are a dict keyed by primitive name, so checkpoints of a composed
    scene carry every primitive's weights.
    """
    if active not in primitives:
        raise KeyError(f"active primitive '{active}' not among {sorted(primitives)}")

    def init(key: jax.Array):
        keys = jax.random.split(key, len(primitives))
        return {
            name: field.init(k)
            for (name, field), k in zip(sorted(primitives.items()), keys)
        }

    def apply(params, pts: jnp.ndarray, dirs: jnp.ndarray):
        return primitives[active].apply(params[active], pts, dirs)

    return Field(init=init, apply=apply, name=f"scene[{active}]")
