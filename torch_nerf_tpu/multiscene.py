"""Multi-scene batched training: N independent scenes in ONE jitted step.

The reference trains one scene per process (``/root/reference/torch_nerf/
runners/train.py:368-499`` — one dataset, one model, one optimizer); a full
Blender-suite sweep is eight sequential runs. On TPU the per-scene batch
(4096 rays) under-fills the chip and the whole parameter set is tiny
(~1.2M floats/scene), so the natural formulation is a SCENE AXIS:

* per-scene parameters are a stacked pytree (leading axis = scene), built
  with ``jax.vmap`` over ``field.init``;
* one train step ``jax.vmap``s the entire per-scene pipeline — image pick,
  pixel sampling, ray generation, render, MSE, Adam — over that axis. The
  scenes are completely independent, so vmap is exact (identical numerics
  to N separate runs given the per-scene fold_in keys), and XLA fuses the
  N small matmul stacks into batched matmuls that actually fill the MXU;
* on a multi-chip mesh the scene axis shards: each chip trains its scene
  subset with ZERO cross-chip communication (scenes share nothing) — the
  embarrassing axis the reference's one-process design cannot express.

The vmapped path uses the generic (XLA) field apply — Pallas kernels don't
carry batching rules, so fused/NGP-kernel fields must be constructed with
their kernels disabled for multi-scene runs (the CLI does this).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torch_nerf_tpu import cameras
from torch_nerf_tpu.fields import Field
from torch_nerf_tpu.renderer import RenderSettings
from torch_nerf_tpu.train import (
    OptimConfig,
    TrainState,
    make_optimizer,
    precrop_pixel_indices,
    ray_loss_fn,
    sample_pixels_without_replacement,
)

__all__ = [
    "create_multiscene_state",
    "make_multiscene_image_train_step",
    "scene_params",
]


def create_multiscene_state(
    key: jax.Array,
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    num_scenes: int,
) -> TrainState:
    """Stacked train state: every params/opt leaf gains a leading scene axis."""
    optimizer = make_optimizer(optim_cfg)

    def init_one(k):
        coarse_key, fine_key = jax.random.split(k)
        params: Dict[str, Any] = {"coarse": field.init(coarse_key)}
        if settings.hierarchical:
            params["fine"] = field.init(fine_key)
        return params

    params = jax.vmap(init_one)(jax.random.split(key, num_scenes))
    opt_state = jax.vmap(optimizer.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)


def scene_params(state: TrainState, scene: int) -> Dict[str, Any]:
    """Slice one scene's parameter pytree out of the stacked state (eval)."""
    return jax.tree.map(lambda x: x[scene], state.params)


def make_multiscene_image_train_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    camera: cameras.CameraParams,
    num_scenes: int,
    num_pixels: int = 4096,
    precrop: bool = False,
    donate: bool = True,
    mesh: Optional[Any] = None,
    scene_axis: str = "scene",
):
    """One jitted step training ``num_scenes`` scenes concurrently.

    ``step(state, images (C, V, H*W, 3), poses (C, V, 4, 4), key) ->
    (state, metrics)`` where every metric is a (C,) per-scene array plus a
    ``loss`` mean. Per-scene RNG is ``fold_in(key, scene)``, so scene s's
    sample stream is independent of how many scenes train beside it.

    With ``mesh`` (a ``jax.sharding.Mesh`` carrying ``scene_axis``), the
    scene axis of the state, image pool, and metrics is sharded over the
    mesh — scenes are independent, so the step lowers with no collectives
    at all (assert: no all-reduce in the compiled HLO).
    """
    optimizer = make_optimizer(optim_cfg)
    num_total = camera.img_height * camera.img_width
    crop = precrop_pixel_indices(camera.img_height, camera.img_width) if precrop else None
    if crop is not None:
        num_pixels = min(num_pixels, crop.shape[0])

    def scene_step(params, opt_state, images, poses, key) -> Tuple[Any, Any, Dict]:
        img_key, pix_key, render_key = jax.random.split(key, 3)
        img_idx = jax.random.randint(img_key, (), 0, images.shape[0])
        pose = poses[img_idx]
        image = images[img_idx]
        if crop is not None:
            sub = sample_pixels_without_replacement(pix_key, crop.shape[0], num_pixels)
            pixel_idx = jnp.asarray(crop)[sub]
        else:
            pixel_idx = sample_pixels_without_replacement(pix_key, num_total, num_pixels)
        ray_o, ray_d = cameras.rays_for_pixels(
            pixel_idx, camera, pose,
            use_ndc=settings.project_to_ndc, ndc_z_near=settings.ndc_z_near,
        )
        rgb_gt = image[pixel_idx]

        def loss_wrapper(p):
            return ray_loss_fn(field, p, ray_o, ray_d, rgb_gt, render_key, settings)

        (_, metrics), grads = jax.value_and_grad(loss_wrapper, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        import optax  # noqa: PLC0415

        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, metrics

    def step_fn(state: TrainState, images, poses, key):
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(num_scenes, dtype=jnp.int32)
        )
        new_params, new_opt, metrics = jax.vmap(scene_step)(
            state.params, state.opt_state, images, poses, keys
        )
        metrics = dict(metrics)
        metrics["loss"] = jnp.mean(metrics["loss"])
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: PLC0415

    if num_scenes % int(mesh.shape[scene_axis]) != 0:
        raise ValueError(
            f"num_scenes={num_scenes} must divide evenly over the "
            f"{mesh.shape[scene_axis]}-way '{scene_axis}' axis"
        )
    sharded = NamedSharding(mesh, P(scene_axis))
    replicated = NamedSharding(mesh, P())

    def leaf_sharding(x):
        return sharded

    def build(state: TrainState):
        state_sh = TrainState(
            step=replicated,
            params=jax.tree.map(leaf_sharding, state.params),
            opt_state=jax.tree.map(leaf_sharding, state.opt_state),
        )
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, sharded, sharded, replicated),
            out_shardings=(state_sh, None),
            donate_argnums=donate_argnums,
        )

    def place_state(state: TrainState) -> TrainState:
        return TrainState(
            step=jax.device_put(state.step, replicated),
            params=jax.tree.map(lambda x: jax.device_put(x, sharded), state.params),
            opt_state=jax.tree.map(lambda x: jax.device_put(x, sharded), state.opt_state),
        )

    return build, place_state
