"""Device-mesh construction and sharded train steps (DP over rays, TP option).

Design follows the GSPMD recipe: build a named ``Mesh``, annotate arrays with
``NamedSharding``/``PartitionSpec``, jit the *same* pure train step, and let
XLA insert the collectives (grad psum over ``data``; per-layer-pair psum over
``model`` when TP is enabled). Multi-host pods use the identical code after
``jax.distributed.initialize()`` — the mesh simply spans all processes'
devices.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_nerf_tpu import cameras
from torch_nerf_tpu.fields import Field
from torch_nerf_tpu.renderer import RenderSettings
from torch_nerf_tpu.train import (
    OptimConfig,
    TrainState,
    draw_train_randomness,
    fused_loss_and_grad,
    make_optimizer,
    make_ray_train_step,
    precrop_pixel_indices,
    sample_pixels_without_replacement,
)

# Megatron-style layout for the NeRF MLP trunk: alternating column-parallel
# (out-dim sharded) and row-parallel (in-dim sharded) linears so each pair
# needs a single reduction. Heads with awkward dims (fc_8 outputs
# feat_dim + 1 = 257) stay replicated.
_COLUMN_PARALLEL = ("fc_in", "fc_2", "fc_4", "fc_6")
_ROW_PARALLEL = ("fc_1", "fc_3", "fc_5", "fc_7")


def make_mesh(
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a named device mesh over all (or the given) devices.

    Defaults to a 1-D ``data`` (ray) mesh spanning every chip; pass
    ``axis_names=("data", "model")`` with a 2-D shape for DP x TP.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape is required for multi-axis meshes")
    if int(np.prod(shape)) != devices.size:
        raise ValueError(f"mesh shape {shape} does not cover {devices.size} devices")
    return Mesh(devices.reshape(shape), axis_names)


def nerf_param_spec(
    params: Dict[str, Any], model_axis: Optional[str], model_axis_size: int = 1
) -> Dict[str, Any]:
    """PartitionSpecs for a NeRF param pytree.

    With ``model_axis=None`` everything is replicated (pure DP). Otherwise
    the trunk alternates column/row parallel; biases of column-parallel
    layers shard with their outputs. Layers whose relevant dim is not
    divisible by the model-axis size (e.g. ``fc_5`` whose input is the
    ``pos ++ features`` concat, or ``fc_8`` with its 257-wide output) fall
    back to replicated.
    """

    def spec_for(layer_name: str, layer_params):
        if not (isinstance(layer_params, dict) and "w" in layer_params):
            # non-linear-layer subtree (e.g. instant-ngp hash tables, nested
            # MLP dicts): replicate every leaf
            return jax.tree.map(lambda _: P(), layer_params)
        if model_axis is None:
            return {"w": P(), "b": P()}
        w = layer_params["w"]
        fan_in, fan_out = int(w.shape[0]), int(w.shape[1])
        if layer_name in _COLUMN_PARALLEL and fan_out % model_axis_size == 0:
            return {"w": P(None, model_axis), "b": P(model_axis)}
        if layer_name in _ROW_PARALLEL and fan_in % model_axis_size == 0:
            return {"w": P(model_axis, None), "b": P()}
        return {"w": P(), "b": P()}

    out: Dict[str, Any] = {}
    for branch, branch_params in params.items():  # {"coarse": ..., "fine": ...}
        out[branch] = {
            name: spec_for(name, layer) for name, layer in branch_params.items()
        }
    return out


def _state_shardings(
    mesh: Mesh, state: TrainState, model_axis: Optional[str]
) -> TrainState:
    """NamedShardings for every leaf of the train state.

    Optimizer moments shard exactly like their parameters (optax adam state
    mirrors the param tree); scalar counters are replicated.
    """
    axis_size = int(mesh.shape[model_axis]) if model_axis else 1
    pspec = nerf_param_spec(state.params, model_axis, axis_size)
    params_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspec, is_leaf=lambda x: isinstance(x, P)
    )

    # adam state: (ScaleByAdamState(count, mu, nu), schedule_state). mu/nu
    # mirror the param tree and shard identically; counts are scalars.
    opt_state_sh = jax.tree.map(
        lambda leaf: NamedSharding(mesh, P()), state.opt_state
    )
    # replace mu/nu shardings with param-like shardings where structure matches
    try:
        scale_state = state.opt_state[0]
        if hasattr(scale_state, "mu") and hasattr(scale_state, "nu"):
            new_scale = scale_state._replace(
                count=NamedSharding(mesh, P()),
                mu=params_sh,
                nu=params_sh,
            )
            opt_state_sh = (new_scale,) + tuple(
                jax.tree.map(lambda _: NamedSharding(mesh, P()), s)
                for s in state.opt_state[1:]
            )
    except (TypeError, IndexError, AttributeError):
        pass

    return TrainState(
        step=NamedSharding(mesh, P()),
        params=params_sh,
        opt_state=opt_state_sh,
    )


def replicate_state(
    mesh: Mesh, state: TrainState, model_axis: Optional[str] = None
) -> TrainState:
    """Place a host train state onto the mesh with the chosen sharding."""
    shardings = _state_shardings(mesh, state, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def _make_fused_dp_ray_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    mesh: Mesh,
    data_axis: str,
):
    """Data-parallel ray train step through the fully-fused Pallas kernel.

    ``pallas_call`` is opaque to the GSPMD partitioner, so the fused loss
    core runs under ``shard_map``: rays, targets, and the pre-drawn uniform
    batch split over ``data_axis``; each chip runs the kernel on its shard
    and ``pmean``s grads/metrics over ICI. All RNG happens OUTSIDE the shard
    region on the replicated key (``draw_train_randomness``), so every ray
    sees exactly the same samples as in the single-device step and the
    sharded numerics match bit-for-bit up to reduction order.
    """
    from jax import shard_map  # noqa: PLC0415

    optimizer = make_optimizer(optim_cfg)
    num_shards = int(mesh.shape[data_axis])

    def local_loss(params, ray_o, ray_d, rgb_gt, rand):
        metrics, grads = fused_loss_and_grad(
            field, params, ray_o, ray_d, rgb_gt, rand, settings
        )
        # per-shard means of equal-size shards -> pmean is the global mean
        metrics = jax.lax.pmean(metrics, data_axis)
        grads = jax.lax.pmean(grads, data_axis)
        return metrics, grads

    def step_fn(state: TrainState, ray_origin, ray_dir, rgb_gt, key):
        num_rays = ray_origin.shape[0]
        if num_rays % num_shards != 0:
            raise ValueError(
                f"ray batch {num_rays} must divide over {num_shards} '{data_axis}' shards"
            )
        rand = draw_train_randomness(key, num_rays, settings)
        sharded = P(data_axis)
        # check_vma=False: pallas_call out_shapes don't carry vma metadata yet
        loss_core = shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), sharded, sharded, sharded, sharded),
            out_specs=(P(), P()),
            check_vma=False,
        )
        metrics, grads = loss_core(state.params, ray_origin, ray_dir, rgb_gt, rand)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax  # noqa: PLC0415

        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            metrics,
        )

    return step_fn


def make_sharded_train_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
):
    """Jit the ray train step with mesh shardings.

    Rays/targets shard over ``data_axis``; params replicate (or TP-shard over
    ``model_axis``). Returns ``(step_fn, place_state)`` where ``place_state``
    maps a host ``TrainState`` onto the mesh. Gradient reduction across data
    shards is inserted by XLA from the sharding annotations (the psum rides
    ICI within a slice). Fields with a fused Pallas train kernel go through
    the ``shard_map`` DP core (:func:`_make_fused_dp_ray_step`) unless TP is
    requested (TP shards the weights, which the VMEM-resident kernel needs
    whole — those runs use the autodiff path).
    """
    if field.fused_cfg is not None and model_axis is None:
        ray_step = _make_fused_dp_ray_step(field, settings, optim_cfg, mesh, data_axis)
    else:
        # GSPMD cannot partition a pallas_call, so TP (and any non-fused
        # field) goes through the pure-jnp autodiff step the partitioner
        # understands end to end.
        ray_step = make_ray_train_step(field, settings, optim_cfg, force_generic=True)

    ray_sharding = NamedSharding(mesh, P(data_axis))
    key_sharding = NamedSharding(mesh, P())

    def place_state(state: TrainState) -> TrainState:
        return replicate_state(mesh, state, model_axis)

    def shardings_for(state: TrainState) -> TrainState:
        return _state_shardings(mesh, state, model_axis)

    def build(state: TrainState):
        state_sh = shardings_for(state)
        metrics_sh = None  # let XLA choose for scalar metrics
        return jax.jit(
            ray_step,
            in_shardings=(state_sh, ray_sharding, ray_sharding, ray_sharding, key_sharding),
            out_shardings=(state_sh, metrics_sh),
            donate_argnums=(0,),
        )

    return build, place_state


def make_sharded_render(
    field: Field,
    settings: RenderSettings,
    mesh: Mesh,
    camera: cameras.CameraParams,
    data_axis: str = "data",
    chunk_size: int = 4096,
):
    """Data-parallel full-image render: each chip renders its ray shard.

    The eval-side counterpart of the sharded train step (SURVEY.md §5.8:
    "each chip renders its ray shard; all_gather reassembles frames"):
    pixel rays are generated in-jit and rendered in fixed-size chunks via
    ``lax.map`` (bounding per-chip live memory for EVERY field, not just the
    tile-streaming fused kernel — an unchunked 800^2 x 256-sample frame
    materializes multi-GB intermediates on the XLA/NGP paths, ADVICE.md),
    with each chunk's rays split over ``data_axis`` by a sharding
    constraint. Per-chunk RNG keys are folded from each chunk's first pixel
    index, exactly like ``renderer.render_image`` — so renders are
    bit-identical across device counts and to the single-device path
    whenever the chunk grids match.

    Returns ``render(params_coarse, params_fine, extrinsic, key) -> (H, W, 3)``.
    """
    from torch_nerf_tpu.renderer import render_rays  # noqa: PLC0415

    h, w = camera.img_height, camera.img_width
    num_pixels = h * w
    num_devices = int(mesh.shape[data_axis])
    if chunk_size % num_devices != 0:
        chunk_size = -(-chunk_size // num_devices) * num_devices
    num_chunks = -(-num_pixels // chunk_size)

    ray_sharding = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())

    def render_fn(params_coarse, params_fine, extrinsic, key):
        pixel_idx = jnp.minimum(
            jnp.arange(num_chunks * chunk_size, dtype=jnp.int32), num_pixels - 1
        )
        ray_o, ray_d = cameras.rays_for_pixels(
            pixel_idx,
            camera,
            extrinsic,
            use_ndc=settings.project_to_ndc,
            ndc_z_near=settings.ndc_z_near,
        )
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(num_chunks, dtype=jnp.int32) * chunk_size
        )

        def render_chunk(args):
            o, d, k = args
            o = jax.lax.with_sharding_constraint(o, ray_sharding)
            d = jax.lax.with_sharding_constraint(d, ray_sharding)
            out = render_rays(field, params_coarse, params_fine, o, d, k, settings)
            return out["rgb_fine"] if settings.hierarchical else out["rgb_coarse"]

        rgb = jax.lax.map(
            render_chunk,
            (
                ray_o.reshape(num_chunks, chunk_size, 3),
                ray_d.reshape(num_chunks, chunk_size, 3),
                keys,
            ),
        )
        return rgb.reshape(-1, 3)[:num_pixels].reshape(h, w, 3)

    return jax.jit(
        render_fn,
        in_shardings=(replicated, replicated, replicated, replicated),
        out_shardings=replicated,
    )


def make_sharded_image_train_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    camera: cameras.CameraParams,
    mesh: Mesh,
    num_pixels: int = 4096,
    precrop: bool = False,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    aux_loss_fn=None,
    occupancy_cfg=None,
):
    """Data-parallel version of ``train.make_image_train_step``.

    Same semantics (pick a random image from the on-device pool, sample
    ``num_pixels`` distinct pixels, render, MSE, Adam) but with the ray batch
    sharded over ``data_axis``: pixel selection runs replicated from the
    shared key (every chip agrees without communication, SURVEY.md §5.8),
    then a sharding constraint splits rays/targets across the mesh and XLA
    inserts the gradient all-reduce over ICI/DCN.

    Returns ``(build, place_state)`` like :func:`make_sharded_train_step`;
    the built step has signature ``step(state, images (B, H*W, 3),
    poses (B, 4, 4), key)`` — or ``step(state, grid, images, poses, key) ->
    (state, grid, metrics)`` with ``occupancy_cfg`` (``occupancy.py``): the
    grid stays REPLICATED (it is tiny and read per-ray), each chip prunes its
    own ray shard locally, and the periodic density sweep runs under the same
    sharding annotations so its cell batch partitions like any other point
    batch.
    """
    # occupancy pruning must fall through to the generic path: the fused DP
    # ray step is a 5-arg (state, rays...) function and cannot thread the
    # grid (matches single-device make_ray_train_step, where the occupancy
    # check precedes the fused-kernel branch)
    if (
        field.fused_cfg is not None
        and model_axis is None
        and aux_loss_fn is None
        and occupancy_cfg is None
    ):
        ray_step = _make_fused_dp_ray_step(field, settings, optim_cfg, mesh, data_axis)
    else:
        # aux losses (e.g. the packed-layout face-consistency penalty) are
        # pure functions of the REPLICATED params + a replicated key: every
        # chip computes the identical term, so grads stay consistent without
        # extra collectives
        ray_step = make_ray_train_step(
            field, settings, optim_cfg, force_generic=True,
            aux_loss_fn=aux_loss_fn, occupancy_cfg=occupancy_cfg,
        )
    num_total = camera.img_height * camera.img_width
    crop = precrop_pixel_indices(camera.img_height, camera.img_width) if precrop else None
    if crop is not None:
        num_pixels = min(num_pixels, crop.shape[0])
    if num_pixels % int(mesh.shape[data_axis]) != 0:
        raise ValueError(
            f"num_pixels={num_pixels} must divide evenly over the "
            f"{mesh.shape[data_axis]}-way '{data_axis}' axis"
        )

    ray_sharding = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())

    def place_state(state: TrainState) -> TrainState:
        return replicate_state(mesh, state, model_axis)

    def make_ray_batch(images, poses, key):
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
            pixel_idx,
            camera,
            pose,
            use_ndc=settings.project_to_ndc,
            ndc_z_near=settings.ndc_z_near,
        )
        rgb_gt = image[pixel_idx]
        # split the ray batch across chips; grads psum back automatically
        ray_o = jax.lax.with_sharding_constraint(ray_o, ray_sharding)
        ray_d = jax.lax.with_sharding_constraint(ray_d, ray_sharding)
        rgb_gt = jax.lax.with_sharding_constraint(rgb_gt, ray_sharding)
        return ray_o, ray_d, rgb_gt, render_key

    if occupancy_cfg is not None:

        def occ_step_fn(state: TrainState, grid, images, poses, key):
            ray_o, ray_d, rgb_gt, render_key = make_ray_batch(images, poses, key)
            grid = jax.lax.with_sharding_constraint(grid, replicated)
            return ray_step(state, grid, ray_o, ray_d, rgb_gt, render_key)

        def build(state: TrainState):
            state_sh = _state_shardings(mesh, state, model_axis)
            return jax.jit(
                occ_step_fn,
                in_shardings=(state_sh, replicated, replicated, replicated, replicated),
                out_shardings=(state_sh, replicated, None),
                donate_argnums=(0, 1),
            )

        return build, place_state

    def step_fn(state: TrainState, images, poses, key):
        ray_o, ray_d, rgb_gt, render_key = make_ray_batch(images, poses, key)
        return ray_step(state, ray_o, ray_d, rgb_gt, render_key)

    def build(state: TrainState):
        state_sh = _state_shardings(mesh, state, model_axis)
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, replicated, replicated, replicated),
            out_shardings=(state_sh, None),
            donate_argnums=(0,),
        )

    return build, place_state
