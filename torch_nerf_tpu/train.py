"""Jit-compiled end-to-end training step for NeRF on TPU.

Replaces the reference's session/training orchestration
(``/root/reference/torch_nerf/runners/runner_utils.py:169-414`` and
``runners/train.py:88-230``) with a single donated, jit-compiled function:
image selection, pixel sampling, ray generation, coarse+fine rendering, MSE
loss, Adam update, and exponential LR decay all trace into one XLA program.
The entire (small) image set lives in device HBM, so a train step moves zero
bytes over PCIe — the reference's DataLoader worker processes and
``.cuda()`` copies (``runner_utils.py:327``) have no equivalent here.

Optimization semantics match the reference: Adam with
``lr(t) = init_lr * (end_lr / init_lr)^(t / num_iter)`` stepped per
iteration (``runner_utils.py:690-711``), loss = coarse MSE + fine MSE summed
before a single backward (``runners/train.py:170-216``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_nerf_tpu import cameras, occupancy
from torch_nerf_tpu.fields import Field
from torch_nerf_tpu.ops import integration, sampling
from torch_nerf_tpu.renderer import RenderSettings, render_rays


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Mirrors ``configs/train_params/nerf.yaml:1-8``.

    ``table_weight_decay`` has no reference counterpart (the reference's
    Adam is decay-free): it applies decoupled weight decay to hash-TABLE
    leaves only (the regularizer upstream instant-ngp uses on its hash
    grids) and is 0 by default so reference runs are bit-faithful.
    """

    num_iter: int = 300_000
    init_lr: float = 5.0e-4
    end_lr: float = 5.0e-5
    eps: float = 1.0e-8
    table_weight_decay: float = 0.0


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Dict[str, Any]  # {"coarse": pytree} or {"coarse":..., "fine":...}
    opt_state: Any


def lr_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Exponential decay from init_lr to end_lr over num_iter steps.

    Equivalent to torch ``ExponentialLR(gamma=(end/init)^(1/num_iter))``
    stepped once per optimizer step (``runner_utils.py:702-711``).
    """
    gamma = (cfg.end_lr / cfg.init_lr) ** (1.0 / cfg.num_iter)
    return optax.exponential_decay(
        init_value=cfg.init_lr, transition_steps=1, decay_rate=gamma
    )


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    adam = optax.adam(learning_rate=lr_schedule(cfg), eps=cfg.eps)
    if cfg.table_weight_decay <= 0.0:
        return adam
    # decoupled decay on hash-table leaves only (dict key "tables" anywhere
    # in the params tree); MLP weights stay decay-free like the reference
    def table_mask(params):
        def mark(tree, is_table):
            if isinstance(tree, dict):
                return {k: mark(v, is_table or k == "tables") for k, v in tree.items()}
            return is_table

        return mark(params, False)

    decay = optax.masked(
        optax.add_decayed_weights(cfg.table_weight_decay), table_mask
    )
    # decay feeds INTO Adam (L2-through-Adam, upstream instant-ngp's choice
    # for its hash grids), so it rides the same moment normalization and lr
    return optax.chain(decay, adam)


def create_train_state(
    key: jax.Array,
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
) -> TrainState:
    """Initialize coarse (and fine, if hierarchical) params + Adam state."""
    coarse_key, fine_key = jax.random.split(key)
    params: Dict[str, Any] = {"coarse": field.init(coarse_key)}
    if settings.hierarchical:
        params["fine"] = field.init(fine_key)
    optimizer = make_optimizer(optim_cfg)
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)


def ray_loss_fn(
    field: Field,
    params: Dict[str, Any],
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Photometric loss on a ray batch: coarse MSE + fine MSE.

    (``runners/train.py:170-216``: both losses summed into one backward.)
    """
    out = render_rays(
        field,
        params["coarse"],
        params.get("fine"),
        ray_origin,
        ray_dir,
        key,
        settings,
    )
    coarse_loss = jnp.mean((out["rgb_coarse"] - rgb_gt) ** 2)
    loss = coarse_loss
    metrics = {"coarse_loss": coarse_loss}
    if settings.hierarchical:
        fine_loss = jnp.mean((out["rgb_fine"] - rgb_gt) ** 2)
        loss = loss + fine_loss
        metrics["fine_loss"] = fine_loss
    metrics["loss"] = loss
    return loss, metrics


def draw_train_randomness(
    key: jax.Array, num_rays: int, settings: RenderSettings
) -> Dict[str, jnp.ndarray]:
    """All uniform draws one train step consumes, keyed exactly like
    ``render_rays`` (same split tree, same shapes), as (num_rays, .) arrays.

    Drawing them up front makes the rest of the step pure per-ray data flow:
    the sharded trainer draws the global batch replicated and splits the rows
    over the mesh with the rays, so sharded numerics match single-device.
    """
    coarse_key, fine_key = jax.random.split(key)
    rand = {
        "coarse_jitter": jax.random.uniform(
            coarse_key, (num_rays, settings.num_samples_coarse), jnp.float32
        )
    }
    if settings.hierarchical:
        ck2, fk2 = jax.random.split(fine_key)
        u_key, jitter_key = jax.random.split(fk2)
        rand["fine_coarse_jitter"] = jax.random.uniform(
            ck2, (num_rays, settings.num_samples_coarse), jnp.float32
        )
        rand["fine_u"] = jax.random.uniform(
            u_key, (num_rays, settings.num_samples_fine), jnp.float32
        )
        rand["fine_jitter"] = jax.random.uniform(
            jitter_key, (num_rays, settings.num_samples_fine), jnp.float32
        )
    return rand


def fused_loss_and_grad(
    field: Field,
    params: Dict[str, Any],
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    rand: Dict[str, jnp.ndarray],
    settings: RenderSettings,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Loss metrics + gradients through the fully-fused Pallas train kernel.

    Mathematically identical to ``jax.grad`` of ``ray_loss_fn`` (same
    sampling given ``rand = draw_train_randomness(key, ...)``, same
    coarse+fine MSE of ``runners/train.py:170-216``), but each render pass
    runs encode -> MLP -> composite -> MSE -> backward in ONE kernel
    (``ops.pallas.fused_train``) — activations never leave VMEM, so the
    backward does not rematerialize the forward and the compositing/loss
    glue costs no HBM round-trips. Contains no RNG and no cross-ray
    coupling beyond the final means, so it is safe inside ``shard_map``
    (grads/metrics are per-shard means; callers ``pmean`` them).
    """
    from torch_nerf_tpu.ops import sampling  # noqa: PLC0415
    from torch_nerf_tpu.ops.pallas.fused_train import fused_train_pass  # noqa: PLC0415

    num_rays = ray_origin.shape[0]
    bins, bin_size = sampling.t_bins(
        settings.t_near, settings.t_far, settings.num_samples_coarse
    )

    def pass_inputs(t_samples):
        # sample positions o + t*d are computed inside the kernel; only the
        # depth/interval columns cross HBM
        return ray_origin, ray_dir, t_samples, sampling.t_deltas(t_samples)

    t_coarse = bins[None, :] + bin_size * rand["coarse_jitter"]
    rgb_c, weights_c, grads_c = fused_train_pass(
        params["coarse"], *pass_inputs(t_coarse), rgb_gt, field.fused_cfg, num_rays
    )
    coarse_loss = jnp.mean((rgb_c - rgb_gt) ** 2)
    metrics = {"coarse_loss": coarse_loss, "loss": coarse_loss}
    grads: Dict[str, Any] = {"coarse": grads_c}

    if settings.hierarchical:
        t_fine = sampling.hierarchical_t_samples_from_uniforms(
            weights_c,
            settings.t_near,
            settings.t_far,
            rand["fine_coarse_jitter"],
            rand["fine_u"],
            rand["fine_jitter"],
        )
        rgb_f, _, grads_f = fused_train_pass(
            params["fine"], *pass_inputs(t_fine), rgb_gt, field.fused_cfg, num_rays
        )
        fine_loss = jnp.mean((rgb_f - rgb_gt) ** 2)
        metrics["fine_loss"] = fine_loss
        metrics["loss"] = coarse_loss + fine_loss
        grads["fine"] = grads_f

    return metrics, grads


def pruned_ray_loss_fn(
    field: Field,
    params: Dict[str, Any],
    grid: jnp.ndarray,
    occ_cfg: "occupancy.OccupancyConfig",
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Photometric loss with occupancy-pruned sampling (single-pass models).

    Draws the reference's ``num_samples_coarse`` stratified candidates
    (``stratified_sampler.py:92-109`` semantics), keeps the static
    ``occ_cfg.keep_samples`` occupied ones (``occupancy.prune_t_samples``),
    and composites them against the dense interval lengths — identical to
    the dense quadrature whenever the pruned samples carry zero density.
    """
    num_rays = ray_origin.shape[0]
    t_dense = sampling.stratified_t_samples(
        key, num_rays, settings.t_near, settings.t_far, settings.num_samples_coarse
    )
    t_sel, delta_sel = occupancy.prune_t_samples(
        grid, occ_cfg, ray_origin, ray_dir, t_dense, step
    )
    pts = sampling.points_along_rays(ray_origin, ray_dir, t_sel)
    dirs = jnp.broadcast_to(ray_dir[:, None, :], pts.shape)
    sigma, radiance = field.apply(params["coarse"], pts, dirs)
    rgb, _ = integration.composite(sigma, radiance, delta_sel)
    loss = jnp.mean((rgb - rgb_gt) ** 2)
    return loss, {"coarse_loss": loss, "loss": loss}


def pruned_hierarchical_loss_fn(
    field: Field,
    params: Dict[str, Any],
    grid: jnp.ndarray,
    occ_cfg: "occupancy.OccupancyConfig",
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    step: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Hierarchical photometric loss with occupancy pruning on BOTH passes.

    The coarse pass draws the reference's ``num_samples_coarse`` stratified
    candidates and keeps the static ``keep_samples`` occupied ones. Its
    weights are scattered back onto the uniform coarse bins
    (``occupancy.scatter_weights_to_bins`` — pruned bins get weight 0,
    consistent with their empty-space densities), the fine pass merges a
    fresh stratification with the inverse-CDF draws exactly like the dense
    pipeline (``stratified_sampler.py:57-90``), and the merged set is then
    itself pruned to ``keep_samples_fine`` (when > 0).
    """
    num_rays = ray_origin.shape[0]
    s_c = settings.num_samples_coarse
    coarse_key, fine_key = jax.random.split(key)

    def pruned_pass(params_pass, t_dense, keep):
        t_sel, delta_sel = occupancy.prune_t_samples(
            grid, occ_cfg, ray_origin, ray_dir, t_dense, step, keep=keep
        )
        pts = sampling.points_along_rays(ray_origin, ray_dir, t_sel)
        dirs = jnp.broadcast_to(ray_dir[:, None, :], pts.shape)
        sigma, radiance = field.apply(params_pass, pts, dirs)
        rgb, weights = integration.composite(sigma, radiance, delta_sel)
        return rgb, weights, t_sel

    t_dense = sampling.stratified_t_samples(
        coarse_key, num_rays, settings.t_near, settings.t_far, s_c
    )
    rgb_c, weights_c, t_c = pruned_pass(
        params["coarse"], t_dense, occ_cfg.keep_samples
    )
    coarse_loss = jnp.mean((rgb_c - rgb_gt) ** 2)
    metrics = {"coarse_loss": coarse_loss}

    w_dense = occupancy.scatter_weights_to_bins(
        t_c, jax.lax.stop_gradient(weights_c), settings.t_near, settings.t_far, s_c
    )
    t_merged = sampling.hierarchical_t_samples(
        fine_key, w_dense, settings.t_near, settings.t_far, s_c,
        settings.num_samples_fine,
    )
    keep_fine = occ_cfg.keep_samples_fine or t_merged.shape[-1]
    rgb_f, _, _ = pruned_pass(params["fine"], t_merged, keep_fine)
    fine_loss = jnp.mean((rgb_f - rgb_gt) ** 2)
    loss = coarse_loss + fine_loss
    metrics.update(fine_loss=fine_loss, loss=loss)
    return loss, metrics


def fused_pruned_loss_and_grad(
    field: Field,
    params: Dict[str, Any],
    grid: jnp.ndarray,
    occ_cfg: "occupancy.OccupancyConfig",
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    step: jnp.ndarray,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Occupancy-pruned loss + gradients through the fused Pallas kernel.

    Same sampling semantics as :func:`pruned_ray_loss_fn` /
    :func:`pruned_hierarchical_loss_fn`, but each pass's
    encode -> MLP -> composite -> MSE -> backward runs in ONE kernel
    (``ops.pallas.fused_train``). Pruning happens in XLA on the (N, S)
    depth columns BEFORE the kernel — the static ``keep`` shapes mean the
    kernel just sees a smaller sample axis, multiplying its throughput by
    S/keep with no kernel changes (round-3's "pruning and the fused kernel
    are mutually exclusive" gap, closed).
    """
    from torch_nerf_tpu.ops.pallas.fused_train import fused_train_pass  # noqa: PLC0415

    num_rays = ray_origin.shape[0]
    s_c = settings.num_samples_coarse
    if settings.hierarchical:
        coarse_key, fine_key = jax.random.split(key)
    else:
        # match pruned_ray_loss_fn's stream exactly (single-pass runs are
        # bit-comparable between the fused and generic paths)
        coarse_key, fine_key = key, None

    t_dense = sampling.stratified_t_samples(
        coarse_key, num_rays, settings.t_near, settings.t_far, s_c
    )
    t_c, delta_c = occupancy.prune_t_samples(
        grid, occ_cfg, ray_origin, ray_dir, t_dense, step
    )
    rgb_c, weights_c, grads_c = fused_train_pass(
        params["coarse"], ray_origin, ray_dir, t_c, delta_c, rgb_gt,
        field.fused_cfg, num_rays,
    )
    coarse_loss = jnp.mean((rgb_c - rgb_gt) ** 2)
    metrics = {"coarse_loss": coarse_loss, "loss": coarse_loss}
    grads: Dict[str, Any] = {"coarse": grads_c}

    if settings.hierarchical:
        w_dense = occupancy.scatter_weights_to_bins(
            t_c, weights_c, settings.t_near, settings.t_far, s_c
        )
        t_merged = sampling.hierarchical_t_samples(
            fine_key, w_dense, settings.t_near, settings.t_far, s_c,
            settings.num_samples_fine,
        )
        if occ_cfg.keep_samples_fine > 0:
            t_f, delta_f = occupancy.prune_t_samples(
                grid, occ_cfg, ray_origin, ray_dir, t_merged, step,
                keep=occ_cfg.keep_samples_fine,
            )
        else:
            t_f, delta_f = t_merged, sampling.t_deltas(t_merged)
        rgb_f, _, grads_f = fused_train_pass(
            params["fine"], ray_origin, ray_dir, t_f, delta_f, rgb_gt,
            field.fused_cfg, num_rays,
        )
        fine_loss = jnp.mean((rgb_f - rgb_gt) ** 2)
        metrics["fine_loss"] = fine_loss
        metrics["loss"] = coarse_loss + fine_loss
        grads["fine"] = grads_f

    return metrics, grads


def make_ray_train_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    force_generic: bool = False,
    aux_loss_fn: Optional[Callable[[Dict[str, Any], jax.Array], jnp.ndarray]] = None,
    occupancy_cfg: Optional["occupancy.OccupancyConfig"] = None,
) -> Callable[..., Tuple]:
    """Train step over a pre-assembled ray batch (the shardable core).

    ``step(state, ray_origin (N,3), ray_dir (N,3), rgb_gt (N,3), key)``.
    This is the function the data-parallel path shards over the ``rays``
    mesh axis; gradients are averaged by XLA-inserted collectives. Fields
    carrying a ``fused_cfg`` train through the fully-fused Pallas kernel
    (``fused_loss_and_grad``); everything else goes through autodiff.

    ``aux_loss_fn(params, key) -> scalar`` (optional) adds a regularizer to
    the photometric loss — e.g. the packed-layout face-consistency penalty
    (``fields_ngp.make_encode_smoothness_loss``). Generic-autodiff path only.

    ``occupancy_cfg`` (optional, single-pass models only) enables
    occupancy-grid sample pruning (``occupancy.py``): the step becomes
    ``step(state, grid, ray_origin, ray_dir, rgb_gt, key) ->
    (state, grid, metrics)`` — it refreshes the density grid every
    ``update_every`` steps and renders only the static ``keep_samples``
    occupied candidates per ray.
    """
    optimizer = make_optimizer(optim_cfg)
    use_fused = field.fused_cfg is not None and not force_generic
    if use_fused and aux_loss_fn is not None:
        raise ValueError("aux_loss_fn requires the generic autodiff path.")
    if occupancy_cfg is not None:
        if occupancy_cfg.keep_samples > settings.num_samples_coarse:
            raise ValueError("keep_samples must be <= num_samples_coarse.")
        max_fine = settings.num_samples_coarse + settings.num_samples_fine
        if occupancy_cfg.keep_samples_fine > max_fine:
            raise ValueError(
                "keep_samples_fine must be <= num_samples_coarse + "
                "num_samples_fine (the merged fine candidate count)."
            )
        density_fn = occupancy.make_density_fn(field)
        use_fused_occ = use_fused and aux_loss_fn is None

        def occ_step_fn(state: TrainState, grid, ray_origin, ray_dir, rgb_gt, key):
            occ_key, render_key, aux_key = jax.random.split(key, 3)
            grid = occupancy.maybe_update_grid(
                grid, density_fn, state.params, occ_key, state.step, occupancy_cfg
            )

            if use_fused_occ:
                metrics, grads = fused_pruned_loss_and_grad(
                    field, state.params, grid, occupancy_cfg, ray_origin,
                    ray_dir, rgb_gt, render_key, settings, state.step,
                )
            else:
                loss_fn = (
                    pruned_hierarchical_loss_fn
                    if settings.hierarchical
                    else pruned_ray_loss_fn
                )

                def loss_wrapper(params):
                    loss, metrics = loss_fn(
                        field, params, grid, occupancy_cfg, ray_origin, ray_dir,
                        rgb_gt, render_key, settings, state.step,
                    )
                    if aux_loss_fn is not None:
                        aux = aux_loss_fn(params, aux_key)
                        metrics["aux_loss"] = aux
                        loss = loss + aux
                        metrics["loss"] = loss
                    return loss, metrics

                (_, metrics), grads = jax.value_and_grad(loss_wrapper, has_aux=True)(
                    state.params
                )
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1, params=new_params, opt_state=new_opt_state
            )
            return new_state, grid, metrics

        return occ_step_fn

    def step_fn(state: TrainState, ray_origin, ray_dir, rgb_gt, key):
        if use_fused:
            rand = draw_train_randomness(key, ray_origin.shape[0], settings)
            metrics, grads = fused_loss_and_grad(
                field, state.params, ray_origin, ray_dir, rgb_gt, rand, settings
            )
        else:
            # RNG stream for the render is unchanged when no aux loss exists
            # (keeps pre-existing runs/tests bit-identical)
            if aux_loss_fn is not None:
                render_key, aux_key = jax.random.split(key)
            else:
                render_key, aux_key = key, None

            def loss_wrapper(params):
                loss, metrics = ray_loss_fn(
                    field, params, ray_origin, ray_dir, rgb_gt, render_key, settings
                )
                if aux_loss_fn is not None:
                    aux = aux_loss_fn(params, aux_key)
                    metrics["aux_loss"] = aux
                    loss = loss + aux
                    metrics["loss"] = loss
                return loss, metrics

            (_, metrics), grads = jax.value_and_grad(loss_wrapper, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            metrics,
        )

    return step_fn


def precrop_pixel_indices(img_height: int, img_width: int) -> np.ndarray:
    """Flat indices of the center-crop region used for early-epoch sampling.

    Matches ``runners/train.py:150-169``: rows/cols within ``center +-
    center // 2`` where ``center = (dim - 1) // 2`` (row-major flat indices,
    un-flipped — the y-flip happens later in screen-coord generation, exactly
    as in the reference).
    """
    ci = (img_height - 1) // 2
    cj = (img_width - 1) // 2
    rows = np.arange(ci - ci // 2, ci + ci // 2)
    cols = np.arange(cj - cj // 2, cj + cj // 2)
    grid = rows[:, None] * img_width + cols[None, :]
    return grid.reshape(-1).astype(np.int32)


def sample_pixels_without_replacement(
    key: jax.Array, num_candidates: int, num_pixels: int
) -> jnp.ndarray:
    """Draw ``num_pixels`` distinct indices from ``range(num_candidates)``.

    The reference uses host-side ``np.random.choice(..., replace=False)``
    (``volume_renderer.py:122-128``); on TPU we take the top-k of i.i.d.
    uniforms — an in-jit, O(n log k) without-replacement sampler.
    """
    u = jax.random.uniform(key, (num_candidates,))
    _, idx = jax.lax.top_k(u, num_pixels)
    return idx.astype(jnp.int32)


def make_image_train_step(
    field: Field,
    settings: RenderSettings,
    optim_cfg: OptimConfig,
    camera: cameras.CameraParams,
    num_pixels: int = 4096,
    precrop: bool = False,
    donate: bool = True,
    aux_loss_fn: Optional[Callable[[Dict[str, Any], jax.Array], jnp.ndarray]] = None,
    occupancy_cfg: Optional["occupancy.OccupancyConfig"] = None,
):
    """Full train step from the on-device image/pose pool.

    ``step(state, images (B, H*W, 3), poses (B, 4, 4), key)`` — picks a
    random image, samples ``num_pixels`` distinct pixels (center-cropped when
    ``precrop``, the epoch<10 trick of ``runners/train.py:150-169``),
    generates rays, and applies the ray train step. Everything is inside one
    jit with the state donated.

    With ``occupancy_cfg`` the occupancy grid threads through:
    ``step(state, grid, images, poses, key) -> (state, grid, metrics)``.
    """
    ray_step = make_ray_train_step(
        field, settings, optim_cfg, aux_loss_fn=aux_loss_fn, occupancy_cfg=occupancy_cfg
    )
    num_total = camera.img_height * camera.img_width
    crop = precrop_pixel_indices(camera.img_height, camera.img_width) if precrop else None
    if crop is not None:
        # the reference's randperm-then-slice keeps at most the crop-region
        # size (runners/train.py:166-168); small images train on fewer rays
        num_pixels = min(num_pixels, crop.shape[0])

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
        return ray_o, ray_d, image[pixel_idx], render_key

    if occupancy_cfg is not None:

        def occ_step_fn(state: TrainState, grid, images, poses, key):
            ray_o, ray_d, rgb_gt, render_key = make_ray_batch(images, poses, key)
            return ray_step(state, grid, ray_o, ray_d, rgb_gt, render_key)

        donate_argnums = (0, 1) if donate else ()
        return jax.jit(occ_step_fn, donate_argnums=donate_argnums)

    def step_fn(state: TrainState, images, poses, key):
        ray_o, ray_d, rgb_gt, render_key = make_ray_batch(images, poses, key)
        return ray_step(state, ray_o, ray_d, rgb_gt, render_key)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
