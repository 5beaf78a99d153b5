"""Session factory: config -> dataset, field, settings, train state.

The functional counterpart of the reference's ``init_session`` layer
(``/root/reference/torch_nerf/runners/runner_utils.py:26-166``): small
builder functions shared by the train/render/evaluate CLIs. No stateful
session object — each builder returns plain values/pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import config as cfg_mod
from torch_nerf_tpu.datasets import synthetic
from torch_nerf_tpu.datasets.blender import PosedImages, load_blender
from torch_nerf_tpu.datasets.llff import llff_holdout_index, llff_t_bounds, load_llff
from torch_nerf_tpu.fields import Field, make_nerf_field
from torch_nerf_tpu.renderer import RenderSettings
from torch_nerf_tpu.train import OptimConfig


def build_dataset(cfg: cfg_mod.ExperimentConfig, split: str = "train") -> PosedImages:
    """Load the dataset named by the config (``runner_utils.py:470-502``).

    Evaluation protocol (matches the reference): the "val" and "test"
    splits are always served at FULL resolution regardless of
    ``data.half_res`` (``runners/train.py:67-68`` loads the val split with
    ``half_res=False``; ``runners/render.py:44-45`` does the same for the
    test split). For LLFF — which ships no split files — the view closest
    to the average pose is held out (``load_llff.py:561-565``): "train"
    excludes it, "val"/"test" contain exactly it.
    """
    data = cfg.data
    if data.dataset_type == "nerf_synthetic":
        return load_blender(
            data.data_root,
            data.scene_name,
            split=split,
            half_res=data.half_res if split == "train" else False,
            white_bg=data.white_bg,
        )
    if data.dataset_type == "nerf_llff":
        full = load_llff(
            data.data_root,
            data.scene_name,
            factor=data.factor,
            recenter=data.recenter,
            bd_factor=data.bd_factor,
            spherify=data.spherify,
        )
        holdout = llff_holdout_index(full.poses)
        keep = (
            [i for i in range(full.num_views) if i != holdout]
            if split == "train"
            else [holdout]
        )
        return dataclasses.replace(
            full,
            images=full.images[keep],
            poses=full.poses[keep],
            image_names=[full.image_names[i] for i in keep],
        )
    if data.dataset_type == "gaussian_blobs":
        size = data.img_size
        if split != "train" and data.half_res:
            size *= 2  # evaluate at full resolution (train.py:68)
        images, poses, camera, _ = synthetic.make_dataset(
            num_views=data.num_views, img_size=size, split=split
        )
        v = images.shape[0]
        return PosedImages(
            images=images.reshape(v, size, size, 3),
            poses=poses,
            camera=camera,
            render_poses=synthetic.orbit_poses(40),
            image_names=[f"blob_{split}_{i:03d}" for i in range(v)],
        )
    raise ValueError(f"Unsupported dataset_type '{data.dataset_type}'.")


def multiscene_scene_names(cfg: cfg_mod.ExperimentConfig) -> list:
    """The per-scene names of a multi-scene run: ``data.scene_name`` as a
    comma-separated list (e.g. ``scene_name=lego,ship`` with
    ``num_scenes=2`` — BASELINE configs[3]'s Blender-suite batching)."""
    names = [s.strip() for s in cfg.data.scene_name.split(",") if s.strip()]
    if len(names) != cfg.data.num_scenes:
        raise ValueError(
            f"data.num_scenes={cfg.data.num_scenes} needs that many "
            f"comma-separated names in data.scene_name; got {names}."
        )
    return names


def build_multiscene_dataset(
    cfg: cfg_mod.ExperimentConfig, scene_idx: int, split: str = "train"
) -> PosedImages:
    """One scene of a multi-scene run (train CLI pools / render ``--scene``).

    ``gaussian_blobs`` scenes are procedurally seeded from
    ``cfg.seed * 1000 + scene_idx`` (the train CLI's convention), so render
    and evaluate reconstruct scene N's ground truth exactly;
    ``nerf_synthetic`` scenes come from the comma-separated
    ``data.scene_name`` list.
    """
    data = cfg.data
    if data.dataset_type == "gaussian_blobs":
        size = data.img_size
        if split != "train" and data.half_res:
            size *= 2
        scene = synthetic.GaussianBlobScene.random(cfg.seed * 1000 + scene_idx)
        images, poses, camera, _ = synthetic.make_dataset(
            num_views=data.num_views, img_size=size, scene=scene, split=split
        )
        v = images.shape[0]
        return PosedImages(
            images=images.reshape(v, size, size, 3),
            poses=poses,
            camera=camera,
            render_poses=synthetic.orbit_poses(40),
            image_names=[f"blob{scene_idx}_{split}_{i:03d}" for i in range(v)],
        )
    if data.dataset_type == "nerf_synthetic":
        names = multiscene_scene_names(cfg)
        return load_blender(
            data.data_root,
            names[scene_idx],
            split=split,
            half_res=data.half_res if split == "train" else False,
            white_bg=data.white_bg,
        )
    raise ValueError(
        "Multi-scene training supports dataset_type gaussian_blobs or "
        f"nerf_synthetic; got '{data.dataset_type}'."
    )


def build_render_settings(
    cfg: cfg_mod.ExperimentConfig, dataset: Optional[PosedImages] = None
) -> RenderSettings:
    """RenderSettings from config, applying the LLFF t-bound rewrite
    (``runner_utils.py:488-502``) when the dataset provides z-bounds."""
    r = cfg.renderer
    t_near, t_far = r.t_near, r.t_far
    if dataset is not None and dataset.z_bounds is not None:
        t_near, t_far = llff_t_bounds(dataset.z_bounds, r.project_to_ndc)
    return RenderSettings(
        num_samples_coarse=r.num_samples_coarse,
        num_samples_fine=r.num_samples_fine,
        t_near=t_near,
        t_far=t_far,
        project_to_ndc=r.project_to_ndc,
    )


def build_field(cfg: cfg_mod.ExperimentConfig) -> Field:
    """Field from the network + signal_encoder groups
    (``runner_utils.py:569-660``)."""
    net = cfg.network
    enc = cfg.signal_encoder
    compute_dtype = jnp.dtype(cfg.device.compute_dtype)

    if net.type == "nerf":
        if enc.type != "pe":
            raise ValueError("The classic NeRF network expects positional encoding.")
        use_pallas = cfg.parallel.use_pallas
        if use_pallas is None:
            # auto: the fused kernel is the TPU hot path; it is tuned for
            # MXU-width trunks (the XLA path wins on narrow debug configs)
            import jax  # noqa: PLC0415

            use_pallas = jax.default_backend() == "tpu" and net.feat_dim >= 128
        return make_nerf_field(
            pos_dim=net.pos_dim,
            view_dir_dim=net.view_dir_dim,
            coord_encode_level=enc.coord_encode_level,
            dir_encode_level=enc.dir_encode_level,
            include_input=enc.include_input,
            feat_dim=net.feat_dim,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
        )
    if net.type == "instant_nerf":
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field  # noqa: PLC0415

        return make_instant_ngp_field(
            num_level=net.num_level,
            log_max_entry_per_level=net.log_max_entry_per_level,
            table_feat_dim=net.table_feat_dim,
            min_res=net.min_res,
            max_res=net.max_res,
            sh_degree=enc.degree,
            compute_dtype=compute_dtype,
            table_layout=net.table_layout,
        )
    raise ValueError(f"Unsupported network type '{net.type}'.")


def build_aux_loss(cfg: cfg_mod.ExperimentConfig):
    """Optional regularizer from the objective group: the packed-layout
    voxel-face consistency penalty (``objective.encode_smoothness_weight``).
    Returns ``aux(params, key) -> scalar`` or None."""
    w = cfg.objective.encode_smoothness_weight
    if w <= 0.0:
        return None
    net = cfg.network
    if net.type != "instant_nerf" or net.table_layout == "hash":
        raise ValueError(
            "encode_smoothness_weight applies to the packed instant-NGP "
            f"layouts; got network.type='{net.type}', "
            f"table_layout='{net.table_layout}'."
        )
    from torch_nerf_tpu.fields_ngp import make_encode_smoothness_loss  # noqa: PLC0415

    raw = make_encode_smoothness_loss(
        net.num_level,
        min_res=net.min_res,
        max_res=net.max_res,
        table_feat_dim=net.table_feat_dim,
        table_layout=net.table_layout,
        num_probes=cfg.objective.encode_smoothness_probes,
    )

    def aux(params, key):
        import jax  # noqa: PLC0415

        total = w * raw(params["coarse"], key)
        if "fine" in params:
            total = total + w * raw(params["fine"], jax.random.fold_in(key, 1))
        return total

    return aux


def build_optim_config(cfg: cfg_mod.ExperimentConfig) -> OptimConfig:
    o = cfg.train_params.optim
    if o.optim_type != "adam" or o.scheduler_type != "exp":
        raise ValueError(
            f"Unsupported optimizer/scheduler '{o.optim_type}'/'{o.scheduler_type}'."
        )
    # the objective/scene groups mirror the reference's Hydra tree; only one
    # value of each exists (configs/objective/nerf.yaml, configs/scene/
    # cube.yaml) — reject anything else instead of silently ignoring it
    if cfg.objective.loss_type != "nerf_default":
        raise ValueError(f"Unsupported loss_type '{cfg.objective.loss_type}'.")
    if cfg.scene.type != "cube":
        raise ValueError(f"Unsupported scene type '{cfg.scene.type}'.")
    return OptimConfig(
        num_iter=o.num_iter,
        init_lr=o.init_lr,
        end_lr=o.end_lr,
        eps=o.eps,
        table_weight_decay=o.table_weight_decay,
    )


def build_occupancy_cfg(cfg: cfg_mod.ExperimentConfig):
    """Occupancy-pruning config, or None when disabled (``occupancy.py``)."""
    o = cfg.occupancy
    if not o.enabled:
        return None
    from torch_nerf_tpu.occupancy import OccupancyConfig  # noqa: PLC0415

    if o.keep_samples > cfg.renderer.num_samples_coarse:
        # make_ray_train_step raises for this; the CLI clamps but says so,
        # so config users and API users see consistent behavior
        print(
            f"occupancy.keep_samples={o.keep_samples} clamped to "
            f"renderer.num_samples_coarse={cfg.renderer.num_samples_coarse}"
        )
    max_fine = cfg.renderer.num_samples_coarse + cfg.renderer.num_samples_fine
    if o.keep_samples_fine > max_fine:
        print(
            f"occupancy.keep_samples_fine={o.keep_samples_fine} clamped to "
            f"the merged fine candidate count {max_fine}"
        )
    return OccupancyConfig(
        resolution=o.resolution,
        bound=o.bound,
        update_every=o.update_every,
        decay=o.decay,
        threshold=o.threshold,
        keep_samples=min(o.keep_samples, cfg.renderer.num_samples_coarse),
        warmup_steps=o.warmup_steps,
        keep_samples_fine=min(o.keep_samples_fine, max_fine),
    )


def estimate_flops_per_step(cfg: cfg_mod.ExperimentConfig) -> float:
    """Approximate train-step FLOPs (fwd + bwd ~= 3x fwd) for MFU logging.

    Counts the MLP matmul MACs per sample point times the per-step point
    count (rays x (coarse + merged-fine) samples); encodings/compositing are
    a rounding error next to the trunk. Good to a few percent — intended for
    the perf/mfu gauge (SURVEY.md §5.1), not accounting.
    """
    net = cfg.network
    enc = cfg.signal_encoder
    r = cfg.renderer

    if net.type == "nerf":
        from torch_nerf_tpu.encoders import positional_encoding_dim  # noqa: PLC0415
        from torch_nerf_tpu.models.nerf import layer_dims  # noqa: PLC0415

        pos_dim = positional_encoding_dim(net.pos_dim, enc.coord_encode_level, enc.include_input)
        dir_dim = positional_encoding_dim(net.view_dir_dim, enc.dir_encode_level, enc.include_input)
        macs = sum(i * o for i, o in layer_dims(pos_dim, dir_dim, net.feat_dim).values())
    else:  # instant_nerf: density (LF->64->16) + color (16+sh -> 64 -> 64 -> 3)
        lf = net.num_level * net.table_feat_dim
        if net.table_layout == "packed_dual":
            lf *= 2  # two staggered grids -> 2x-wide encoding
        sh_dim = enc.degree**2 if enc.type == "sh" else 27
        macs = (lf * 64 + 64 * 64 + 64 * 16) + (
            (16 + sh_dim) * 64 + 64 * 64 + 64 * 3
        )

    coarse = r.num_samples_coarse
    fine = r.num_samples_coarse + r.num_samples_fine  # merged fine set
    if cfg.occupancy.enabled:
        # occupancy pruning executes only the static kept budgets
        coarse = min(cfg.occupancy.keep_samples, coarse)
        if cfg.occupancy.keep_samples_fine:
            fine = min(cfg.occupancy.keep_samples_fine, fine)
    samples = coarse
    if r.num_samples_fine > 0:
        # hierarchical: fine net evaluates the merged samples, and two
        # networks exist (coarse pass + fine pass)
        samples = coarse + fine
    points = r.num_pixels * samples
    return 3.0 * 2.0 * macs * points  # bwd ~= 2x fwd; 2 FLOPs per MAC
