"""Training CLI.

Usage (mirrors the reference's hydra entry points, SURVEY.md §1.1):

    python -m torch_nerf_tpu.runners.run_train \
        [--config default|instant_nerf|path.yaml] [--log-dir DIR] \
        [key=value overrides ...]

Orchestration semantics follow the reference trainer
(``/root/reference/torch_nerf/runners/train.py:368-499``): epochs of
``len(dataset)`` optimizer steps; center-crop pixel sampling for the first 10
epochs; periodic validation (PSNR/SSIM), checkpointing, visualization; resume
from the stored config + latest checkpoint in ``--log-dir``.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import checkpoints, config as cfg_mod, metrics as metrics_mod
from torch_nerf_tpu import session, train
from torch_nerf_tpu.logging_utils import MetricsLogger, StepTimer, save_png
from torch_nerf_tpu.renderer import render_image


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a TPU-native NeRF.")
    parser.add_argument("--config", default="default", help="preset name or YAML path")
    parser.add_argument("--log-dir", default=None, help="output/resume directory")
    parser.add_argument(
        "--max-steps", type=int, default=None, help="cap total steps (debug)"
    )
    parser.add_argument(
        "--profile-steps",
        type=int,
        default=0,
        help="capture a jax.profiler trace of this many steps (after warmup) "
        "into <log-dir>/profile; view with TensorBoard or xprof",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="call jax.distributed.initialize() for multi-host pod slices "
        "(one process per host; coordinator from TPU env vars)",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.distributed:
        jax.distributed.initialize()

    log_dir = Path(args.log_dir or f"outputs/{time.strftime('%Y-%m-%d/%H-%M-%S')}")
    stored_cfg = log_dir / "config.yaml"
    if stored_cfg.exists():
        # resume: reload the run's own stored config (runners/train.py:377-386)
        cfg = cfg_mod.load_config(stored_cfg)
        cfg_mod.apply_overrides(cfg, args.overrides)
    else:
        cfg = cfg_mod.resolve(args.config, args.overrides)
    cfg.log_dir = str(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    cfg_mod.save_config(cfg, stored_cfg)

    if cfg.data.num_scenes > 1:
        _run_multiscene(cfg, args, log_dir)
        return

    dataset = session.build_dataset(cfg, split=cfg.data.data_type)
    settings = session.build_render_settings(cfg, dataset)
    field = session.build_field(cfg)
    optim_cfg = session.build_optim_config(cfg)
    aux_loss_fn = session.build_aux_loss(cfg)
    occ_cfg = session.build_occupancy_cfg(cfg)

    state = train.create_train_state(
        jax.random.PRNGKey(cfg.seed), field, settings, optim_cfg
    )
    ckpt_path = checkpoints.latest_checkpoint(log_dir)
    restored = (
        checkpoints.load_checkpoint(ckpt_path, state) if ckpt_path else None
    )
    if restored is not None:
        state = restored
        print(f"Resumed from step {int(state.step)}.")

    occ_grid = None
    if occ_cfg is not None:
        from torch_nerf_tpu import occupancy as occ_mod

        occ_grid = occ_mod.init_grid(occ_cfg)
        if restored is not None and int(state.step) > 0:
            saved_grid = checkpoints.load_occupancy_grid(ckpt_path)
            if saved_grid is not None:
                # exact resume: the EMA-max grid is checkpointed alongside
                # the train state (sidecar .occ.npy)
                occ_grid = jnp.asarray(saved_grid)
            else:
                # old checkpoint without the sidecar: rebuild the grid from
                # the restored field so a resume past warmup_steps never
                # prunes against an empty grid. Several sweeps with distinct
                # jitter keys approximate the EMA-max steady state — one
                # draw per cell can miss thin features and prune them for
                # up to update_every steps after resume.
                rebuild = jax.jit(
                    lambda g, p, k: occ_mod.update_grid(
                        g, occ_mod.make_density_fn(field), p, k, occ_cfg
                    )
                )
                for sweep in range(8):
                    occ_grid = rebuild(
                        occ_grid, state.params, jax.random.PRNGKey(cfg.seed + 2 + sweep)
                    )

    camera = dataset.camera
    images_j = jnp.asarray(dataset.flat_images())
    poses_j = jnp.asarray(dataset.poses)

    steps_per_epoch = max(1, dataset.num_views)
    num_epochs = max(1, optim_cfg.num_iter // steps_per_epoch)
    total_steps = num_epochs * steps_per_epoch
    if args.max_steps is not None:
        total_steps = min(total_steps, args.max_steps)

    # data-parallel path: shard the ray batch over all devices when more
    # than one chip is visible (SURVEY.md §2.2 / §5.8). parallel.
    # data_axis_size=1 forces the single-device step.
    num_devices = jax.device_count()
    use_dp = num_devices > 1 and cfg.parallel.data_axis_size != 1
    if use_dp:
        from torch_nerf_tpu.parallel import make_mesh, make_sharded_image_train_step

        dp_size = cfg.parallel.data_axis_size
        if dp_size == -1:
            dp_size = num_devices
        mesh = make_mesh(("data",), devices=jax.devices()[:dp_size])
        print(f"Data-parallel training over {dp_size} devices.")

        def make_step(precrop):
            build, place_state = make_sharded_image_train_step(
                field, settings, optim_cfg, camera, mesh,
                num_pixels=cfg.renderer.num_pixels, precrop=precrop,
                aux_loss_fn=aux_loss_fn, occupancy_cfg=occ_cfg,
            )
            return build, place_state

        build_pre, place_state = make_step(True)
        build_full, _ = make_step(False)
        state = place_state(state)
        step_precrop = build_pre(state)
        step_full = build_full(state)
    else:
        step_precrop = train.make_image_train_step(
            field, settings, optim_cfg, camera, cfg.renderer.num_pixels,
            precrop=True, aux_loss_fn=aux_loss_fn, occupancy_cfg=occ_cfg,
        )
        step_full = train.make_image_train_step(
            field, settings, optim_cfg, camera, cfg.renderer.num_pixels,
            precrop=False, aux_loss_fn=aux_loss_fn, occupancy_cfg=occ_cfg,
        )

    logger = MetricsLogger(log_dir)
    timer = StepTimer(
        rays_per_step=cfg.renderer.num_pixels,
        flops_per_step=session.estimate_flops_per_step(cfg),
    )
    key = jax.random.PRNGKey(cfg.seed + 1)

    val_cfg = cfg.train_params.validation
    log_cfg = cfg.train_params.log

    # validation runs on the val SPLIT at FULL resolution, like the
    # reference (runners/train.py:64-71 loads data_type="val",
    # half_res=False) — never on training views at training resolution
    val_dataset = None
    if val_cfg.validate_every > 0:
        try:
            val_dataset = session.build_dataset(cfg, split="val")
        except (FileNotFoundError, ValueError) as exc:
            print(f"validation disabled: no val split ({exc})")

    start_step = int(state.step)
    # profiler window: skip the first 10 steps (compile + warmup), then trace
    # --profile-steps steps into <log_dir>/profile (SURVEY.md §5.1)
    profile_start = start_step + 10 if args.profile_steps > 0 else -1
    profile_stop = profile_start + args.profile_steps

    for step_idx in range(start_step, total_steps):
        if step_idx == profile_start:
            jax.profiler.start_trace(str(log_dir / "profile"))
        epoch = step_idx // steps_per_epoch
        key, sub = jax.random.split(key)
        step_fn = step_precrop if epoch < 10 else step_full
        if occ_grid is not None:
            state, occ_grid, metrics = step_fn(state, occ_grid, images_j, poses_j, sub)
        else:
            state, metrics = step_fn(state, images_j, poses_j, sub)
        if step_idx + 1 == profile_stop:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {log_dir / 'profile'}")

        perf = timer.tick(sync=metrics["loss"])
        if (step_idx + 1) % 100 == 0:
            scalars = {f"train/{k}": float(v) for k, v in metrics.items()}
            if perf:
                scalars.update(perf)
            logger.log_scalars(step_idx + 1, scalars)
            print(
                f"step {step_idx + 1}/{total_steps} "
                + " ".join(f"{k.split('/')[-1]}={v:.5f}" for k, v in scalars.items())
            )
        elif perf:
            logger.log_scalars(step_idx + 1, perf)

        end_of_epoch = (step_idx + 1) % steps_per_epoch == 0
        if end_of_epoch:
            epoch_done = (step_idx + 1) // steps_per_epoch
            if epoch_done % log_cfg.epoch_btw_ckpt == 0:
                checkpoints.save_checkpoint(log_dir, state, occ_grid=occ_grid)
            if val_dataset is not None and epoch_done % val_cfg.validate_every == 0:
                _validate(cfg, field, state, val_dataset, settings, logger, step_idx + 1)
            if epoch_done % log_cfg.epoch_btw_vis == 0:
                _visualize(
                    cfg, field, state, camera, dataset, settings, log_dir, epoch_done
                )

    checkpoints.save_checkpoint(log_dir, state, occ_grid=occ_grid)
    logger.close()
    print(f"Training complete at step {int(state.step)}. Logs in {log_dir}.")


def _scene_mesh_size(num_scenes: int, num_devices: int) -> int:
    """Largest device count <= num_devices that divides num_scenes."""
    for d in range(min(num_scenes, num_devices), 0, -1):
        if num_scenes % d == 0:
            return d
    return 1


def _run_multiscene(cfg, args, log_dir: Path) -> None:
    """Multi-scene batched training (``torch_nerf_tpu.multiscene``): N
    scenes — seeded procedural scenes or a comma-separated list of
    Blender-format scenes (``data.scene_name=lego,ship``) — in one jitted
    step, per-scene params and per-scene validation PSNR from a single
    invocation.

    Step builder: on TPU (any device count) or multi-device meshes, scenes
    shard over a ``shard_map`` mesh and each device runs the UNBATCHED
    per-scene step, so the Pallas kernels (fused NeRF, NGP hash) run as-is;
    the single-device-CPU fallback vmaps the generic XLA field (Pallas
    kernels carry no vmap batching rule). Scenes are independent either
    way — the step carries no cross-scene collectives.
    """
    from torch_nerf_tpu import multiscene

    num_scenes = cfg.data.num_scenes

    def build_split(split):
        sets = [
            session.build_multiscene_dataset(cfg, s, split)
            for s in range(num_scenes)
        ]
        cam = sets[0].camera
        for d in sets[1:]:
            if d.camera != cam:
                raise ValueError(
                    "Multi-scene batching stacks scene pools into one "
                    "array, so all scenes must share camera intrinsics; "
                    f"got {d.camera} vs {cam}."
                )
            if d.images.shape != sets[0].images.shape:
                raise ValueError(
                    "All scenes must have equal view counts/resolutions "
                    f"to stack; got {d.images.shape} vs {sets[0].images.shape}."
                )
        images = np.stack([d.flat_images() for d in sets])
        poses = np.stack([d.poses for d in sets])
        return images, poses, cam

    images, poses, camera = build_split("train")
    val_images, val_poses, val_camera = build_split("val")

    settings = session.build_render_settings(cfg)
    num_devices = jax.device_count()
    mesh_size = (
        _scene_mesh_size(num_scenes, num_devices)
        if cfg.parallel.data_axis_size != 1
        else 1
    )
    use_shardmap = mesh_size > 1 or jax.default_backend() == "tpu"
    if not use_shardmap:
        # generic XLA field: Pallas kernels cannot batch under the scene vmap
        cfg.parallel.use_pallas = False
    field = session.build_field(cfg)
    optim_cfg = session.build_optim_config(cfg)

    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(cfg.seed), field, settings, optim_cfg, num_scenes
    )
    restored = checkpoints.restore_latest(log_dir, state)
    if restored is not None:
        state = restored
        print(f"Resumed from step {int(state.step)}.")

    if use_shardmap:
        from torch_nerf_tpu.parallel import make_mesh

        mesh = make_mesh(("scene",), devices=jax.devices()[:mesh_size])
        print(
            f"Sharding {num_scenes} scenes over {mesh_size} devices "
            "(unbatched per-scene step; kernels enabled)."
        )

        def make_step(precrop):
            return multiscene.make_multiscene_shardmap_step(
                field, settings, optim_cfg, camera, num_scenes, mesh,
                num_pixels=cfg.renderer.num_pixels, precrop=precrop,
            )

        build_pre, place_state = make_step(True)
        build_full, _ = make_step(False)
        state = place_state(state)
        step_precrop = build_pre(state)
        step_full = build_full(state)
    else:

        def make_step(precrop):
            return multiscene.make_multiscene_image_train_step(
                field, settings, optim_cfg, camera, num_scenes,
                num_pixels=cfg.renderer.num_pixels, precrop=precrop,
            )

        step_precrop = make_step(True)
        step_full = make_step(False)

    images_j, poses_j = jnp.asarray(images), jnp.asarray(poses)
    logger = MetricsLogger(log_dir)
    timer = StepTimer(rays_per_step=cfg.renderer.num_pixels * num_scenes)
    key = jax.random.PRNGKey(cfg.seed + 1)
    val_cfg = cfg.train_params.validation
    log_cfg = cfg.train_params.log

    steps_per_epoch = max(1, images.shape[1])  # views per scene
    total_steps = max(1, optim_cfg.num_iter // steps_per_epoch) * steps_per_epoch
    if args.max_steps is not None:
        total_steps = min(total_steps, args.max_steps)

    for step_idx in range(int(state.step), total_steps):
        epoch = step_idx // steps_per_epoch
        key, sub = jax.random.split(key)
        step_fn = step_precrop if epoch < 10 else step_full
        state, metrics = step_fn(state, images_j, poses_j, sub)

        perf = timer.tick(sync=metrics["loss"])
        if (step_idx + 1) % 100 == 0:
            scalars = {"train/loss": float(metrics["loss"])}
            per_scene = np.asarray(metrics["coarse_loss"])
            scalars.update(
                {f"train/loss_scene{s}": float(v) for s, v in enumerate(per_scene)}
            )
            if perf:
                scalars.update(perf)
            logger.log_scalars(step_idx + 1, scalars)
            print(
                f"step {step_idx + 1}/{total_steps} "
                + " ".join(f"{k.split('/')[-1]}={v:.5f}" for k, v in scalars.items())
            )
        end_of_epoch = (step_idx + 1) % steps_per_epoch == 0
        if end_of_epoch:
            epoch_done = (step_idx + 1) // steps_per_epoch
            if epoch_done % log_cfg.epoch_btw_ckpt == 0:
                checkpoints.save_checkpoint(log_dir, state)
            if val_cfg.validate_every > 0 and epoch_done % val_cfg.validate_every == 0:
                _validate_multiscene(
                    cfg, field, state, val_images, val_poses, val_camera,
                    settings, logger, step_idx + 1,
                )

    checkpoints.save_checkpoint(log_dir, state)
    logger.close()
    print(f"Training complete at step {int(state.step)}. Logs in {log_dir}.")


def _validate_multiscene(
    cfg, field, state, val_images, val_poses, val_camera, settings, logger, step
) -> None:
    from torch_nerf_tpu import multiscene

    scalars = {}
    psnrs = []
    for s in range(val_images.shape[0]):
        params = multiscene.scene_params(state, s)
        img = render_image(
            field, params["coarse"], params.get("fine"), val_camera,
            jnp.asarray(val_poses[s, 0]), jax.random.PRNGKey(s), settings,
            chunk_size=cfg.renderer.num_pixels,
        )
        pred = np.clip(np.asarray(img), 0.0, 1.0)
        gt = np.asarray(val_images[s, 0]).reshape(pred.shape)
        p = metrics_mod.psnr(pred, gt)
        psnrs.append(p)
        scalars[f"val/psnr_scene{s}"] = float(p)
    scalars["val/psnr"] = float(np.mean(psnrs))
    logger.log_scalars(step, scalars)
    print(
        f"validation @ step {step}: "
        + " ".join(f"{k.split('/')[-1]}={v:.3f}" for k, v in scalars.items())
    )


def _validate(cfg, field, state, dataset, settings, logger, step) -> None:
    """Full-image validation on the val split at full resolution: PSNR/SSIM
    (+LPIPS when pretrained weights are locally available) and pred|gt image
    logging (``runners/train.py:227-366, 441-461``)."""
    num_batch = min(cfg.train_params.validation.num_batch, dataset.num_views)
    use_lpips = metrics_mod.lpips_available()
    psnrs, ssims, lpipss = [], [], []
    for view in range(num_batch):
        img = render_image(
            field,
            state.params["coarse"],
            state.params.get("fine"),
            dataset.camera,
            jnp.asarray(dataset.poses[view]),
            jax.random.PRNGKey(view),
            settings,
            chunk_size=cfg.renderer.num_pixels,
        )
        pred = np.clip(np.asarray(img), 0.0, 1.0)
        gt = dataset.images[view]
        psnrs.append(metrics_mod.psnr(pred, gt))
        ssims.append(metrics_mod.ssim(pred, gt))
        if use_lpips:
            lpipss.append(metrics_mod.lpips(pred, gt))
        if view == 0:
            # pred|gt side by side, as the reference logs to TensorBoard
            logger.log_image(step, "val/pred_vs_gt", np.concatenate([pred, gt], axis=1))
    scalars = {"val/psnr": float(np.mean(psnrs)), "val/ssim": float(np.mean(ssims))}
    if lpipss:
        scalars["val/lpips"] = float(np.mean(lpipss))
    logger.log_scalars(step, scalars)
    print(
        f"validation @ step {step}: "
        + " ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in scalars.items())
    )


def _visualize(cfg, field, state, camera, dataset, settings, log_dir, epoch) -> None:
    """Render one novel view into ``vis/epoch_N/`` (``runner_utils.py:834-918``)."""
    vis_dir = Path(log_dir) / "vis" / f"epoch_{epoch}" / "pred_imgs"
    vis_dir.mkdir(parents=True, exist_ok=True)
    img = render_image(
        field,
        state.params["coarse"],
        state.params.get("fine"),
        camera,
        jnp.asarray(dataset.render_poses[0]),
        jax.random.PRNGKey(0),
        settings,
        chunk_size=cfg.renderer.num_pixels,
    )
    save_png(vis_dir / "view_000.png", np.asarray(img))


if __name__ == "__main__":
    main()
