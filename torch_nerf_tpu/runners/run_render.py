"""Rendering CLI: load a trained run, render novel views or test poses.

Mirrors ``/root/reference/torch_nerf/runners/render.py:110-210``: requires a
``--log-dir`` holding the stored config + checkpoints, renders either the
dataset's novel-view trajectory (spherical orbit for Blender, spiral for
LLFF) or the test-set poses (``--render-test-views``), and writes numbered
PNGs ready for ``scripts/create_video.py``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import checkpoints, config as cfg_mod, session, train
from torch_nerf_tpu.logging_utils import save_png
from torch_nerf_tpu.renderer import render_image


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Render a trained NeRF.")
    parser.add_argument("--log-dir", required=True, help="training run directory")
    parser.add_argument("--out-dir", default=None, help="output PNG directory")
    parser.add_argument(
        "--render-test-views",
        action="store_true",
        help="render the dataset's poses instead of the novel-view path",
    )
    parser.add_argument("--num-views", type=int, default=None, help="cap rendered views")
    parser.add_argument(
        "--scene",
        type=int,
        default=0,
        help="for multi-scene runs (data.num_scenes > 1): which scene's "
        "parameters/dataset to render",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    log_dir = Path(args.log_dir)
    stored = log_dir / "config.yaml"
    if not stored.exists():
        raise FileNotFoundError(f"No stored config at {stored}; train first.")
    cfg = cfg_mod.load_config(stored)
    cfg_mod.apply_overrides(cfg, args.overrides)

    # like the reference render CLI, always load the TEST split at FULL
    # resolution (render.py:44-45 forces data_type="test", half_res=False);
    # --render-test-views only switches which poses are rendered
    multi = cfg.data.num_scenes > 1
    if multi:
        if not 0 <= args.scene < cfg.data.num_scenes:
            raise ValueError(
                f"--scene {args.scene} out of range for a "
                f"{cfg.data.num_scenes}-scene run."
            )
        dataset = session.build_multiscene_dataset(cfg, args.scene, split="test")
    else:
        dataset = session.build_dataset(cfg, split="test")
    settings = session.build_render_settings(cfg, dataset)
    field = session.build_field(cfg)
    optim_cfg = session.build_optim_config(cfg)

    if multi:
        # restore the STACKED multiscene state, then slice out one scene's
        # parameter pytree (reference render contract for any trained run:
        # /root/reference/torch_nerf/runners/render.py:110-210)
        from torch_nerf_tpu import multiscene  # noqa: PLC0415

        template = multiscene.create_multiscene_state(
            jax.random.PRNGKey(cfg.seed), field, settings, optim_cfg,
            cfg.data.num_scenes,
        )
        stacked = checkpoints.restore_latest(log_dir, template)
        if stacked is None:
            raise FileNotFoundError(f"No checkpoint found under {log_dir}/ckpt.")
        state = train.TrainState(
            step=stacked.step,
            params=multiscene.scene_params(stacked, args.scene),
            opt_state=None,
        )
        print(
            f"Loaded scene {args.scene} of a {cfg.data.num_scenes}-scene "
            f"checkpoint at step {int(state.step)}."
        )
    else:
        template = train.create_train_state(
            jax.random.PRNGKey(cfg.seed), field, settings, optim_cfg
        )
        state = checkpoints.restore_latest(log_dir, template)
        if state is None:
            raise FileNotFoundError(f"No checkpoint found under {log_dir}/ckpt.")
        print(f"Loaded checkpoint at step {int(state.step)}.")

    poses = dataset.poses if args.render_test_views else dataset.render_poses
    if args.num_views is not None:
        poses = poses[: args.num_views]

    out_dir = Path(args.out_dir or (log_dir / "render"))
    out_dir.mkdir(parents=True, exist_ok=True)

    # multi-chip: shard each frame's rays over all devices (psum-free DP eval)
    sharded = None
    if jax.device_count() > 1 and cfg.parallel.data_axis_size != 1:
        from torch_nerf_tpu.parallel import make_mesh, make_sharded_render  # noqa: PLC0415

        dp = cfg.parallel.data_axis_size
        dp = jax.device_count() if dp == -1 else dp
        mesh = make_mesh(("data",), devices=jax.devices()[:dp])
        sharded = make_sharded_render(field, settings, mesh, dataset.camera)
        print(f"Rendering data-parallel over {dp} devices.")

    for i, pose in enumerate(poses):
        if sharded is not None:
            img = sharded(
                state.params["coarse"],
                state.params.get("fine"),
                jnp.asarray(pose),
                jax.random.PRNGKey(i),
            )
        else:
            img = render_image(
                field,
                state.params["coarse"],
                state.params.get("fine"),
                dataset.camera,
                jnp.asarray(pose),
                jax.random.PRNGKey(i),
                settings,
                chunk_size=cfg.renderer.num_pixels,
            )
        save_png(out_dir / f"{i:04d}.png", np.asarray(img))
        print(f"rendered view {i + 1}/{len(poses)}")

    print(f"Wrote {len(poses)} frames to {out_dir}.")


if __name__ == "__main__":
    main()
