"""Headline benchmark: training-step throughput in rays/sec on one chip.

Measures the reference's exact operating point (lego defaults,
``configs/renderer/volume_renderer_default.yaml``): 4096 rays/step, 64
coarse + (64+128) fine samples, two 256-wide NeRF MLPs, full fwd+bwd+Adam —
i.e. ~1.05M MLP evaluations per step — using the on-device image pool train
step. Prints ONE JSON line (the flagship line carries ``mfu``: executed
model FLOPs / step time / chip bf16 peak).

``--model=instant_nerf`` benches the hash-grid model at its production
preset (``config.instant_nerf_tpu_config``: the corner-SHARED "bricked"
layout — measured -0.12 dB vs the reference-parity hash layout at equal
steps, NGP_QUALITY.json `bricked_L16F2_T19` — at the reference's 16.8M-param
budget). ``--layout=hash|packed|packed_dual|bricked`` measures the others at
the same budget. ``--occupancy[=KEEP]`` enables occupancy-grid sample
pruning (opt-in: its error is threshold-bounded only on scenes with real
empty space; on the soft procedural scene it costs ~4.6 dB at 2:1).

``--render`` measures INFERENCE instead: full 800x800 frames (the
reference's render resolution) through the compiled ``lax.map`` render
path, fwd only — the serving-side number next to the training headline.
Composes with ``--model=instant_nerf``.

``vs_baseline``: the reference publishes no numbers (SURVEY.md §6). The
denominator is an estimated reference throughput of 40,960 rays/s — 10
steps/s x 4096 rays for torch-NeRF's unfused per-image pipeline on a
V100-class GPU (optimistic for the reference; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC = 10.0 * 4096.0


def render_bench(model: str) -> None:
    """``--render``: inference throughput — full 800x800 frames (the
    reference's val/render resolution, ``runners/render.py:45``) through
    ``renderer.render_image`` (compiled ``lax.map`` over ray chunks), fwd
    only, fused kernels. Prints one JSON line with rays/s and s/frame."""
    from torch_nerf_tpu import train
    from torch_nerf_tpu.datasets import synthetic
    from torch_nerf_tpu.fields import make_nerf_field
    from torch_nerf_tpu.renderer import RenderSettings, render_image

    on_tpu = jax.default_backend() != "cpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if model == "instant_nerf":
        from torch_nerf_tpu import config as cfg_mod
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field

        net = cfg_mod.instant_nerf_tpu_config().network
        settings = RenderSettings(
            num_samples_coarse=256, num_samples_fine=0, t_near=2.0, t_far=6.0
        )
        field = make_instant_ngp_field(
            num_level=net.num_level,
            log_max_entry_per_level=net.log_max_entry_per_level,
            table_feat_dim=net.table_feat_dim,
            compute_dtype=compute_dtype,
            table_layout=net.table_layout,
        )
        samples = 256
        unit = (
            f"rays/s (inference fwd, 800x800 frames, 256 samples, "
            f"instant-NGP {net.table_layout} hash grid)"
        )
    else:
        settings = RenderSettings(
            num_samples_coarse=64, num_samples_fine=128, t_near=2.0, t_far=6.0
        )
        field = make_nerf_field(compute_dtype=compute_dtype, use_pallas=on_tpu)
        samples = 64 + 192
        unit = (
            "rays/s (inference fwd, 800x800 frames, 64c+192f hierarchical "
            "NeRF, fused kernel)"
        )

    _, poses, camera, _ = synthetic.make_dataset(num_views=1, img_size=800)
    optim = train.OptimConfig()
    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    pose = jnp.asarray(poses[0])

    def frame(key):
        return render_image(
            field,
            state.params["coarse"],
            state.params.get("fine"),
            camera,
            pose,
            key,
            settings,
            chunk_size=4096,
        )

    frame_j = jax.jit(frame)
    jax.block_until_ready(frame_j(jax.random.PRNGKey(1)))  # compile
    frames = 5 if on_tpu else 1
    start = time.perf_counter()
    for i in range(frames):
        img = frame_j(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(img)
    elapsed = time.perf_counter() - start

    rays = 800 * 800 * frames
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays / elapsed, 1),
                "unit": unit,
                "seconds_per_frame": round(elapsed / frames, 3),
                "samples_per_ray": samples,
                "vs_baseline": round(rays / elapsed / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


def main(
    model: str = "nerf",
    layout: str | None = None,
    use_occupancy: bool = False,
    keep: int | None = None,
    keep_fine: int | None = None,
) -> None:
    from torch_nerf_tpu import train
    from torch_nerf_tpu.datasets import synthetic
    from torch_nerf_tpu.fields import make_nerf_field
    from torch_nerf_tpu.logging_utils import device_peak_flops
    from torch_nerf_tpu.renderer import RenderSettings

    num_pixels = 4096
    on_tpu = jax.default_backend() != "cpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    occ_cfg = None
    mlp_flops_per_point = 0.0

    if model == "instant_nerf":
        # hash-grid operating point: 256 coarse samples, no fine network
        # (configs/instant_nerf.yaml in the reference)
        from torch_nerf_tpu import config as cfg_mod
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field

        cfg = cfg_mod.instant_nerf_tpu_config()
        net = cfg.network
        if layout is not None:
            net = cfg_mod.NetworkConfig(
                type="instant_nerf", table_layout=layout
            )  # reference L16F2 2^19 geometry
        settings = RenderSettings(
            num_samples_coarse=256, num_samples_fine=0, t_near=2.0, t_far=6.0
        )
        field = make_instant_ngp_field(
            num_level=net.num_level,
            log_max_entry_per_level=net.log_max_entry_per_level,
            table_feat_dim=net.table_feat_dim,
            compute_dtype=compute_dtype,
            table_layout=net.table_layout,
        )
        optim = train.OptimConfig(num_iter=300_000, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
        if use_occupancy:
            from torch_nerf_tpu import occupancy as occ_mod

            occ_cfg = occ_mod.OccupancyConfig(
                **({"keep_samples": keep} if keep else {})
            )
        unit = (
            "rays/s (fwd+bwd, 256 samples"
            + (f" pruned to {occ_cfg.keep_samples} by occupancy grid" if occ_cfg else "")
            + f", instant-NGP {net.table_layout} "
            f"L{net.num_level}F{net.table_feat_dim} hash grid)"
        )
        samples_executed = occ_cfg.keep_samples if occ_cfg else 256
    else:
        from torch_nerf_tpu.encoders import positional_encoding_dim
        from torch_nerf_tpu.models.nerf import layer_dims

        settings = RenderSettings(
            num_samples_coarse=64, num_samples_fine=128, t_near=2.0, t_far=6.0
        )
        # the fused Pallas encode+MLP kernel is the production TPU path
        # (round-2: encode->MLP->composite->MSE->backward in one kernel)
        field = make_nerf_field(compute_dtype=compute_dtype, use_pallas=on_tpu)
        optim = train.OptimConfig()
        if use_occupancy:
            from torch_nerf_tpu import occupancy as occ_mod

            occ_cfg = occ_mod.OccupancyConfig(
                keep_samples=keep or 32,
                keep_samples_fine=keep_fine or 128,
            )
        pos_dim = positional_encoding_dim(3, 10, True)
        dir_dim = positional_encoding_dim(3, 4, True)
        mlp_flops_per_point = 2.0 * sum(
            i * o for i, o in layer_dims(pos_dim, dir_dim, 256).values()
        )
        if occ_cfg:
            samples_executed = occ_cfg.keep_samples + (
                occ_cfg.keep_samples_fine or 64 + 128
            )
            unit = (
                f"rays/s (fwd+bwd, 64c+192f samples occupancy-pruned to "
                f"{occ_cfg.keep_samples}c+{occ_cfg.keep_samples_fine}f, "
                "hierarchical NeRF, fused kernel)"
            )
        else:
            samples_executed = 64 + 192
            unit = "rays/s (fwd+bwd, 64c+192f samples, hierarchical NeRF)"

    # lego operating point: 400x400 training images
    images, poses, camera, _ = synthetic.make_dataset(num_views=8, img_size=400)
    images_j = jnp.asarray(images)
    poses_j = jnp.asarray(poses)

    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=num_pixels, donate=True,
        occupancy_cfg=occ_cfg,
    )
    if occ_cfg is not None:
        from torch_nerf_tpu import occupancy as occ_mod

        grid = occ_mod.init_grid(occ_cfg)

        def run_step(state, sub):
            nonlocal grid
            state, grid, metrics = step(state, grid, images_j, poses_j, sub)
            return state, metrics
    else:

        def run_step(state, sub):
            return step(state, images_j, poses_j, sub)

    key = jax.random.PRNGKey(1)

    # warmup/compile
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = run_step(state, sub)
    jax.block_until_ready(metrics["loss"])

    iters = 50 if jax.default_backend() != "cpu" else 5
    start = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = run_step(state, sub)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    rays_per_sec = num_pixels * iters / elapsed
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": unit,
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }
    if mlp_flops_per_point > 0:
        # executed model FLOPs (fwd + bwd ~= 3x fwd MACs x 2) / chip peak —
        # the MFU gauge of SURVEY.md §5.1; encode/composite are folded into
        # the same kernel and add a few percent not counted here
        flops_per_step = 3.0 * mlp_flops_per_point * num_pixels * samples_executed
        peak = device_peak_flops()
        if peak:
            out["tflops"] = round(flops_per_step * iters / elapsed / 1e12, 1)
            out["mfu"] = round(flops_per_step * iters / elapsed / peak, 3)
            # measured stage decomposition (round 5, v5e). After the (S, S)
            # scan-mask redesign, the poly-trig encode (vpu_ablation.py:
            # XLA's sincos range reduction was 3.3 of the fine pass's 26 ms;
            # power-of-two frequencies let fixed-point phase + a degree-9
            # polynomial replace it), and the tile re-sweep to 32 rays
            # (tile_sweep.py), the fused passes run 22.2 ms (fine, 192s) +
            # 8.0 ms (coarse, 64s) against a ~29.7 ms full step — the stage
            # sum still exceeds the step, so sampler/Adam/glue overlap to a
            # NEGATIVE residual and the fused kernels ARE the step. Of the
            # remaining gap to peak, ~86% is the MXU K/N-padding ceiling and
            # the rest is in-kernel VPU-MXU serialization Mosaic cannot
            # overlap (f32->bf16 conversion passes are mandatory: Mosaic
            # rejects bf16 matmul accumulators) — see vpu_ablation.py.
            out["bound"] = (
                "fused kernels at 55-64% of bf16 peak are the whole step "
                "(glue/sampler/Adam overlap to a negative residual); "
                "~86% is the MXU K/N-padding ceiling (63/319/257/283-wide "
                "layers pad to 128 multiples); the rest is mandatory "
                "f32->bf16 conversion passes and in-kernel VPU-MXU "
                "serialization — see vpu_ablation.py / tile_sweep.py"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if "--render" in argv:
        render_bench("instant_nerf" if "--model=instant_nerf" in argv else "nerf")
        sys.exit(0)
    main(
        "instant_nerf" if "--model=instant_nerf" in argv else "nerf",
        next((a.split("=")[1] for a in argv if a.startswith("--layout=")), None),
        use_occupancy=any(a.startswith("--occupancy") for a in argv),
        keep=next(
            (int(a.split("=")[1]) for a in argv if a.startswith("--occupancy=")), None
        ),
        keep_fine=next(
            (int(a.split("=")[1]) for a in argv if a.startswith("--keep-fine=")), None
        ),
    )
