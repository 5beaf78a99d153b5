"""End-to-end CLI contract tests (CPU, tiny shapes).

Drives the same surfaces a user touches — the train / render / evaluate
entry points (SURVEY.md §1.1) — including checkpointing, the stored-config
resume path (``runners/train.py:377-386`` semantics), validation, and the
two-directory metric contract of ``runners/evaluate.py:17-43``.
"""

import numpy as np
import pytest

from torch_nerf_tpu.runners import evaluate as evaluate_cli
from torch_nerf_tpu.runners import run_render, run_train

TINY_OVERRIDES = [
    "data.dataset_type=gaussian_blobs",
    "network.feat_dim=32",
    "signal_encoder.coord_encode_level=4",
    "signal_encoder.dir_encode_level=2",
    "renderer.num_pixels=128",
    "renderer.num_samples_coarse=8",
    "renderer.num_samples_fine=8",
    "train_params.optim.num_iter=16",
    "train_params.validation.validate_every=2",
    "train_params.validation.num_batch=1",
    "train_params.log.epoch_btw_ckpt=2",
    "train_params.log.epoch_btw_vis=2",
]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    log_dir = tmp_path_factory.mktemp("cli_run")
    run_train.main(
        ["--config", "default", "--log-dir", str(log_dir), "--max-steps", "16"]
        + TINY_OVERRIDES
    )
    return log_dir


def test_train_cli_writes_run_artifacts(trained_run):
    assert (trained_run / "config.yaml").exists()
    assert (trained_run / "metrics.jsonl").exists()
    ckpts = list((trained_run / "ckpt").iterdir())
    assert ckpts, "no checkpoint written"
    vis = list((trained_run / "vis").rglob("*.png"))
    assert vis, "no visualization written"


def test_train_cli_resumes_from_log_dir(trained_run, capsys):
    # second invocation with the same log dir must resume, not restart
    run_train.main(
        ["--config", "default", "--log-dir", str(trained_run), "--max-steps", "18"]
        + TINY_OVERRIDES
    )
    out = capsys.readouterr().out
    assert "Resumed from step 16" in out


def test_render_and_evaluate_cli_roundtrip(trained_run, tmp_path, capsys):
    out_dir = tmp_path / "render"
    run_render.main(
        [
            "--log-dir",
            str(trained_run),
            "--render-test-views",
            "--num-views",
            "2",
            "--out-dir",
            str(out_dir),
        ]
    )
    pngs = sorted(out_dir.iterdir())
    assert [p.name for p in pngs] == ["0000.png", "0001.png"]

    # ground truth from the same dataset, same filenames
    from torch_nerf_tpu import config as cfg_mod, session
    from torch_nerf_tpu.logging_utils import save_png

    cfg = cfg_mod.load_config(trained_run / "config.yaml")
    ds = session.build_dataset(cfg)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    h, w = ds.camera.img_height, ds.camera.img_width
    for i in range(2):
        save_png(gt_dir / f"{i:04d}.png", np.asarray(ds.images[i]).reshape(h, w, 3))

    evaluate_cli.main([str(out_dir), str(gt_dir)])
    out = capsys.readouterr().out
    assert "PSNR:" in out and "SSIM:" in out

# ---------------------------------------------------------------------------
# LLFF + NDC end-to-end (VERDICT r3 missing #3): drive the real CLIs on an
# LLFF-format dataset with project_to_ndc=true, through train -> resume ->
# render -> evaluate (reference flow: runner_utils.py:488-502 t-bound
# rewrite + sampler_base.py:199-257 NDC projection).


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("llff_data")
    scene_dir = root / "fern"
    img_dir = scene_dir / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    n_views, h, w, focal = 4, 32, 32, 40.0
    rows = []
    for i in range(n_views):
        # smooth gradient + noise so training has learnable structure
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [xx / w, yy / h, np.full_like(xx, 0.5, dtype=float)], axis=-1
        )
        img = (img * 255 + rng.normal(0, 4, (h, w, 3))).clip(0, 255).astype(np.uint8)
        Image.fromarray(img, "RGB").save(img_dir / f"img_{i:03d}.png")
        c2w = np.eye(4)[:3].copy()
        c2w[0, 3] = 0.06 * i  # forward-facing rig: small lateral offsets
        rot_right, rot_up = c2w[:, 0], c2w[:, 1]
        raw = np.stack([-rot_up, rot_right, c2w[:, 2], c2w[:, 3]], axis=1)
        hwf = np.array([[h], [w], [focal]])
        rows.append(
            np.concatenate([np.concatenate([raw, hwf], axis=1).reshape(-1), [2.0, 6.0]])
        )
    np.save(scene_dir / "poses_bounds.npy", np.stack(rows))
    return root


LLFF_OVERRIDES = [
    "data.dataset_type=nerf_llff",
    "data.scene_name=fern",
    "data.factor=2",
    "renderer.project_to_ndc=true",
    "network.feat_dim=32",
    "signal_encoder.coord_encode_level=4",
    "signal_encoder.dir_encode_level=2",
    "renderer.num_pixels=64",
    "renderer.num_samples_coarse=8",
    "renderer.num_samples_fine=8",
    # 16x16 minified images leave a 36-pixel precrop region that cannot
    # split over the 8-way virtual mesh; the DP path is covered by the
    # gaussian_blobs CLI tests above
    "parallel.data_axis_size=1",
    "train_params.optim.num_iter=8",
    "train_params.validation.validate_every=1000",
    "train_params.log.epoch_btw_ckpt=2",
    "train_params.log.epoch_btw_vis=1000",
]


@pytest.fixture(scope="module")
def llff_run(tmp_path_factory, llff_root):
    log_dir = tmp_path_factory.mktemp("llff_run")
    run_train.main(
        ["--config", "default", "--log-dir", str(log_dir), "--max-steps", "8",
         f"data.data_root={llff_root}"] + LLFF_OVERRIDES
    )
    return log_dir


def test_llff_ndc_train_writes_artifacts_and_caches_minified(llff_run, llff_root):
    assert (llff_run / "config.yaml").exists()
    assert list((llff_run / "ckpt").iterdir()), "no checkpoint written"
    # the loader wrote the images_{factor}/ cache (load_llff.py:57-80 layout)
    cache = llff_root / "fern" / "images_2"
    assert cache.exists() and list(cache.glob("*.png"))


def test_llff_ndc_settings_rewrite_t_bounds(llff_run):
    """Under NDC the t-bounds are rewritten to (0, 1), runner_utils.py:488-502."""
    from torch_nerf_tpu import config as cfg_mod, session

    cfg = cfg_mod.load_config(llff_run / "config.yaml")
    ds = session.build_dataset(cfg)
    settings = session.build_render_settings(cfg, ds)
    assert settings.project_to_ndc
    assert (settings.t_near, settings.t_far) == (0.0, 1.0)


def test_llff_ndc_resume_render_evaluate(llff_run, llff_root, tmp_path, capsys):
    # num_iter=8 over 3 training views (holdout excluded) -> 2 epochs = 6
    # steps; the resume run extends num_iter via override (applied on top of
    # the stored config, runners/train.py:377-386 semantics)
    run_train.main(
        ["--config", "default", "--log-dir", str(llff_run), "--max-steps", "9",
         f"data.data_root={llff_root}"] + LLFF_OVERRIDES
        + ["train_params.optim.num_iter=12"]
    )
    out = capsys.readouterr().out
    assert "Resumed from step 6" in out

    out_dir = tmp_path / "render"
    run_render.main(
        ["--log-dir", str(llff_run), "--render-test-views", "--num-views", "1",
         "--out-dir", str(out_dir)]
    )
    assert (out_dir / "0000.png").exists()

    from torch_nerf_tpu import config as cfg_mod, session
    from torch_nerf_tpu.logging_utils import save_png

    cfg = cfg_mod.load_config(llff_run / "config.yaml")
    ds = session.build_dataset(cfg, split="test")  # the LLFF holdout view
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    save_png(gt_dir / "0000.png", np.asarray(ds.images[0]))

    evaluate_cli.main([str(out_dir), str(gt_dir)])
    out = capsys.readouterr().out
    assert "PSNR:" in out and "SSIM:" in out


def _ffmpeg_available() -> bool:
    try:
        import imageio.v2 as imageio

        imageio.get_writer(
            "/tmp/_probe.mp4", format="FFMPEG", mode="I", fps=24, macro_block_size=1
        ).close()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _ffmpeg_available(), reason="imageio FFMPEG plugin unavailable")
def test_create_video_from_rendered_frames(trained_run, tmp_path, monkeypatch):
    """Gated smoke test for scripts/create_video.py (VERDICT r3 missing #5):
    render 3 tiny frames through the real render CLI, stitch them to mp4
    with the same imageio/FFMPEG contract as the reference
    (scripts/utils/create_video.py:19-26)."""
    import runpy
    import sys as _sys

    out_dir = tmp_path / "frames"
    run_render.main(
        ["--log-dir", str(trained_run), "--render-test-views", "--num-views", "3",
         "--out-dir", str(out_dir)]
    )
    title = str(tmp_path / "orbit")
    monkeypatch.setattr(
        _sys, "argv",
        ["create_video.py", "--img_dir", str(out_dir), "--vid_title", title],
    )
    runpy.run_path("scripts/create_video.py", run_name="__main__")
    assert (tmp_path / "orbit.mp4").stat().st_size > 0
