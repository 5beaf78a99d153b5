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