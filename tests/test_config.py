"""Tests for the typed config tree: defaults, presets, YAML round-trip, overrides."""

import numpy as np

from torch_nerf_tpu import config


def test_defaults_match_reference_yaml():
    cfg = config.ExperimentConfig()
    # configs/renderer/volume_renderer_default.yaml
    assert cfg.renderer.num_pixels == 4096
    assert cfg.renderer.num_samples_coarse == 64
    assert cfg.renderer.num_samples_fine == 128
    assert cfg.renderer.t_near == 2.0 and cfg.renderer.t_far == 6.0
    assert cfg.renderer.project_to_ndc is False
    # configs/train_params/nerf.yaml
    assert cfg.train_params.optim.num_iter == 300_000
    assert np.isclose(cfg.train_params.optim.init_lr, 5e-4)
    assert np.isclose(cfg.train_params.optim.end_lr, 5e-5)
    assert np.isclose(cfg.train_params.optim.eps, 1e-8)
    assert cfg.train_params.log.epoch_btw_ckpt == 50
    # configs/signal_encoder/positional_encoding.yaml
    assert cfg.signal_encoder.coord_encode_level == 10
    assert cfg.signal_encoder.dir_encode_level == 4
    assert cfg.signal_encoder.include_input is True
    # configs/data/nerf_synthetic.yaml
    assert cfg.data.scene_name == "lego"
    assert cfg.data.half_res is True and cfg.data.white_bg is True


def test_instant_nerf_preset():
    cfg = config.instant_nerf_config()
    # configs/instant_nerf.yaml overrides
    assert cfg.renderer.num_samples_coarse == 256
    assert cfg.renderer.num_samples_fine == 0
    assert cfg.network.type == "instant_nerf"
    assert cfg.signal_encoder.type == "sh"
    # configs/train_params/instant_nerf.yaml
    assert np.isclose(cfg.train_params.optim.init_lr, 1e-2)
    assert np.isclose(cfg.train_params.optim.eps, 1e-15)
    # configs/network/instant_nerf.yaml
    assert cfg.network.num_level == 16
    assert cfg.network.log_max_entry_per_level == 19
    assert cfg.network.table_feat_dim == 2
    assert cfg.network.min_res == 16 and cfg.network.max_res == 512


def test_yaml_round_trip(tmp_path):
    cfg = config.instant_nerf_config()
    cfg.log_dir = "/tmp/run1"
    path = tmp_path / "config.yaml"
    config.save_config(cfg, path)
    loaded = config.load_config(path)
    assert loaded == cfg


def test_overrides():
    cfg = config.resolve(
        "default",
        [
            "renderer.num_pixels=1024",
            "train_params.optim.init_lr=0.001",
            "data.white_bg=false",
            "log_dir=/tmp/x",
        ],
    )
    assert cfg.renderer.num_pixels == 1024
    assert np.isclose(cfg.train_params.optim.init_lr, 1e-3)
    assert cfg.data.white_bg is False
    assert cfg.log_dir == "/tmp/x"


def test_unknown_key_rejected(tmp_path):
    import pytest

    path = tmp_path / "bad.yaml"
    path.write_text("rendererr:\n  num_pixels: 1\n")
    with pytest.raises(KeyError):
        config.load_config(path)


def test_missing_table_layout_falls_back_to_hash():
    """Configs from runs predating the packed layout must resume as 'hash'
    so their checkpoints keep their (L, T, F) table interpretation."""
    data = config.to_dict(config.ExperimentConfig())
    del data["network"]["table_layout"]
    cfg = config.from_dict(data)
    assert cfg.network.table_layout == "hash"


def test_inert_config_values_rejected():
    """objective.loss_type / scene.type are validated, not silently ignored."""
    import pytest
    from torch_nerf_tpu import session

    cfg = config.ExperimentConfig()
    cfg.objective.loss_type = "l1"
    with pytest.raises(ValueError, match="loss_type"):
        session.build_optim_config(cfg)
    cfg = config.ExperimentConfig()
    cfg.scene.type = "sphere"
    with pytest.raises(ValueError, match="scene"):
        session.build_optim_config(cfg)


def test_instant_nerf_tpu_preset_matches_reference_param_budget():
    """The TPU preset reshapes the hash grid but keeps the reference's exact
    16.8M-param budget (2 grids x L x 2^log2 x F == 16 x 2^19 x 2)."""
    from torch_nerf_tpu.config import instant_nerf_config, instant_nerf_tpu_config

    ref = instant_nerf_config()
    tpu = instant_nerf_tpu_config()
    ref_params = ref.network.num_level * 2**ref.network.log_max_entry_per_level * ref.network.table_feat_dim
    grids = 2 if tpu.network.table_layout == "packed_dual" else 1
    tpu_params = grids * tpu.network.num_level * 2**tpu.network.log_max_entry_per_level * tpu.network.table_feat_dim
    assert tpu_params == ref_params
    assert ref.network.table_layout == "hash"  # reference-parity default
    # optimizer contract identical (lr 1e-2 -> 1e-3, eps 1e-15)
    assert tpu.train_params.optim.eps == ref.train_params.optim.eps == 1e-15
