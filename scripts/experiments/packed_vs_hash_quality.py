"""Quality parity: packed vs hash table layouts, and L/F shape trade-offs.

Settles the two empirical questions the packed hash grid raises
(``models/instant_ngp.py`` docstring; VERDICT round 1 "What's weak" #3):

1. Does the voxel-packed layout (corners hashed once per voxel, not shared
   across adjacent voxels) cost reconstruction quality vs the
   reference-parity per-corner "hash" layout?
2. Do the same-parameter TPU-tuned shapes (L=8/F=4, L=4/F=8 — identical
   16.8M-param budget and 32-wide encoding, 2-6x faster on v5e because the
   scalar gather/scatter loops run per (point, level)) cost quality vs the
   reference L=16/F=2?

Trains each variant with the SAME trainer, scene, rays, and step budget on
the procedural gaussian_blobs scene and reports novel-view PSNR from the
val split. Writes scripts/experiments/../..../NGP_QUALITY.json. Run on the
real TPU (takes ~10 min):

    python scripts/experiments/packed_vs_hash_quality.py [--steps=3000]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(name, layout, num_level, feat_dim, steps, data, log2_entries, decay=0.0, smooth=0.0, occ_keep=0, occ_threshold=1e-2,
                samples=128, init_lr=1e-2, end_lr=1e-3, width=64, pixels=1024,
                max_res=512, hierarchical=0):
    from torch_nerf_tpu import metrics, train
    from torch_nerf_tpu.fields_ngp import (
        make_encode_smoothness_loss,
        make_instant_ngp_field,
    )
    from torch_nerf_tpu.renderer import RenderSettings, render_image

    images, poses, camera, val = data
    settings = RenderSettings(
        num_samples_coarse=samples, num_samples_fine=hierarchical
    )
    field = make_instant_ngp_field(
        num_level=num_level,
        log_max_entry_per_level=log2_entries,
        table_feat_dim=feat_dim,
        density_feat_dim=width,
        color_feat_dim=width,
        max_res=max_res,
        compute_dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
        table_layout=layout,
    )
    optim = train.OptimConfig(
        num_iter=steps, init_lr=init_lr, end_lr=end_lr, eps=1e-15,
        table_weight_decay=decay,
    )
    aux = None
    if smooth > 0.0:
        raw = make_encode_smoothness_loss(
            num_level, table_feat_dim=feat_dim, table_layout=layout,
        )
        aux = lambda params, key: smooth * raw(params["coarse"], key)  # noqa: E731
    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    occ_cfg = None
    if occ_keep:
        # occupancy-grid pruning (occupancy.py): 128 candidates -> occ_keep
        from torch_nerf_tpu import occupancy as occ_mod

        occ_cfg = occ_mod.OccupancyConfig(
            keep_samples=occ_keep, threshold=occ_threshold
        )
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=pixels, donate=True,
        aux_loss_fn=aux, occupancy_cfg=occ_cfg,
    )

    key = jax.random.PRNGKey(1)
    start = time.perf_counter()
    if occ_cfg is not None:
        grid = occ_mod.init_grid(occ_cfg)
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, grid, m = step(state, grid, images, poses, sub)
    else:
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, m = step(state, images, poses, sub)
    jax.block_until_ready(m["loss"])
    train_s = time.perf_counter() - start

    val_images, val_poses, val_camera, _ = val
    psnrs = []
    for i in range(val_images.shape[0]):
        img = render_image(
            field, state.params["coarse"], state.params.get("fine"), val_camera,
            jnp.asarray(val_poses[i]), jax.random.PRNGKey(2), settings,
        )
        gt = np.asarray(val_images[i]).reshape(val_camera.img_height, val_camera.img_width, 3)
        psnrs.append(metrics.psnr(np.asarray(img), gt))
    grids = 2 if layout == "packed_dual" else 1
    tag = (
        ("" if decay == 0.0 else f"_wd{decay:g}")
        + ("" if smooth == 0.0 else f"_sm{smooth:g}")
        + ("" if not occ_keep else f"_occ{occ_keep}")
        + ("" if occ_threshold == 1e-2 else f"_th{occ_threshold:g}")
        + ("" if samples == 128 else f"_s{samples}")
        + ("" if init_lr == 1e-2 else f"_lr{init_lr:g}")
        + ("" if end_lr == 1e-3 else f"_elr{end_lr:g}")
        + ("" if width == 64 else f"_w{width}")
        + ("" if pixels == 1024 else f"_px{pixels}")
        + ("" if max_res == 512 else f"_mr{max_res}")
        + ("" if not hierarchical else f"_hier{hierarchical}")
    )
    out = {
        "variant": name + tag,
        "layout": layout,
        "num_level": num_level,
        "feat_dim": feat_dim,
        "params": grids * num_level * (2**log2_entries) * feat_dim,
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "final_loss": float(m["loss"]),
        "val_psnr": round(float(np.mean(psnrs)), 3),
    }
    print(json.dumps(out))
    return out


# name -> (label, layout, L, F, log2_entries). The _T18 variants give packed
# 8x the rows (equal COLLISION LOAD to the hash layout, which stores each
# corner once where packed stores it per adjacent voxel): the packed gather
# rate is scalar-issue-bound and independent of table size, so extra
# capacity costs only HBM + one table DMA per level-group call — the
# TPU-first trade is capacity-for-speed, not capacity-for-params.
VARIANTS = {
    "hash_L16F2": ("hash_L16F2 (reference parity)", "hash", 16, 2, 15),
    "packed_L16F2": ("packed_L16F2", "packed", 16, 2, 15),
    "packed_L8F4": ("packed_L8F4", "packed", 8, 4, 15),
    "packed_L4F8": ("packed_L4F8", "packed", 4, 8, 15),
    "packed_L8F4_T18": ("packed_L8F4_T18 (8x rows)", "packed", 8, 4, 18),
    "packed_L4F8_T18": ("packed_L4F8_T18 (8x rows)", "packed", 4, 8, 18),
    # dual = two half-voxel-staggered packed grids per level, concatenated:
    # restores the cross-voxel coupling whose absence makes packed-only
    # overfit (see the packed 100k-step rows). 2 gathers/(point, level).
    "packed_dual_L8F4": ("packed_dual_L8F4", "packed_dual", 8, 4, 15),
    "packed_dual_L4F8": ("packed_dual_L4F8", "packed_dual", 4, 8, 15),
    "packed_dual_L4F16": ("packed_dual_L4F16", "packed_dual", 4, 16, 15),
    "packed_dual_L4F8_T18": ("packed_dual_L4F8_T18 (8x rows)", "packed_dual", 4, 8, 18),
    "packed_dual_L4F16_T18": ("packed_dual_L4F16_T18 (8x rows)", "packed_dual", 4, 16, 18),
    # bricked = corner-SHARED 4^3-site bricks (stride 3), one gathered line
    # per (point, level) like packed but with lattice sites shared across
    # each brick's 3^3 voxels (ops/pallas/hash_brick.py) — the round-4
    # candidate for reference quality at packed speed.
    "bricked_L16F2": ("bricked_L16F2", "bricked", 16, 2, 15),
    "bricked_L16F2_T18": ("bricked_L16F2_T18 (8x rows)", "bricked", 16, 2, 18),
    # full PRODUCTION capacity (2^19/level — the reference's geometry, both
    # VMEM-resident at 64-67 MB): the bracket the production bench cites
    "hash_L16F2_T19": ("hash_L16F2_T19 (production capacity)", "hash", 16, 2, 19),
    "bricked_L16F2_T19": ("bricked_L16F2_T19 (production capacity)", "bricked", 16, 2, 19),
}


def main():
    # Positional args select variants, each optionally with its own step
    # budget ("packed_L8F4:100000") — the packed layout's whole point is a
    # 30-100x cheaper step, so the fair comparison is equal WALL TIME, not
    # equal steps. Results merge into NGP_QUALITY.json keyed on
    # (variant, steps).
    steps = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--steps=")), 3000))
    decay = float(next((a.split("=")[1] for a in sys.argv if a.startswith("--decay=")), 0.0))
    smooth = float(next((a.split("=")[1] for a in sys.argv if a.startswith("--smooth=")), 0.0))
    occ_keep = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--occupancy=")), 0))
    occ_threshold = float(next((a.split("=")[1] for a in sys.argv if a.startswith("--occ-threshold=")), 1e-2))
    samples = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--samples=")), 128))
    init_lr = float(next((a.split("=")[1] for a in sys.argv if a.startswith("--init-lr=")), 1e-2))
    end_lr = float(next((a.split("=")[1] for a in sys.argv if a.startswith("--end-lr=")), 1e-3))
    width = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--width=")), 64))
    pixels = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--pixels=")), 1024))
    max_res = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--max-res=")), 512))
    hierarchical = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--hierarchical=")), 0))
    picks = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not picks:
        picks = list(VARIANTS)

    from torch_nerf_tpu.datasets import synthetic

    img = 128
    train_data = synthetic.make_dataset(num_views=12, img_size=img, split="train")
    val_data = synthetic.make_dataset(num_views=3, img_size=img, split="val")
    images = jnp.asarray(train_data[0])
    poses = jnp.asarray(train_data[1])
    data = (images, poses, train_data[2], val_data)

    # scaled-down capacity (2^15/level) keeps runtimes short; the L*F budget
    # and 32-wide encoding match across variants exactly as at full scale
    results = []
    for pick in picks:
        key, _, per_steps = pick.partition(":")
        n, lay, l, f, log2 = VARIANTS[key]
        results.append(
            run_variant(
                n, lay, l, f, int(per_steps or steps), data,
                log2_entries=log2, decay=decay, smooth=smooth, occ_keep=occ_keep,
                occ_threshold=occ_threshold, samples=samples, init_lr=init_lr,
                end_lr=end_lr, width=width, pixels=pixels, max_res=max_res,
                hierarchical=hierarchical,
            )
        )

    dest = REPO / "NGP_QUALITY.json"
    merged = json.loads(dest.read_text()) if dest.exists() else []
    by_key = {(r["variant"], r["steps"]): r for r in merged}
    for r in results:
        by_key[(r["variant"], r["steps"])] = r
    merged = list(by_key.values())
    ref = next((r for r in merged if r["layout"] == "hash"), None)
    for r in merged:
        if ref is not None:
            r["psnr_vs_reference_layout"] = round(r["val_psnr"] - ref["val_psnr"], 3)
            r["wall_time_vs_reference_layout"] = round(
                r["train_seconds"] / ref["train_seconds"], 4
            )
    dest.write_text(json.dumps(merged, indent=2) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
