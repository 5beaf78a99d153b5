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


def run_variant(name, layout, num_level, feat_dim, steps, data, log2_entries):
    from torch_nerf_tpu import metrics, train
    from torch_nerf_tpu.fields_ngp import make_instant_ngp_field
    from torch_nerf_tpu.renderer import RenderSettings, render_image

    images, poses, camera, val = data
    settings = RenderSettings(num_samples_coarse=128, num_samples_fine=0)
    field = make_instant_ngp_field(
        num_level=num_level,
        log_max_entry_per_level=log2_entries,
        table_feat_dim=feat_dim,
        compute_dtype=jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32,
        table_layout=layout,
    )
    optim = train.OptimConfig(num_iter=steps, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=1024, donate=True
    )

    key = jax.random.PRNGKey(1)
    start = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, images, poses, sub)
    jax.block_until_ready(m["loss"])
    train_s = time.perf_counter() - start

    val_images, val_poses, val_camera, _ = val
    psnrs = []
    for i in range(val_images.shape[0]):
        img = render_image(
            field, state.params["coarse"], None, val_camera,
            jnp.asarray(val_poses[i]), jax.random.PRNGKey(2), settings,
        )
        gt = np.asarray(val_images[i]).reshape(val_camera.img_height, val_camera.img_width, 3)
        psnrs.append(metrics.psnr(np.asarray(img), gt))
    out = {
        "variant": name,
        "layout": layout,
        "num_level": num_level,
        "feat_dim": feat_dim,
        "params": num_level * (2**log2_entries) * feat_dim,
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "final_loss": float(m["loss"]),
        "val_psnr": round(float(np.mean(psnrs)), 3),
    }
    print(json.dumps(out))
    return out


def main():
    steps = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--steps=")), 3000))
    from torch_nerf_tpu.datasets import synthetic

    img = 128
    train_data = synthetic.make_dataset(num_views=12, img_size=img, split="train")
    val_data = synthetic.make_dataset(num_views=3, img_size=img, split="val")
    images = jnp.asarray(train_data[0])
    poses = jnp.asarray(train_data[1])
    data = (images, poses, train_data[2], val_data)

    # scaled-down capacity (2^15/level) keeps runtimes short; the L*F budget
    # and 32-wide encoding match across variants exactly as at full scale
    variants = [
        ("hash_L16F2 (reference parity)", "hash", 16, 2),
        ("packed_L16F2", "packed", 16, 2),
        ("packed_L8F4", "packed", 8, 4),
        ("packed_L4F8", "packed", 4, 8),
    ]
    results = [run_variant(n, lay, l, f, steps, data, log2_entries=15) for n, lay, l, f in variants]

    ref = next(r for r in results if r["layout"] == "hash")
    for r in results:
        r["psnr_vs_reference_layout"] = round(r["val_psnr"] - ref["val_psnr"], 3)
    dest = REPO / "NGP_QUALITY.json"
    dest.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
