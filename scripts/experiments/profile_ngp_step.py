"""Profile the instant-NGP train step on the real TPU and print the top
device-side ops by total time (parsed from the jax.profiler trace).

    python scripts/experiments/profile_ngp_step.py [--model=nerf]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def main(model: str) -> None:
    from torch_nerf_tpu import train
    from torch_nerf_tpu.datasets import synthetic
    from torch_nerf_tpu.renderer import RenderSettings

    num_pixels = 4096
    compute_dtype = jnp.bfloat16
    if model == "instant_nerf":
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field

        settings = RenderSettings(num_samples_coarse=256, num_samples_fine=0)

        def arg(name, default):
            return next((a.split("=")[1] for a in sys.argv if a.startswith(f"--{name}=")), default)

        field = make_instant_ngp_field(
            num_level=int(arg("levels", "16")),
            table_feat_dim=int(arg("feat", "2")),
            log_max_entry_per_level=int(arg("log2", "19")),
            compute_dtype=compute_dtype,
            table_layout=arg("layout", "packed"),
        )
        optim = train.OptimConfig(num_iter=300_000, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
    else:
        from torch_nerf_tpu.fields import make_nerf_field

        settings = RenderSettings(num_samples_coarse=64, num_samples_fine=128)
        field = make_nerf_field(compute_dtype=compute_dtype, use_pallas=True)
        optim = train.OptimConfig()

    images, poses, camera, _ = synthetic.make_dataset(num_views=8, img_size=400)
    images_j, poses_j = jnp.asarray(images), jnp.asarray(poses)
    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=num_pixels, donate=True
    )

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images_j, poses_j, sub)
    jax.block_until_ready(metrics["loss"])

    tmp = tempfile.mkdtemp(prefix="ngp_trace_")
    jax.profiler.start_trace(tmp)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images_j, poses_j, sub)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {tmp}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device pid discovery
    device_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev.get("args", {}).get("name", ""):
                device_pids.add(ev["pid"])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            tot[ev["name"]] += ev.get("dur", 0)
            cnt[ev["name"]] += 1
    total_us = sum(tot.values())
    print(f"total device time: {total_us/3/1e3:.1f} ms/step  ({tmp})")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/3/1e3:9.2f} ms/step  x{cnt[name]//3:<4d} {name[:110]}")


if __name__ == "__main__":
    main("instant_nerf" if "--model=nerf" not in sys.argv[1:] else "nerf")
