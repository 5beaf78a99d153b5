"""Data-parallel scaling harness: rays/s vs mesh size.

Runs the sharded image train step (global ray batch fixed, rays sharded over
the ``data`` axis) at increasing device counts and reports throughput and
scaling efficiency. On a real pod slice each mesh size spans real chips and
the psum rides ICI; on a dev box run it against virtual devices to validate
the scaling *machinery* (not real perf):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --platform cpu

Prints one JSON line per mesh size:
    {"devices": N, "rays_per_sec": ..., "efficiency_vs_1": ...,
     "sharding_overhead_vs_1": ..., "allreduce_ops": ...,
     "max_allreduce_elems": ...}

``efficiency_vs_1`` divides by N — meaningful on real chips only. On a
virtual mesh (all devices sharing the host cores) the machinery signal is
``sharding_overhead_vs_1`` = total rays/s vs the 1-device run at the SAME
total work and the SAME fixed compute budget: ~1.0 means mesh construction,
sharding, and the inserted collectives cost nothing. ``--weak`` scales the
ray batch with the mesh instead (per-device work constant).

``allreduce_ops``/``max_allreduce_elems`` are read from the compiled HLO:
for N > 1 the step must carry a gradient-sized all-reduce (the DP pmean);
the harness asserts it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None, help="force a jax platform (cpu)")
    parser.add_argument("--num-pixels", type=int, default=4096)
    parser.add_argument("--samples-coarse", type=int, default=32)
    parser.add_argument("--samples-fine", type=int, default=32)
    parser.add_argument("--feat-dim", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--weak", action="store_true",
        help="scale the ray batch with the mesh (per-device work constant)",
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from torch_nerf_tpu import train
    from torch_nerf_tpu.datasets import synthetic
    from torch_nerf_tpu.fields import make_nerf_field
    from torch_nerf_tpu.parallel import make_mesh, make_sharded_image_train_step
    from torch_nerf_tpu.renderer import RenderSettings

    field = make_nerf_field(feat_dim=args.feat_dim)
    settings = RenderSettings(
        num_samples_coarse=args.samples_coarse, num_samples_fine=args.samples_fine
    )
    optim = train.OptimConfig(num_iter=10_000)
    images, poses, camera, _ = synthetic.make_dataset(num_views=4, img_size=128)
    images_j, poses_j = jnp.asarray(images), jnp.asarray(poses)

    import re

    total = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= total]
    base = None
    for n in sizes:
        num_pixels = args.num_pixels * (n if args.weak else 1)
        mesh = make_mesh(("data",), devices=jax.devices()[:n])
        build, place = make_sharded_image_train_step(
            field, settings, optim, camera, mesh, num_pixels=num_pixels
        )
        state = place(
            train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
        )
        step = build(state)
        key = jax.random.PRNGKey(1)

        # collective accounting from the compiled HLO: DP must insert a
        # gradient-sized all-reduce for n > 1 (SURVEY.md section 5.8)
        hlo = step.lower(state, images_j, poses_j, key).compile().as_text()
        ar_lines = [l for l in hlo.splitlines() if "all-reduce" in l and " = " in l]
        sizes_elems = []
        for line in ar_lines:
            for s in re.findall(r"f32\[([0-9,]*)\]", line):
                dims = [int(d) for d in s.split(",") if d]
                sizes_elems.append(int(1 if not dims else __import__("numpy").prod(dims)))
        max_ar = max(sizes_elems, default=0)
        if n > 1:
            param_count = sum(
                x.size for x in jax.tree.leaves(state.params)
            )
            largest_leaf = max(x.size for x in jax.tree.leaves(state.params))
            assert max_ar >= largest_leaf, (
                f"n={n}: no gradient-sized all-reduce in HLO "
                f"(max {max_ar} elems, largest param leaf {largest_leaf})"
            )

        state, metrics = step(state, images_j, poses_j, key)
        jax.block_until_ready(metrics["loss"])
        start = time.perf_counter()
        for i in range(args.iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, images_j, poses_j, sub)
        jax.block_until_ready(metrics["loss"])
        rays_per_sec = num_pixels * args.iters / (time.perf_counter() - start)
        if base is None:
            base = rays_per_sec
        print(
            json.dumps(
                {
                    "devices": n,
                    "rays_per_sec": round(rays_per_sec, 1),
                    "efficiency_vs_1": round(rays_per_sec / (base * n), 3),
                    "sharding_overhead_vs_1": round(rays_per_sec / base, 3),
                    "allreduce_ops": len(ar_lines),
                    "max_allreduce_elems": max_ar,
                }
            )
        )


if __name__ == "__main__":
    main()
