"""Direct timing split of the instant-NGP TPU-preset step: encode fwd,
encode fwd+bwd, and the full train-step cost, at the bench operating point
(4096 rays x 256 samples = 1,048,576 points). Prints one JSON line.

    python scripts/experiments/ngp_split_timing.py [--levels=4 --feat=8
        --log2=18 --layout=packed_dual] [--tile=4096 --group=4]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def arg(name, default):
    return next((a.split("=")[1] for a in sys.argv if a.startswith(f"--{name}=")), default)


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    from torch_nerf_tpu.models import instant_ngp

    num_level = int(arg("levels", "4"))
    feat = int(arg("feat", "8"))
    log2 = int(arg("log2", "18"))
    layout = arg("layout", "packed_dual")
    n = int(arg("n", str(4096 * 256)))

    key = jax.random.PRNGKey(0)
    params = instant_ngp.init_instant_ngp_params(
        key,
        view_dir_dim=16,
        num_level=num_level,
        log_max_entry_per_level=log2,
        table_feat_dim=feat,
        table_layout=layout,
    )
    tables = params["tables"]
    resolutions = jnp.asarray(instant_ngp.level_resolutions(num_level, 16, 512))
    coords = jax.random.uniform(key, (n, 3), minval=0.05, maxval=0.95)

    offsets = None
    if layout == "packed_dual":
        resolutions, offsets = instant_ngp.dual_resolutions_offsets(resolutions)

    def enc(t, c):
        return instant_ngp.hash_encode_packed128(
            t, c, resolutions, feat_dim=feat, offsets=offsets
        )

    fwd = jax.jit(enc)
    loss = jax.jit(jax.grad(lambda t, c: jnp.sum(enc(t, c) ** 2)))

    t_fwd = timeit(fwd, tables, coords)
    t_fwdbwd = timeit(loss, tables, coords)
    rows = n * num_level * (2 if layout == "packed_dual" else 1)
    print(json.dumps({
        "layout": layout, "L": num_level, "F": feat, "n": n,
        "encode_fwd_ms": round(t_fwd * 1e3, 2),
        "encode_fwd_bwd_ms": round(t_fwdbwd * 1e3, 2),
        "fwd_rows_per_s_M": round(rows / t_fwd / 1e6, 1),
        "fwdbwd_rows_per_s_M": round(2 * rows / t_fwdbwd / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
