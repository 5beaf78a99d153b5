"""Checkpoint save/load via orbax.

Same contract as the reference's ``_save_ckpt`` / ``_load_ckpt``
(``/root/reference/torch_nerf/runners/runner_utils.py:736-831``): checkpoints
named by step under ``<log_dir>/ckpt/``, each holding the full training state
(params for coarse+fine, optimizer state, step counter); resume picks the
lexicographically-latest one. Orbax writes sharded, multi-host-safe
checkpoints, so the same path restores correctly on any mesh size.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from torch_nerf_tpu.train import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d{6,})$")


def ckpt_dir(log_dir: str | Path) -> Path:
    return Path(log_dir) / "ckpt"


def save_checkpoint(
    log_dir: str | Path, state: TrainState, occ_grid=None
) -> Path:
    """Write ``<log_dir>/ckpt/ckpt_<step:06d>`` with the full train state.

    ``occ_grid`` (the occupancy-pruning EMA-max grid, ~1 MB at R=64) is
    stored as a sidecar ``ckpt_<step>.occ.npy`` so resume restores it
    bit-exactly instead of approximating the EMA state with jittered
    rebuild sweeps. Old checkpoints without the sidecar keep working (the
    loader returns None and callers fall back to the sweep rebuild).
    """
    step = int(jax.device_get(state.step))
    path = ckpt_dir(log_dir) / f"ckpt_{step:06d}"
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path.resolve(),
            {
                "step": np.asarray(step, dtype=np.int64),
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state),
            },
            force=True,
        )
    if occ_grid is not None:
        tmp = path.parent / f".{path.name}.occ.npy.tmp"
        with open(tmp, "wb") as f:  # np.save on a handle keeps the exact name
            np.save(f, np.asarray(jax.device_get(occ_grid)))
        tmp.replace(occ_sidecar_path(path))
    return path


def occ_sidecar_path(ckpt_path: str | Path) -> Path:
    ckpt_path = Path(ckpt_path)
    return ckpt_path.parent / f"{ckpt_path.name}.occ.npy"


def load_occupancy_grid(ckpt_path: str | Path):
    """Occupancy grid saved next to ``ckpt_path``, or None (old ckpts)."""
    sidecar = occ_sidecar_path(ckpt_path)
    if not sidecar.exists():
        return None
    return np.load(sidecar)


def latest_checkpoint(log_dir: str | Path) -> Optional[Path]:
    """Lexicographically-latest checkpoint directory, or None."""
    directory = ckpt_dir(log_dir)
    if not directory.exists():
        return None
    candidates = sorted(
        p for p in directory.iterdir() if p.is_dir() and _CKPT_RE.match(p.name)
    )
    return candidates[-1] if candidates else None


def load_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore a checkpoint into the structure of ``template``."""
    target = {
        "step": np.asarray(0, dtype=np.int64),
        "params": jax.device_get(template.params),
        "opt_state": jax.device_get(template.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).resolve(), item=target)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


def restore_latest(log_dir: str | Path, template: TrainState) -> Optional[TrainState]:
    """Resume from the latest checkpoint under log_dir, if any."""
    path = latest_checkpoint(log_dir)
    if path is None:
        return None
    return load_checkpoint(path, template)
