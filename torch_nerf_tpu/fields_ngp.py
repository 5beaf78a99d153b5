"""Instant-NGP field: hash-grid encoding + SH view directions.

Wires ``models.instant_ngp`` into the ``Field`` interface the renderer
consumes, mirroring the reference's scene wiring for the instant-NGP case
(``/root/reference/torch_nerf/runners/runner_utils.py:616-633``: the coord
encoder is dropped — raw positions go into the hash table — and the view
direction passes through the SH encoder).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from torch_nerf_tpu import encoders
from torch_nerf_tpu.fields import Field
from torch_nerf_tpu.models import instant_ngp


def make_instant_ngp_field(
    num_level: int = 16,
    log_max_entry_per_level: int = 19,
    table_feat_dim: int = 2,
    min_res: int = 16,
    max_res: int = 512,
    density_feat_dim: int = 64,
    color_feat_dim: int = 64,
    sh_degree: int = 4,
    is_hdr: bool = False,
    compute_dtype=jnp.float32,
    table_layout: str = "hash",
) -> Field:
    """Defaults mirror ``configs/network/instant_nerf.yaml`` +
    ``configs/signal_encoder/spherical_harmonics.yaml``.

    ``table_layout``: "hash" reproduces the reference's per-corner spatial
    hashing exactly (8 gathers/(point, level) — Pallas-accelerated on TPU
    via ``ops.pallas.hash_corner``); "bricked" is the production TPU layout
    (1 gather/(point, level) with corner sharing inside 4^3-site bricks —
    measured -0.12 dB vs "hash" at equal steps and 16x less wall time,
    NGP_QUALITY.json); "packed"/"packed_dual" are the round-2/3 voxel-packed
    layouts (fast but -4..-6 dB on novel views from the missing cross-voxel
    coupling) — see ``models.instant_ngp``.
    """
    resolutions = jnp.asarray(
        instant_ngp.level_resolutions(num_level, min_res, max_res)
    )
    view_dir_dim = encoders.sh_encoding_dim(sh_degree)

    def init(key: jax.Array):
        return instant_ngp.init_instant_ngp_params(
            key,
            view_dir_dim=view_dir_dim,
            num_level=num_level,
            log_max_entry_per_level=log_max_entry_per_level,
            table_feat_dim=table_feat_dim,
            density_feat_dim=density_feat_dim,
            color_feat_dim=color_feat_dim,
            table_layout=table_layout,
        )

    def apply(params, pts: jnp.ndarray, dirs: jnp.ndarray):
        # the reference feeds *unnormalized* ray directions to the SH
        # encoder (PrimitiveCube passes them straight through, cube.py:61-69)
        dir_enc = encoders.sh_encoding(dirs, sh_degree)
        return instant_ngp.instant_ngp_apply(
            params,
            pts,
            dir_enc,
            resolutions,
            is_hdr=is_hdr,
            compute_dtype=compute_dtype,
            table_layout=table_layout,
        )

    return Field(init=init, apply=apply, name="instant_ngp")


def make_encode_smoothness_loss(
    num_level: int,
    min_res: int = 16,
    max_res: int = 512,
    table_feat_dim: int = 2,
    table_layout: str = "packed",
    num_probes: int = 1024,
    bound: float = 2.5,
) -> Callable[[Dict[str, Any], jax.Array], jnp.ndarray]:
    """Voxel-face consistency penalty for the packed table layouts.

    The packed layouts fetch ONE row per (point, level): a lattice corner is
    stored once per adjacent voxel, the copies are independent parameters,
    and the encoded field is therefore DISCONTINUOUS at voxel faces. Measured
    consequence (NGP_QUALITY.json): every packed/dual variant plateaus ~4.5
    dB below the reference-parity "hash" layout on novel views while fitting
    the training views better — the copies memorize per-voxel instead of
    agreeing across faces. This loss penalizes the face jumps directly:

    For each level l, draw ``num_probes`` points ON random voxel-face planes
    (coordinate a set to a random integer plane of level l, the staggered
    grid's planes shifted by its 0.5 offset) and evaluate the full encode at
    ``p -+ eps*e_a`` with ``eps = 1e-3 / res_l``. The squared difference of
    the two encodes is, up to O(eps) slope terms, exactly the squared jump
    of level l's encoding across that face. Minimizing it drives the corner
    copies toward agreement — the penalty-method relaxation of the corner
    sharing the hash layout gets structurally. Gradients reach the tables
    through the production Pallas custom-VJP kernels (2 * num_probes * L
    extra gather/scatter rows per step — ~6% of the training rows at the
    reference operating point with num_probes=4096).

    Returns ``aux_loss(params, key) -> scalar`` (UNWEIGHTED — callers scale;
    ``params`` is one field's param dict with the ``"tables"`` leaf).
    """
    base_res = jnp.asarray(instant_ngp.level_resolutions(num_level, min_res, max_res))
    if table_layout == "packed_dual":
        resolutions, offsets = instant_ngp.dual_resolutions_offsets(base_res)
    elif table_layout == "packed":
        resolutions, offsets = base_res, jnp.zeros_like(base_res)
    else:
        raise ValueError(f"Smoothness loss applies to packed layouts, not '{table_layout}'.")
    levels = resolutions.shape[0]

    def aux_loss(params: Dict[str, Any], key: jax.Array) -> jnp.ndarray:
        feat_dim = table_feat_dim
        axis_key, plane_key, pos_key = jax.random.split(key, 3)
        # per (level, probe): a face axis, an integer face plane of that
        # level, and a free position on the plane
        axis = jax.random.randint(axis_key, (levels, num_probes), 0, 3)
        max_plane = jnp.floor(resolutions * bound).astype(jnp.int32)  # (levels,)
        u = jax.random.uniform(plane_key, (levels, num_probes))
        plane = jnp.floor((2.0 * u - 1.0) * max_plane[:, None]).astype(jnp.float32)
        pos = jax.random.uniform(
            pos_key, (levels, num_probes, 3), minval=-bound, maxval=bound
        )
        # face coordinate: scaled = res*x + off integral -> x = (k - off)/res
        face_x = (plane - offsets[:, None]) / resolutions[:, None]
        onehot = jax.nn.one_hot(axis, 3, dtype=pos.dtype)  # (levels, probes, 3)
        pos = pos * (1.0 - onehot) + face_x[..., None] * onehot
        eps = (1e-3 / resolutions)[:, None, None] * onehot
        p_minus = (pos - eps).reshape(-1, 3)
        p_plus = (pos + eps).reshape(-1, 3)

        both = jnp.concatenate([p_minus, p_plus], axis=0)
        enc = instant_ngp.hash_encode_packed128(
            params["tables"], both, resolutions, feat_dim, offsets=offsets
        )
        half = p_minus.shape[0]
        jump = enc[:half] - enc[half:]
        return jnp.mean(jnp.sum(jump * jump, axis=-1))

    return aux_loss
