"""Volume renderer: coarse/fine ray rendering, full inside jit.

TPU-native replacement for the reference's ``VolumeRenderer``
(``/root/reference/torch_nerf/src/renderer/volume_renderer.py:15-289``). The
reference chunks rays with a Python loop as an OOM workaround
(``volume_renderer.py:229-254``); here full-image rendering uses
``jax.lax.map`` over statically-shaped ray chunks so a single compiled
program renders any image, and training renders the whole 4096-ray batch in
one fused program (sample -> encode -> MLP -> composite with no HBM
round-trips beyond what XLA schedules).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torch_nerf_tpu import cameras
from torch_nerf_tpu.fields import Field
from torch_nerf_tpu.ops import integration, sampling


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static rendering configuration (hashable; safe as a jit static arg).

    Mirrors ``configs/renderer/volume_renderer_default.yaml:1-8``.
    """

    num_samples_coarse: int = 64
    num_samples_fine: int = 128
    t_near: float = 2.0
    t_far: float = 6.0
    project_to_ndc: bool = False
    # z_near used by the NDC projection itself. The reference forwards
    # ``camera.t_near`` here (``sampler_base.py:168-176``) which the LLFF
    # branch has already rewritten to 0.0 (``runner_utils.py:490-492``),
    # collapsing the NDC z coordinate; we default to the official-NeRF
    # convention (near plane at 1.0) and keep the knob for bug-parity runs.
    ndc_z_near: float = 1.0

    @property
    def hierarchical(self) -> bool:
        return self.num_samples_fine > 0


def render_rays(
    field: Field,
    params_coarse: Any,
    params_fine: Optional[Any],
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays; returns coarse (and fine) RGB + weights.

    Pipeline per the reference train loop (``runners/train.py:170-210``):
    stratified coarse pass; then, if ``num_samples_fine > 0``, a fine pass on
    the same rays whose t-samples mix the coarse stratification with
    inverse-CDF draws from the coarse weights. The coarse weights are
    ``stop_gradient``-ed before fine sampling — the reference does not detach
    but its ``searchsorted`` kills the gradient path anyway, so the effective
    behavior is identical.
    """
    num_rays = ray_origin.shape[0]
    coarse_key, fine_key = jax.random.split(key)

    t_coarse = sampling.stratified_t_samples(
        coarse_key, num_rays, settings.t_near, settings.t_far, settings.num_samples_coarse
    )
    out = _render_pass(field, params_coarse, ray_origin, ray_dir, t_coarse)
    result = {
        "rgb_coarse": out["rgb"],
        "weights_coarse": out["weights"],
        "t_coarse": t_coarse,
    }

    if settings.hierarchical:
        if params_fine is None:
            raise ValueError("Hierarchical rendering requires fine-network params.")
        weights = jax.lax.stop_gradient(out["weights"])
        t_fine = sampling.hierarchical_t_samples(
            fine_key,
            weights,
            settings.t_near,
            settings.t_far,
            settings.num_samples_coarse,
            settings.num_samples_fine,
        )
        fine_out = _render_pass(field, params_fine, ray_origin, ray_dir, t_fine)
        result.update(
            rgb_fine=fine_out["rgb"],
            weights_fine=fine_out["weights"],
            t_fine=t_fine,
        )

    return result


def _render_pass(
    field: Field,
    params: Any,
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    t_samples: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Single network evaluation + compositing for given t samples."""
    pts = sampling.points_along_rays(ray_origin, ray_dir, t_samples)
    dirs = jnp.broadcast_to(ray_dir[:, None, :], pts.shape)
    sigma, radiance = field.apply(params, pts, dirs)
    delta = sampling.t_deltas(t_samples)
    rgb, weights = integration.composite(sigma, radiance, delta)
    return {"rgb": rgb, "weights": weights}


@functools.partial(
    jax.jit, static_argnames=("field", "settings", "camera", "chunk_size")
)
def render_image(
    field: Field,
    params_coarse: Any,
    params_fine: Optional[Any],
    camera: cameras.CameraParams,
    extrinsic: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    chunk_size: int = 4096,
) -> jnp.ndarray:
    """Render a full image -> (H, W, 3), chunked via ``lax.map``.

    Replaces the eval-time Python chunk loop of
    ``volume_renderer.py:229-254`` / ``runners/train.py:296-323`` with a
    compiled ``lax.map`` over fixed-size ray chunks (rays are padded up to a
    chunk multiple; padding is cropped after the map). One compilation serves
    every pose at a given resolution.
    """
    h, w = camera.img_height, camera.img_width
    num_pixels = h * w
    num_chunks = -(-num_pixels // chunk_size)
    padded = num_chunks * chunk_size

    pixel_idx = jnp.arange(padded, dtype=jnp.int32)
    pixel_idx = jnp.minimum(pixel_idx, num_pixels - 1)
    origins, dirs = cameras.rays_for_pixels(
        pixel_idx,
        camera,
        extrinsic,
        use_ndc=settings.project_to_ndc,
        ndc_z_near=settings.ndc_z_near,
    )

    origins = origins.reshape(num_chunks, chunk_size, 3)
    dirs = dirs.reshape(num_chunks, chunk_size, 3)
    # per-chunk keys derived from each chunk's FIRST PIXEL (not its position
    # in a split sequence): any renderer that chunks the same pixel grid —
    # in particular the data-parallel path on any device count — draws
    # identical samples and produces bit-identical images
    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
        jnp.arange(num_chunks, dtype=jnp.int32) * chunk_size
    )

    def render_chunk(args):
        o, d, k = args
        out = render_rays(field, params_coarse, params_fine, o, d, k, settings)
        return out["rgb_fine"] if settings.hierarchical else out["rgb_coarse"]

    rgb = jax.lax.map(render_chunk, (origins, dirs, keys))
    rgb = rgb.reshape(padded, 3)[:num_pixels]
    return rgb.reshape(h, w, 3)
