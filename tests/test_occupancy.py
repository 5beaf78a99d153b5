"""Occupancy-grid sample pruning (torch_nerf_tpu/occupancy.py).

The reference has no occupancy counterpart (its sampler is purely
stratified, ``/root/reference/torch_nerf/src/renderer/ray_samplers/
stratified_sampler.py:92-109``); these tests pin the pruning invariants the
design claims: static-K selection semantics, EXACT quadrature equality when
pruned samples carry zero density, EMA-max grid dynamics, and an end-to-end
pruned train step that actually learns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_nerf_tpu import occupancy, train
from torch_nerf_tpu.ops import integration, sampling
from torch_nerf_tpu.renderer import RenderSettings


class TestSelectSamples:
    def test_all_occupied_full_budget_is_identity(self):
        occ = jnp.ones((3, 16), bool)
        idx = occupancy.select_samples(occ, 16)
        np.testing.assert_array_equal(idx, np.tile(np.arange(16), (3, 1)))

    def test_keeps_every_occupied_when_under_budget(self):
        rng = np.random.default_rng(0)
        occ_np = rng.random((8, 32)) < 0.2  # ~6 occupied of 32
        idx = np.asarray(occupancy.select_samples(jnp.asarray(occ_np), 12))
        for row in range(8):
            occupied = np.flatnonzero(occ_np[row]).tolist()
            assert set(occupied) <= set(idx[row].tolist())
            # kept occupied samples lead, in ascending ray order
            assert idx[row][: len(occupied)].tolist() == occupied

    def test_over_budget_keeps_exactly_k_evenly_spaced_occupied(self):
        occ = jnp.ones((1, 32), bool)  # 32 occupied, keep 8
        idx = np.asarray(occupancy.select_samples(occ, 8))[0]
        # rank-quota rule: r-th occupied kept iff floor(r*8/32) increments
        np.testing.assert_array_equal(idx, np.arange(3, 32, 4))

    def test_padding_uses_earliest_unoccupied(self):
        occ = np.zeros((1, 16), bool)
        occ[0, 10] = True
        idx = np.asarray(occupancy.select_samples(jnp.asarray(occ), 4))[0]
        # kept sample first, then the earliest unoccupied pad samples
        assert idx.tolist() == [10, 0, 1, 2]


class TestPrunedQuadrature:
    def test_exact_when_pruned_samples_have_zero_density(self):
        """Compositing the kept samples against dense deltas reproduces the
        dense quadrature bit-for-bit structure when pruned sigma == 0."""
        cfg = occupancy.OccupancyConfig(
            resolution=8, bound=2.0, keep_samples=20, warmup_steps=0, threshold=0.5
        )
        # occupied half-space x > 0 (cell boundary at x=0 since R is even)
        r = cfg.resolution
        grid = np.zeros(r**3, np.float32)
        ijk0 = np.arange(r**3) // (r * r)
        grid[ijk0 >= r // 2] = 1.0
        grid = jnp.asarray(grid)

        key = jax.random.PRNGKey(3)
        n, s = 6, 32
        ray_o = jnp.stack(
            [jnp.full((n,), -1.9), jnp.linspace(-1.0, 1.0, n), jnp.zeros((n,))], -1
        )
        ray_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
        t = sampling.stratified_t_samples(key, n, 0.1, 3.5, s)

        def sigma_fn(pts):  # exactly zero where the grid is empty
            return jnp.where(pts[..., 0] > 0.0, 1.3, 0.0)

        def radiance_fn(pts):
            return jax.nn.sigmoid(pts)

        pts_dense = sampling.points_along_rays(ray_o, ray_d, t)
        rgb_dense, _ = integration.composite(
            sigma_fn(pts_dense), radiance_fn(pts_dense), sampling.t_deltas(t)
        )

        t_sel, delta_sel = occupancy.prune_t_samples(
            grid, cfg, ray_o, ray_d, t, jnp.asarray(100)
        )
        pts_sel = sampling.points_along_rays(ray_o, ray_d, t_sel)
        rgb_pruned, _ = integration.composite(
            sigma_fn(pts_sel), radiance_fn(pts_sel), delta_sel
        )
        np.testing.assert_allclose(rgb_pruned, rgb_dense, atol=1e-6)

    def test_warmup_treats_everything_occupied(self):
        cfg = occupancy.OccupancyConfig(resolution=4, warmup_steps=10, keep_samples=8)
        grid = occupancy.init_grid(cfg)
        pts = jax.random.normal(jax.random.PRNGKey(0), (50, 3))
        assert bool(jnp.all(occupancy.occupied_mask(grid, pts, cfg, jnp.asarray(5))))
        assert not bool(
            jnp.any(occupancy.occupied_mask(grid, pts, cfg, jnp.asarray(10)))
        )


class TestGridUpdate:
    def test_ema_max_and_decay(self):
        cfg = occupancy.OccupancyConfig(resolution=4, bound=1.0, decay=0.5)
        grid = jnp.full((4**3,), 2.0)

        def density_fn(params, pts):
            return jnp.where(pts[..., 0] > 0.0, 10.0, 0.0)

        new = occupancy.update_grid(grid, density_fn, {}, jax.random.PRNGKey(0), cfg)
        new = np.asarray(new)
        assert np.all((new == 10.0) | (new == 1.0))  # max(0.5*2, sigma)
        assert (new == 10.0).sum() == 4**3 // 2

    def test_maybe_update_fires_on_cadence(self):
        cfg = occupancy.OccupancyConfig(resolution=4, bound=1.0, update_every=4)
        grid = occupancy.init_grid(cfg)

        def density_fn(params, pts):
            return jnp.ones(pts.shape[:-1])

        out = occupancy.maybe_update_grid(
            grid, density_fn, {}, jax.random.PRNGKey(0), jnp.asarray(3), cfg
        )
        assert float(out.max()) == 0.0
        out = occupancy.maybe_update_grid(
            grid, density_fn, {}, jax.random.PRNGKey(0), jnp.asarray(4), cfg
        )
        assert float(out.min()) == 1.0


class TestPrunedTraining:
    def test_image_step_threads_grid_and_learns(self):
        from torch_nerf_tpu.datasets import synthetic
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field

        images, poses, camera, _ = synthetic.make_dataset(num_views=2, img_size=16)
        field = make_instant_ngp_field(
            num_level=2,
            log_max_entry_per_level=8,
            table_feat_dim=2,
            min_res=4,
            max_res=8,
            table_layout="packed",
        )
        settings = RenderSettings(
            num_samples_coarse=32, num_samples_fine=0, t_near=2.0, t_far=6.0
        )
        optim = train.OptimConfig(num_iter=200, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
        occ_cfg = occupancy.OccupancyConfig(
            resolution=8, bound=4.0, update_every=8, keep_samples=16, warmup_steps=24
        )
        state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
        grid = occupancy.init_grid(occ_cfg)
        step = train.make_image_train_step(
            field, settings, optim, camera, num_pixels=64,
            donate=False, occupancy_cfg=occ_cfg,
        )
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(60):
            key, sub = jax.random.split(key)
            state, grid, metrics = step(state, grid, jnp.asarray(images), jnp.asarray(poses), sub)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 60
        # grid received update sweeps (sigma at init is ~2^0=1 everywhere)
        assert float(jnp.max(grid)) > 0.0
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_dp_occupancy_image_step_matches_single_device(self):
        """8-way data-parallel pruned step == single-device pruned step:
        the grid is replicated, pruning is per-ray, and the density sweep
        runs under the same sharding annotations (parallel/mesh.py)."""
        from torch_nerf_tpu.datasets import synthetic
        from torch_nerf_tpu.fields_ngp import make_instant_ngp_field
        from torch_nerf_tpu.parallel import make_mesh, make_sharded_image_train_step

        images, poses, camera, _ = synthetic.make_dataset(num_views=2, img_size=16)
        images_j, poses_j = jnp.asarray(images), jnp.asarray(poses)
        field = make_instant_ngp_field(
            num_level=2, log_max_entry_per_level=8, table_feat_dim=2,
            min_res=4, max_res=8, table_layout="packed",
        )
        settings = RenderSettings(
            num_samples_coarse=32, num_samples_fine=0, t_near=2.0, t_far=6.0
        )
        optim = train.OptimConfig(num_iter=100, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
        occ_cfg = occupancy.OccupancyConfig(
            resolution=8, bound=4.0, update_every=2, keep_samples=16, warmup_steps=1
        )
        state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
        grid0 = occupancy.init_grid(occ_cfg)
        key = jax.random.PRNGKey(7)

        ref_step = train.make_image_train_step(
            field, settings, optim, camera, num_pixels=64,
            donate=False, occupancy_cfg=occ_cfg,
        )
        ref_state, ref_grid, ref_metrics = ref_step(state, grid0, images_j, poses_j, key)

        mesh = make_mesh(("data",))
        build, place_state = make_sharded_image_train_step(
            field, settings, optim, camera, mesh, num_pixels=64,
            occupancy_cfg=occ_cfg,
        )
        sharded = place_state(state)
        step = build(sharded)
        new_state, new_grid, metrics = step(
            sharded, jax.device_put(grid0), images_j, poses_j, key
        )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_grid), np.asarray(ref_grid), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(new_state.params["coarse"]["tables"]),
            np.asarray(ref_state.params["coarse"]["tables"]),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_dp_occupancy_with_fused_capable_field_traces(self):
        """Regression (ADVICE r3): a fused-capable field + occupancy on a
        multi-device mesh must fall through to the generic path — the fused
        DP ray step cannot thread the grid, and selecting it raised a
        TypeError at jit trace (6 args into a 5-arg step)."""
        from torch_nerf_tpu.datasets import synthetic
        from torch_nerf_tpu.fields import make_nerf_field
        from torch_nerf_tpu.parallel import make_mesh, make_sharded_image_train_step

        images, poses, camera, _ = synthetic.make_dataset(num_views=2, img_size=16)
        field = make_nerf_field(
            coord_encode_level=2, dir_encode_level=1, feat_dim=32,
            use_pallas=True, pallas_interpret=True,
        )
        assert field.fused_cfg is not None
        settings = RenderSettings(
            num_samples_coarse=16, num_samples_fine=0, t_near=2.0, t_far=6.0
        )
        optim = train.OptimConfig(num_iter=100)
        occ_cfg = occupancy.OccupancyConfig(
            resolution=4, update_every=4, keep_samples=8, warmup_steps=1
        )
        state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
        mesh = make_mesh(("data",))
        build, place_state = make_sharded_image_train_step(
            field, settings, optim, camera, mesh, num_pixels=64,
            occupancy_cfg=occ_cfg,
        )
        sharded = place_state(state)
        step = build(sharded)
        new_state, new_grid, metrics = step(
            sharded, occupancy.init_grid(occ_cfg),
            jnp.asarray(images), jnp.asarray(poses), jax.random.PRNGKey(3),
        )
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))

    def test_rejects_hierarchical(self):
        from torch_nerf_tpu.fields import make_nerf_field

        field = make_nerf_field()
        with pytest.raises(ValueError, match="single-pass"):
            train.make_ray_train_step(
                field,
                RenderSettings(num_samples_coarse=8, num_samples_fine=8),
                train.OptimConfig(),
                occupancy_cfg=occupancy.OccupancyConfig(),
            )
