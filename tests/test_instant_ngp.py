"""Tests for the Instant-NGP hash encoding and model, incl. torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torch_nerf_tpu.fields_ngp import make_instant_ngp_field
from torch_nerf_tpu.models import instant_ngp


def test_level_resolutions_geometric():
    res = instant_ngp.level_resolutions(16, 16, 512)
    assert res[0] == 16.0
    assert res[-1] == 512.0
    assert len(res) == 16
    assert np.all(np.diff(res) > 0)


def test_spatial_hash_matches_torch_semantics():
    """int32 wraparound multiply + xor + sign-following mod, vs torch."""
    rng = np.random.default_rng(0)
    coords = rng.integers(-1000, 1000, size=(256, 3)).astype(np.int32)
    num_entries = 2**13

    # torch reference semantics (restated from instant_ngp.py:558-568).
    # Note: the reference's literal 2654435761 only fits int32 by silent
    # wraparound under its pinned torch==1.11; torch>=2 rejects it, so we
    # pre-wrap explicitly to reproduce the 1.11 behavior.
    wrapped_primes = (
        np.array([1, 2654435761, 805459861], dtype=np.uint64)
        .astype(np.uint32)
        .astype(np.int64)
    )
    tc = torch.from_numpy(coords)
    primes = torch.from_numpy(
        wrapped_primes.astype(np.uint32).view(np.int32)
    ).reshape(1, 3)
    x = primes * tc
    t_idx = torch.bitwise_xor(x[..., 0], x[..., 1])
    t_idx = torch.bitwise_xor(t_idx, x[..., 2]) % num_entries

    j_idx = instant_ngp.spatial_hash(jnp.asarray(coords), num_entries)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    assert np.all(np.asarray(j_idx) >= 0)


def test_hash_encode_shapes_and_interpolation():
    key = jax.random.PRNGKey(0)
    L, logT, F = 4, 10, 2
    tables = instant_ngp.init_hash_table(key, L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 32))

    coords = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(32, 3)), jnp.float32)
    feats = instant_ngp.hash_encode(tables, coords, res)
    assert feats.shape == (32, L * F)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_hash_encode_integral_coords_zero_feature():
    """Reference quirk: floor==ceil at integral coords -> all-zero weights."""
    key = jax.random.PRNGKey(0)
    tables = instant_ngp.init_hash_table(key, 2, 8, 2)
    res = jnp.asarray([1.0, 2.0])
    coords = jnp.asarray([[1.0, 2.0, 3.0]])  # integral at both levels
    feats = instant_ngp.hash_encode(tables, coords, res)
    np.testing.assert_allclose(np.asarray(feats), 0.0, atol=1e-12)


def test_hash_encode_trilinear_weights_sum():
    """For non-integral coords the 8 trilinear weights sum to 1."""
    rng = np.random.default_rng(2)
    scaled = rng.uniform(0.1, 0.9, size=(16, 3)) + rng.integers(0, 5, (16, 3))
    floor, ceil = np.floor(scaled), np.ceil(scaled)
    corners = instant_ngp._CORNERS
    opposite = floor[:, None, :] + (1 - corners[None]) * (ceil - floor)[:, None, :]
    w = np.prod(np.abs(opposite - scaled[:, None, :]), axis=-1)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-10)


def test_small_mlp_no_relu_after_fc_in():
    """fc_in output must feed the hidden layer unactivated (reference quirk)."""
    key = jax.random.PRNGKey(0)
    params = instant_ngp.init_small_mlp(key, 4, 2, 8, num_hidden_layer=1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)

    out = instant_ngp.small_mlp_apply(params, x)

    # manual: h = relu(W1 @ (W0 x + b0) + b1); y = W2 h + b2
    w0, b0 = np.asarray(params["fc_in"]["w"]), np.asarray(params["fc_in"]["b"])
    w1, b1 = np.asarray(params["fc_hidden_0"]["w"]), np.asarray(params["fc_hidden_0"]["b"])
    w2, b2 = np.asarray(params["fc_out"]["w"]), np.asarray(params["fc_out"]["b"])
    h0 = np.asarray(x) @ w0 + b0  # NOT relu'd
    h1 = np.maximum(h0 @ w1 + b1, 0)
    expect = h1 @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_instant_ngp_apply_density_activation():
    """sigma = 2^out[...,0] — strictly positive, no ReLU."""
    key = jax.random.PRNGKey(0)
    params = instant_ngp.init_instant_ngp_params(
        key, view_dir_dim=16, num_level=4, log_max_entry_per_level=8
    )
    res = jnp.asarray(instant_ngp.level_resolutions(4, 4, 32))
    pos = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (16, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16)), jnp.float32)
    sigma, rgb = instant_ngp.instant_ngp_apply(params, pos, dirs, res)
    assert sigma.shape == (16,)
    assert rgb.shape == (16, 3)
    assert np.all(np.asarray(sigma) > 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_instant_ngp_field_trains():
    """Gradient flows through hash tables and both MLPs."""
    field = make_instant_ngp_field(
        num_level=4, log_max_entry_per_level=8, min_res=4, max_res=32
    )
    params = field.init(jax.random.PRNGKey(0))

    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 4, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4, 3)), jnp.float32)

    def loss(p):
        sigma, rgb = field.apply(p, pts, dirs)
        return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)

    grads = jax.grad(loss)(params)
    table_grad = np.asarray(grads["tables"])
    assert np.any(table_grad != 0), "no gradient reached the hash tables"
    assert np.all(np.isfinite(table_grad))
    assert np.any(np.asarray(grads["color_mlp"]["fc_in"]["w"]) != 0)


def test_hash_encode_packed_matches_naive_loop():
    """Voxel-packed encode vs a direct per-point/per-level numpy loop."""
    L, logT, F = 3, 9, 2
    T = 2**logT // 8  # logical packed rows: 8 corner slots each
    fold = 128 // (8 * F)
    key = jax.random.PRNGKey(3)
    tables = instant_ngp.init_packed_hash_table(key, L, logT, F)
    assert tables.shape == (L, T // fold, 128)
    res = instant_ngp.level_resolutions(L, 4, 16)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.5, 1.5, (17, 3)).astype(np.float32)

    out = np.asarray(
        instant_ngp.hash_encode_packed(tables, jnp.asarray(pts), jnp.asarray(res), F)
    )

    tab_np = np.asarray(instant_ngp.unfold_packed_table(tables, F))
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    corners = np.asarray(instant_ngp._CORNERS)
    for n in range(pts.shape[0]):
        for level in range(L):
            scaled = pts[n] * res[level]
            floor = np.floor(scaled)
            span = np.ceil(scaled) - floor
            h = np.uint32(0)
            for a in range(3):
                v = np.uint32(np.int64(floor[a]) & 0xFFFFFFFF) * np.uint32(primes[a])
                h = np.bitwise_xor(h, np.uint32(v & np.uint64(0xFFFFFFFF)))
            row = int(np.int32(h) % np.int32(T))
            if row < 0:
                row += T
            feats = tab_np[level, row].reshape(8, F)
            expect = np.zeros(F, dtype=np.float64)
            for c in range(8):
                opposite = floor + (1.0 - corners[c]) * span
                w = np.prod(np.abs(opposite - scaled))
                expect += w * feats[c]
            np.testing.assert_allclose(
                out[n, level * F : (level + 1) * F], expect, rtol=1e-4, atol=1e-6
            )


def test_packed_field_trains_and_matches_shapes():
    """Packed layout: grads flow to the packed tables; output shapes equal
    the reference-parity layout's."""
    field = make_instant_ngp_field(
        num_level=4, log_max_entry_per_level=8, min_res=4, max_res=32,
        table_layout="packed",
    )
    params = field.init(jax.random.PRNGKey(0))
    # 2^8 corner slots / 8 per packed row = 32 rows, folded 8 rows per line
    assert params["tables"].shape == (4, 4, 128)

    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 4, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4, 3)), jnp.float32)
    sigma, rgb = field.apply(params, pts, dirs)
    assert sigma.shape == (8, 4)
    assert rgb.shape == (8, 4, 3)

    def loss(p):
        s, r = field.apply(p, pts, dirs)
        return jnp.mean(r) + 1e-3 * jnp.mean(s)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(grads["tables"]) != 0)
    assert np.all(np.isfinite(np.asarray(grads["tables"])))


def test_folded_kernels_interpret_match_xla_path():
    """Interpret-mode Pallas encode (fwd + grad) == the XLA fallback path.

    N deliberately not a multiple of 128 to exercise the tile padding the
    round-1 scatter kernel got wrong on small batches (ADVICE.md)."""
    L, logT, F = 3, 9, 4
    key = jax.random.PRNGKey(3)
    tables = instant_ngp.init_packed_hash_table(key, L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 16))
    # non-zero offsets on one level exercise the in-kernel dual-grid stagger
    off = jnp.asarray([0.0, 0.5, 0.0], jnp.float32)
    pts = jnp.asarray(
        np.random.default_rng(9).uniform(-1.5, 1.5, (100, 3)), jnp.float32
    )

    def loss(t, interpret):
        out = instant_ngp.hash_encode_packed(
            t, pts, res, F, interpret=interpret, offsets=off
        )
        return jnp.sum(out**2), out

    (l_k, out_k), g_k = jax.value_and_grad(loss, has_aux=True)(tables, True)
    (l_x, out_x), g_x = jax.value_and_grad(loss, has_aux=True)(tables, False)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), rtol=1e-5, atol=1e-6)


def test_packed_table_grad_matches_plain_autodiff():
    """custom_vjp table gradient == plain-XLA autodiff gradient."""
    L, logT, F = 3, 9, 2
    key = jax.random.PRNGKey(3)
    tables = instant_ngp.init_packed_hash_table(key, L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 16))
    pts = jnp.asarray(
        np.random.default_rng(5).uniform(-1.5, 1.5, (33, 3)), jnp.float32
    )

    def loss_custom(t):
        return jnp.sum(instant_ngp.hash_encode_packed(t, pts, res, F) ** 2)

    def encode_plain(t_folded):
        # same math, plain jnp.take (no custom_vjp) — the autodiff oracle,
        # on the unfolded (L, rows, 8F) logical packed layout
        t = instant_ngp.unfold_packed_table(t_folded, F)
        num_level, num_rows, row_dim = t.shape
        feat_dim = row_dim // 8
        primes = jnp.asarray(instant_ngp._HASH_PRIMES, dtype=jnp.uint32)
        corner_bits = jnp.asarray(instant_ngp._CORNERS)
        n = pts.shape[0]
        idx = jnp.zeros((n, num_level), dtype=jnp.uint32)
        weights = jnp.ones((n, num_level * 8), dtype=pts.dtype)
        for axis in range(3):
            scaled = pts[:, axis : axis + 1] * res[None, :]
            floor = jnp.floor(scaled)
            span = jnp.ceil(scaled) - floor
            idx = jnp.bitwise_xor(
                idx, floor.astype(jnp.int32).astype(jnp.uint32) * primes[axis]
            )
            bit = jnp.tile(corner_bits[:, axis], (num_level,))[None, :]
            opposite = jnp.repeat(floor, 8, -1) + (1.0 - bit) * jnp.repeat(span, 8, -1)
            weights = weights * jnp.abs(opposite - jnp.repeat(scaled, 8, -1))
        idx = jnp.mod(idx.astype(jnp.int32), jnp.int32(num_rows))
        offs = jnp.arange(num_level, dtype=jnp.int32) * num_rows
        rows = jnp.take(t.reshape(-1, row_dim), (idx + offs[None]).reshape(-1), axis=0)
        feats = rows.reshape(n, num_level, 8, feat_dim)
        w = weights.reshape(n, num_level, 8)
        return jnp.sum(feats * w[..., None], axis=2).reshape(n, num_level * feat_dim)

    g_custom = jax.grad(loss_custom)(tables)
    g_plain = jax.grad(lambda t: jnp.sum(encode_plain(t) ** 2))(tables)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )


def test_hash_encode_matches_naive_per_corner_loop():
    """Lane-major hash_encode vs a direct per-corner reference loop
    (the reference algorithm restated: hash EACH corner, blend trilinearly)."""
    L, logT, F = 3, 10, 2
    T = 2**logT
    tables = instant_ngp.init_hash_table(jax.random.PRNGKey(2), L, logT, F)
    res = instant_ngp.level_resolutions(L, 4, 16)
    pts = np.random.default_rng(11).uniform(-1.5, 1.5, (13, 3)).astype(np.float32)

    out = np.asarray(
        instant_ngp.hash_encode(tables, jnp.asarray(pts), jnp.asarray(res))
    )

    tab_np = np.asarray(tables)
    corners = np.asarray(instant_ngp._CORNERS)
    for n in range(pts.shape[0]):
        for level in range(L):
            scaled = pts[n] * res[level]
            floor, ceil = np.floor(scaled), np.ceil(scaled)
            expect = np.zeros(F, dtype=np.float64)
            for c in range(8):
                vert = floor + corners[c] * (ceil - floor)
                row = int(
                    np.asarray(
                        instant_ngp.spatial_hash(
                            jnp.asarray(vert[None].astype(np.int32)), T
                        )
                    )[0]
                )
                opposite = floor + (1.0 - corners[c]) * (ceil - floor)
                w = np.prod(np.abs(opposite - scaled))
                expect += w * tab_np[level, row]
            np.testing.assert_allclose(
                out[n, level * F : (level + 1) * F], expect, rtol=1e-4, atol=1e-6
            )


def test_packed_dual_encode_is_two_staggered_grids():
    """packed_dual == concat(base-grid packed encode, encode with scaled
    coords shifted by +0.5) — the half-voxel-staggered second grid."""
    L, logT, F = 2, 9, 4
    key = jax.random.PRNGKey(4)
    tables = instant_ngp.init_packed_hash_table(key, 2 * L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 8))
    res2, off2 = instant_ngp.dual_resolutions_offsets(res)
    pts = jnp.asarray(
        np.random.default_rng(13).uniform(-1.5, 1.5, (21, 3)), jnp.float32
    )

    out = np.asarray(
        instant_ngp.hash_encode_packed(tables, pts, res2, F, offsets=off2)
    )
    base = np.asarray(instant_ngp.hash_encode_packed(tables[:L], pts, res, F))
    # the staggered grid == the base machinery queried at p + 0.5/res
    shifted_pts = pts[:, None, :] + 0.5 / jnp.asarray(res)[None, :, None]
    stag = np.stack(
        [
            np.asarray(
                instant_ngp.hash_encode_packed(
                    tables[L + l : L + l + 1],
                    shifted_pts[:, l],
                    res[l : l + 1],
                    F,
                )
            )
            for l in range(L)
        ],
        axis=1,
    ).reshape(pts.shape[0], L * F)
    np.testing.assert_allclose(out[:, : L * F], base, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, L * F : 2 * L * F], stag, rtol=1e-4, atol=1e-5)


def test_packed_dual_field_trains():
    """Dual layout: 2L pseudo-level tables, grads flow, shapes match."""
    field = make_instant_ngp_field(
        num_level=4, log_max_entry_per_level=8, min_res=4, max_res=32,
        table_layout="packed_dual",
    )
    params = field.init(jax.random.PRNGKey(0))
    assert params["tables"].shape == (8, 4, 128)
    # fc_in consumes the 2x-wide dual encoding
    assert params["density_mlp"]["fc_in"]["w"].shape[0] == 2 * 4 * 2

    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 4, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4, 3)), jnp.float32)
    sigma, rgb = field.apply(params, pts, dirs)
    assert sigma.shape == (8, 4)
    assert rgb.shape == (8, 4, 3)

    def loss(p):
        s, r = field.apply(p, pts, dirs)
        return jnp.mean(r) + 1e-3 * jnp.mean(s)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["tables"])
    assert np.all(np.isfinite(g))
    # both the base grids (pseudo-levels [0, L)) and the staggered grids
    # ([L, 2L)) must receive gradient
    assert np.any(g[:4] != 0) and np.any(g[4:] != 0)


def test_encode_smoothness_loss_detects_face_jumps():
    """Face-probe consistency loss: zero for a globally-constant packed
    field, positive with gradient flow for a random one."""
    from torch_nerf_tpu.fields_ngp import make_encode_smoothness_loss

    L, logT, F = 2, 9, 4
    key = jax.random.PRNGKey(0)
    loss_fn = make_encode_smoothness_loss(
        L, min_res=4, max_res=8, table_feat_dim=F, table_layout="packed",
        num_probes=64,
    )

    rand_tables = instant_ngp.init_packed_hash_table(key, L, logT, F)
    params = {"tables": rand_tables * 1e4}  # amplify init so jumps dominate
    loss = float(loss_fn(params, jax.random.PRNGKey(1)))
    assert np.isfinite(loss) and loss > 0

    g = jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(1)))(params)
    g = np.asarray(g["tables"])
    assert np.any(g != 0) and np.all(np.isfinite(g))

    # constant field: every corner slot of every row holds the same value
    # per feature channel -> encode is constant everywhere -> no jumps
    const = jnp.ones_like(rand_tables)
    loss_const = float(loss_fn({"tables": const}, jax.random.PRNGKey(1)))
    assert loss_const < 1e-10

    # dual layout variant constructs without error and is positive too
    dual_fn = make_encode_smoothness_loss(
        L, min_res=4, max_res=8, table_feat_dim=F, table_layout="packed_dual",
        num_probes=64,
    )
    dual_tables = instant_ngp.init_packed_hash_table(key, 2 * L, logT, F)
    dual_loss = float(dual_fn({"tables": dual_tables * 1e4}, jax.random.PRNGKey(1)))
    assert np.isfinite(dual_loss) and dual_loss > 0


def test_corner_kernel_interpret_matches_hash_encode():
    """Interpret-mode per-corner Pallas encode (fwd + table grad) == the XLA
    reference-parity ``hash_encode`` path: same (L, T, F) parameters, same
    per-corner spatial hash, same trilinear weights. N deliberately not a
    multiple of the kernel tile to exercise padding."""
    L, logT, F = 2, 9, 2
    key = jax.random.PRNGKey(3)
    tables = instant_ngp.init_hash_table(key, L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 16))
    pts = jnp.asarray(
        np.random.default_rng(9).uniform(-1.5, 1.5, (77, 3)), jnp.float32
    )
    # include integral scaled coords (all-zero-weight quirk) in the batch
    pts = pts.at[5].set(jnp.asarray([0.25, -0.5, 1.0]))

    def loss_kernel(t):
        out = instant_ngp.hash_encode_corner128(t, pts, res, interpret=True)
        return jnp.sum(out**2), out

    def loss_xla(t):
        out = instant_ngp.hash_encode(t, pts, res)
        return jnp.sum(out**2), out

    (_, out_k), g_k = jax.value_and_grad(loss_kernel, has_aux=True)(tables)
    (_, out_x), g_x = jax.value_and_grad(loss_xla, has_aux=True)(tables)
    np.testing.assert_allclose(
        np.asarray(out_k[:, : L * F]), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )
    # lanes beyond L*F are zero
    assert float(jnp.max(jnp.abs(out_k[:, L * F :]))) == 0.0
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), rtol=1e-5, atol=1e-6)


def test_brick_kernel_interpret_matches_xla_path():
    """Interpret-mode brick Pallas encode (fwd + table grad) == the XLA
    fallback path; N not a multiple of the kernel tile."""
    L, logT, F = 3, 11, 2
    key = jax.random.PRNGKey(4)
    tables = instant_ngp.init_bricked_hash_table(key, L, logT, F)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 16))
    pts = jnp.asarray(
        np.random.default_rng(11).uniform(-1.5, 1.5, (99, 3)), jnp.float32
    )
    pts = pts.at[7].set(jnp.asarray([0.25, -0.5, 1.0]))  # integral scaled coords

    def loss(t, interpret):
        out = instant_ngp.hash_encode_bricked128(t, pts, res, F, interpret=interpret)
        return jnp.sum(out**2), out

    (_, out_k), g_k = jax.value_and_grad(loss, has_aux=True)(tables, True)
    (_, out_x), g_x = jax.value_and_grad(loss, has_aux=True)(tables, False)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), rtol=1e-5, atol=1e-6)
    assert float(jnp.max(jnp.abs(out_x))) > 0.0


def test_brick_encoding_shares_sites_across_interior_faces():
    """The design property packed lacks: across a voxel face INTERIOR to a
    brick (face coordinate != 0 mod 3) the two adjacent voxels read the same
    site rows, so the encoding is continuous; packed is discontinuous at
    every face. Stride faces (coordinate = 0 mod 3) may jump."""
    L, logT, F = 1, 11, 2
    tables = instant_ngp.init_bricked_hash_table(jax.random.PRNGKey(0), L, logT, F)
    res = jnp.asarray([8.0])
    eps = 1e-4
    # face x = 1/8 (scaled coordinate 1: 1 % 3 != 0 -> interior)
    lo = jnp.asarray([[1.0 / 8.0 - eps, 0.3, 0.22]])
    hi = jnp.asarray([[1.0 / 8.0 + eps, 0.3, 0.22]])
    e_lo = instant_ngp.hash_encode_bricked128(tables, lo, res, F)
    e_hi = instant_ngp.hash_encode_bricked128(tables, hi, res, F)
    jump_interior = float(jnp.max(jnp.abs(e_lo - e_hi)))
    assert jump_interior < 1e-6, jump_interior


def test_bricked_field_trains():
    """End-to-end: the bricked instant-NGP field fits a toy batch."""
    import optax

    field = make_instant_ngp_field(
        num_level=2, log_max_entry_per_level=10, table_feat_dim=2,
        min_res=4, max_res=8, table_layout="bricked",
    )
    params = field.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), jnp.float32, -1.0, 1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (256, 3))
    sigma_t = jnp.abs(pts[:, 0]) * 2.0
    rgb_t = (pts + 1.0) / 2.0

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            sigma, rgb = field.apply(p, pts, dirs)
            return jnp.mean((sigma - sigma_t) ** 2) + jnp.mean((rgb - rgb_t) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_corner_and_brick_kernels_odd_level_count():
    """Group-reassembly edge case: L not a power of two (group=min(8,L))
    exercises the per-group block layout in both kernels' backwards."""
    pts = jnp.asarray(np.random.default_rng(2).uniform(-1.2, 1.2, (65, 3)), jnp.float32)

    # per-corner kernel, L=3 F=4 (fold=32)
    L = 3
    tables = instant_ngp.init_hash_table(jax.random.PRNGKey(0), L, 9, 4)
    res = jnp.asarray(instant_ngp.level_resolutions(L, 4, 16))

    def loss_k(t):
        return jnp.sum(instant_ngp.hash_encode_corner128(t, pts, res, interpret=True) ** 2)

    def loss_x(t):
        return jnp.sum(instant_ngp.hash_encode(t, pts, res) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_k)(tables)), np.asarray(jax.grad(loss_x)(tables)),
        rtol=1e-5, atol=1e-6,
    )

    # brick kernel, L=5
    L = 5
    btables = instant_ngp.init_bricked_hash_table(jax.random.PRNGKey(1), L, 11, 2)
    bres = jnp.asarray(instant_ngp.level_resolutions(L, 4, 32))

    def bloss(t, interp):
        return jnp.sum(instant_ngp.hash_encode_bricked128(t, pts, bres, 2, interpret=interp) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(lambda t: bloss(t, True))(btables)),
        np.asarray(jax.grad(lambda t: bloss(t, False))(btables)),
        rtol=1e-5, atol=1e-6,
    )
