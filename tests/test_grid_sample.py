"""Exact-parity tests for grid_sample vs torch (the #1 ranked hard part in SURVEY.md §7)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sml_tpu.ops.grid_sample import grid_sample_1d, grid_sample_2d  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("shape", [(2, 5, 7, 3), (1, 50, 50, 16), (8, 12, 12, 4)])
def test_grid_sample_2d_matches_torch(align_corners, shape):
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    gh, gw = 6, 9
    img = rng.normal(size=(n, h, w, c)).astype(np.float32)
    # include far out-of-bounds coords to exercise zero padding
    grid = rng.uniform(-1.8, 1.8, size=(n, gh, gw, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                     align_corners=align_corners))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid), mode="bilinear",
                        padding_mode="zeros", align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_exact_corners(align_corners):
    """Integer-coordinate probes: sampled value must equal the exact pixel."""
    h = w = 4
    img = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    # normalized coords of pixel centers
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    if align_corners:
        gx = 2 * xs / (w - 1) - 1
        gy = 2 * ys / (h - 1) - 1
    else:
        gx = (2 * xs + 1) / w - 1
        gy = (2 * ys + 1) / h - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                    align_corners=align_corners))
    np.testing.assert_allclose(out[0, :, :, 0], img[0, :, :, 0], atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_1d_matches_torch_lift(align_corners):
    """Our direct 1-D sampler vs a CORRECT 2-D lift through torch grid_sample.

    Note: the reference's own lift (models/DeformableAttention1D.py:36-43, inherited
    from lucidrains/deformable-attention) appends the coordinate on the width-1 axis
    (pads the grid with y=0 AFTER the coordinate), which samples the *middle* of the
    sequence scaled by a triangle weight — a latent bug in the (default-inactive)
    attn_dim=1 path.  We implement the intended semantics: coordinate indexes the
    sequence axis; the oracle lift below puts the coordinate in y accordingly.
    """
    rng = np.random.default_rng(1)
    n, l, c, p = 3, 17, 5, 29
    feats = rng.normal(size=(n, l, c)).astype(np.float32)
    grid = rng.uniform(-1.5, 1.5, size=(n, p)).astype(np.float32)

    ours = np.asarray(grid_sample_1d(jnp.asarray(feats), jnp.asarray(grid),
                                     align_corners=align_corners))

    t_feats = torch.from_numpy(feats).permute(0, 2, 1).unsqueeze(-1)  # (n, c, l, 1)
    t_grid = torch.from_numpy(grid)[..., None, None]                   # (n, p, 1, 1)
    t_grid = torch.nn.functional.pad(t_grid, (1, 0), value=0.0)        # prepend x=0
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=align_corners)
    ref = ref[..., 0].permute(0, 2, 1).numpy()                         # (n, p, c)
    if not align_corners:
        # x=0 on the width-1 axis lands exactly on the single column either way,
        # but with align_corners=False the x weight is exactly 1.0 only at ix=0.0:
        # ((0+1)*1-1)/2 == 0, so no correction needed.
        pass
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_gradients_flow():
    import jax

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 3, 3, 2)).astype(np.float32))

    g_img, g_grid = jax.grad(
        lambda im, gr: grid_sample_2d(im, gr).sum(), argnums=(0, 1))(img, grid)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_grid)).all()
    assert np.abs(np.asarray(g_grid)).sum() > 0


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("shape", [(2, 5, 7, 3), (1, 50, 50, 16), (8, 12, 12, 4)])
def test_grid_sample_2d_matmul_matches_gather(align_corners, shape):
    """The production one-hot-matmul form == the gather form, fwd AND both grads.

    The matmul form is what the deformable branch runs (MXU backward instead of
    the AD scatter-add); the gather form is the torch-oracle-pinned semantics.
    Out-of-range coords exercise the implicit zeros padding of the one-hots.
    """
    import jax

    from sml_tpu.ops.grid_sample import grid_sample_2d_matmul

    rng = np.random.default_rng(3)
    n, h, w, c = shape
    gh, gw = 6, 9
    img = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.8, 1.8, size=(n, gh, gw, 2)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(n, gh, gw, c)).astype(np.float32))

    f_gather = lambda i, g: grid_sample_2d(i, g, align_corners=align_corners)
    f_matmul = lambda i, g: grid_sample_2d_matmul(i, g, align_corners=align_corners)

    np.testing.assert_allclose(np.asarray(f_matmul(img, grid)),
                               np.asarray(f_gather(img, grid)),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda i, g: jnp.vdot(f_gather(i, g), ct), argnums=(0, 1))(img, grid)
    g2 = jax.grad(lambda i, g: jnp.vdot(f_matmul(i, g), ct), argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               rtol=1e-4, atol=1e-4)
