"""Force the Pallas CPB kernels' row-block and lane-chunk GRID paths in interpret
mode (the defaults only trigger at 4k-bag scale on real hardware).

Round 3: the lane chunk is a grid dimension; chunked lane blocks must be %128
(Mosaic) — so the forced shapes use J=128.  Round 5: the kernels take the thin
signed-log displacement tables dx/dy plus the layer-1 weights and build the u/v
factor tiles in VMEM, so the tests drive that API.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sml_tpu.ops.pallas.deform_attn as da

BG, DM, H, W, J = 3, 16, 16, 8, 128


@pytest.fixture()
def tiny_limits(monkeypatch):
    # lane cap 512 forces wsplit=2 (cwj = 4*128 = 512, %128-legal);
    # row-block cap 16KB forces h_rb=8 (8*512*4) -> n_rb=2
    monkeypatch.setattr(da, "_MAX_CHUNK_LANES", 512)
    monkeypatch.setattr(da, "_MAX_ROWBLOCK_BYTES", 16 * 1024)
    yield


def _data():
    rng = np.random.default_rng(0)
    dx4 = rng.normal(size=(BG, W, J)).astype(np.float32)
    dx = dx4.reshape(BG, W * J)                       # lane order w*J + j
    dy = rng.normal(size=(BG, H, J)).astype(np.float32)
    w0x = rng.normal(size=(DM,)).astype(np.float32) * 0.3
    w0y = rng.normal(size=(DM,)).astype(np.float32) * 0.3
    b0 = rng.normal(size=(DM,)).astype(np.float32) * 0.1
    w1 = rng.normal(size=(DM, DM)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(DM,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(DM, 1)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(1,)).astype(np.float32) * 0.1
    return [jnp.asarray(x) for x in (dx, dy, w0x, w0y, b0, w1, b1, w2, b2)]


def test_forced_chunking_matches_unchunked(tiny_limits):
    args = _data()
    assert da._pick_tiling(DM, W, H, J, 4, bwd=False) == (2, 2)
    assert da._pick_tiling(DM, W, H, J, 4, bwd=True) == (2, 2)
    chunked = np.asarray(da.fused_cpb_bias(*args, interpret=True))

    # reference: dense MLP in numpy over the rebuilt factor tables
    dx, dy, w0x, w0y, b0, w1, b1, w2, b2 = [np.asarray(a) for a in args]
    dx4 = dx.reshape(BG, W, J)
    u4 = w0x[None, :, None, None] * dx4[:, None, :, :]        # (BG, DM, W, J)
    v = w0y[None, None, :, None] * dy[:, :, None, :] \
        + b0[None, None, :, None]                             # (BG, H, DM, J)
    expect = np.zeros((BG, H, W * J), np.float32)
    for b in range(BG):
        for iy in range(H):
            for ix in range(W):
                h1 = np.maximum(u4[b, :, ix, :] + v[b, iy], 0)
                h2 = np.maximum(w1.T @ h1 + b1[:, None], 0)
                expect[b, iy, ix * J:(ix + 1) * J] = w2[:, 0] @ h2 + b2[0]
    np.testing.assert_allclose(chunked, expect, rtol=1e-4, atol=1e-5)


def _jnp_bias(dx, dy, w0x, w0y, b0, w1, b1, w2, b2):
    """Plain-jnp reference of the whole fused computation (incl. layer 1)."""
    bg, wj = dx.shape
    _, h, j = dy.shape
    w = wj // j
    dm = w1.shape[0]
    u4 = w0x[None, :, None, None] * dx.reshape(bg, 1, w, j)   # (bg, dm, w, j)
    v = w0y[None, None, :, None] * dy[:, :, None, :] \
        + b0[None, None, :, None]                             # (bg, h, dm, j)
    rows = []
    for iy in range(h):
        h1 = jnp.maximum(u4 + v[:, iy][:, :, None, :], 0)     # (bg, dm, w, j)
        z2 = jnp.einsum("cd,bcwj->bdwj", w1, h1) + b1[None, :, None, None]
        h2 = jnp.maximum(z2, 0)
        bias = jnp.einsum("c,bcwj->bwj", w2[:, 0], h2) + b2[0]
        rows.append(bias.reshape(bg, wj))
    return jnp.stack(rows, axis=1)


def test_forced_chunking_grads_match(tiny_limits):
    args = _data()
    cot = jnp.asarray(np.random.default_rng(1).normal(size=(BG, H, W * J))
                      .astype(np.float32))

    def loss(*a):
        return jnp.sum(da.cpb_bias_trainable(*a, True) * cot)

    grads_chunked = jax.grad(loss, argnums=tuple(range(9)))(*args)

    def loss_ref(*a):
        return jnp.sum(_jnp_bias(*a) * cot)

    grads_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ("dx", "dy", "w0x", "w0y", "b0", "w1", "b1", "w2", "b2")
    for name, gc, gr in zip(names, grads_chunked, grads_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_16k_shape_now_tiles():
    """The 16k-bag shape (W=128, J=1024) has a legal streamed tiling (the lane
    axis streams per chunk; the factor tiles are built in VMEM)."""
    assert da.pallas_cpb_supported(32, 128, 128, 1024)
    s, nb = da._pick_tiling(32, 128, 128, 1024, 2, bwd=True)
    assert s > 1  # genuinely chunked
    cwj = (128 // s) * 1024
    assert cwj <= da._MAX_CHUNK_LANES and cwj % 128 == 0
