"""Force the Pallas CPB kernels' row-block and lane-split paths in interpret mode
(the defaults only trigger at 4k-bag scale on real hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sml_tpu.ops.pallas.deform_attn as da


@pytest.fixture()
def tiny_limits(monkeypatch):
    # thresholds chosen so h=16/w=8 shapes pick n_rb>1 and wsplit>1
    # (h must be a multiple of 8: row blocks now honor Mosaic's sublane rule —
    # block height % 8 == 0 or == h — so forced blocking needs an 8-row block)
    monkeypatch.setattr(da, "_MAX_ROWBLOCK_BYTES", 8 * 4 * 6 * 4 // 2)
    monkeypatch.setattr(da, "_MAX_CHUNK_LANES", 16)
    yield


def _data():
    rng = np.random.default_rng(0)
    bg, dm, hgt, wid, j = 3, 16, 16, 8, 4
    u4 = rng.normal(size=(bg, wid, dm, j)).astype(np.float32)
    u = np.ascontiguousarray(u4.transpose(0, 2, 1, 3)).reshape(bg, dm, wid * j)
    v = rng.normal(size=(bg, hgt, dm, j)).astype(np.float32)
    w1 = rng.normal(size=(dm, dm)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(dm,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(dm, 1)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(1,)).astype(np.float32) * 0.1
    return [jnp.asarray(x) for x in (u, v, w1, b1, w2, b2)]


def test_forced_chunking_matches_unchunked(tiny_limits):
    args = _data()
    assert da._pick_rowblocks(16, 32) > 1
    assert da._pick_wsplit(8, 4, 16, 0, 4) > 1
    chunked = np.asarray(da.fused_cpb_bias(*args, interpret=True))

    # reference: dense MLP in numpy
    u, v, w1, b1, w2, b2 = [np.asarray(a) for a in args]
    bg, dm, wj = u.shape
    _, h, _, j = v.shape
    w = wj // j
    u4 = u.reshape(bg, dm, w, j)
    expect = np.zeros((bg, h, wj), np.float32)
    for b in range(bg):
        for iy in range(h):
            for ix in range(w):
                h1 = np.maximum(u4[b, :, ix, :] + v[b, iy], 0)
                h2 = np.maximum(w1.T @ h1 + b1[:, None], 0)
                expect[b, iy, ix * j:(ix + 1) * j] = w2[:, 0] @ h2 + b2[0]
    np.testing.assert_allclose(chunked, expect, rtol=1e-4, atol=1e-5)


def test_forced_chunking_grads_match(tiny_limits):
    args = _data()
    cot = jnp.asarray(np.random.default_rng(1).normal(size=(3, 16, 32))
                      .astype(np.float32))

    def loss(*a):
        return jnp.sum(da.cpb_bias_trainable(*a, True) * cot)

    grads_chunked = jax.grad(loss, argnums=tuple(range(6)))(*args)

    # unchunked grads: numerical reference via the plain-jnp formulation
    def jnp_bias(u, v, w1, b1, w2, b2):
        bg, dm, wj = u.shape
        _, h, _, j = v.shape
        w = wj // j
        u4 = u.reshape(bg, dm, w, j)
        rows = []
        for iy in range(h):
            h1 = jnp.maximum(u4 + v[:, iy][:, :, None, :], 0)     # (bg, dm, w, j)
            z2 = jnp.einsum("cd,bcwj->bdwj", w1, h1) + b1[None, :, None, None]
            h2 = jnp.maximum(z2, 0)
            bias = jnp.einsum("c,bcwj->bwj", w2[:, 0], h2) + b2[0]
            rows.append(bias.reshape(bg, wj))
        return jnp.stack(rows, axis=1)

    def loss_ref(*a):
        return jnp.sum(jnp_bias(*a) * cot)

    grads_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for gc, gr in zip(grads_chunked, grads_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), rtol=1e-3,
                                   atol=1e-4)
