"""Loss oracles: weighted CE vs torch, NLL-surv vs independent numpy, cox, batchloss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.train import losses


def test_weighted_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(16,))
    w = np.array([1.0, 4.15, 2.93, 2.43], np.float32)

    ours = float(losses.weighted_cross_entropy(jnp.asarray(logits),
                                               jnp.asarray(labels), w))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    assert abs(ours - ref) < 1e-5

    ours_unw = float(losses.weighted_cross_entropy(jnp.asarray(logits),
                                                   jnp.asarray(labels)))
    ref_unw = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits),
                                          torch.from_numpy(labels)).item()
    assert abs(ours_unw - ref_unw) < 1e-5


def test_nll_surv_matches_hand_computation():
    """Independent per-sample numpy evaluation of the discrete-hazard NLL."""
    rng = np.random.default_rng(1)
    b, k = 6, 4
    hazards = rng.uniform(0.05, 0.95, size=(b, k)).astype(np.float32)
    s = np.cumprod(1 - hazards, axis=1)
    y = rng.integers(0, k, size=(b,))
    c = rng.integers(0, 2, size=(b,)).astype(np.float32)
    alpha, eps = 0.15, 1e-7

    expected = []
    for i in range(b):
        s_pad = np.concatenate([[1.0], s[i]])
        unc = -(1 - c[i]) * (np.log(max(s_pad[y[i]], eps))
                             + np.log(max(hazards[i, y[i]], eps)))
        cen = -c[i] * np.log(max(s_pad[y[i] + 1], eps))
        expected.append((1 - alpha) * (cen + unc) + alpha * unc)
    expected = np.mean(expected)

    ours = float(losses.nll_surv_loss(jnp.asarray(hazards), jnp.asarray(s),
                                      jnp.asarray(y), jnp.asarray(c), alpha=alpha))
    assert abs(ours - expected) < 1e-5


def test_nll_surv_computes_s_when_none():
    rng = np.random.default_rng(2)
    hazards = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(4,)))
    c = jnp.asarray(rng.integers(0, 2, size=(4,)).astype(np.float32))
    a = losses.nll_surv_loss(hazards, None, y, c, alpha=0.0)
    b = losses.nll_surv_loss(hazards, jnp.cumprod(1 - hazards, axis=1), y, c, alpha=0.0)
    assert abs(float(a) - float(b)) < 1e-6


def test_cox_loss_matches_numpy():
    rng = np.random.default_rng(3)
    b = 8
    survtime = rng.uniform(10, 1000, size=(b,)).astype(np.float32)
    censor = rng.integers(0, 2, size=(b,)).astype(np.float32)
    hazard = rng.normal(size=(b,)).astype(np.float32)

    r = (survtime[None, :] >= survtime[:, None]).astype(np.float32)
    theta = hazard
    expected = -np.mean((theta - np.log((np.exp(theta) * r).sum(1))) * censor)
    ours = float(losses.cox_loss(jnp.asarray(survtime), jnp.asarray(censor),
                                 jnp.asarray(hazard)))
    assert abs(ours - expected) < 1e-5


def test_batch_similarity_loss_zero_for_matching_structure():
    """Identical samples -> both similarity matrices are the same normalized ones-matrix."""
    n, f, g = 8, 16, 4
    omic = jnp.ones((n, f))
    vgrid = jnp.ones((n, g, 2, 3, 3))
    loss = float(losses.batch_similarity_loss(omic, vgrid))
    assert abs(loss) < 1e-9


def test_batch_similarity_loss_scale_invariance():
    """Row-normalization makes the loss invariant to broadcasting the omic vector
    (justifies passing (B,F) instead of the reference's (B,N,F) broadcast)."""
    rng = np.random.default_rng(4)
    n, f, g = 8, 16, 8
    omic = rng.normal(size=(n, f)).astype(np.float32)
    vgrid = jnp.asarray(rng.normal(size=(n, g, 2, 3, 3)).astype(np.float32))

    l1 = float(losses.batch_similarity_loss(jnp.asarray(omic), vgrid))
    broadcast = np.repeat(omic[:, None, :], 25, axis=1).reshape(n, -1)
    l2 = float(losses.batch_similarity_loss(jnp.asarray(broadcast), vgrid))
    assert abs(l1 - l2) < 1e-4 * max(abs(l1), 1)


def test_batch_similarity_reference_layout_allvalid_mask_is_unmasked():
    """Eval attaches an all-valid sample_mask to every batch; the reference
    layout must accept it and reduce to the verbatim unmasked arithmetic
    (it used to raise on ANY mask, killing evaluation under the knob)."""
    rng = np.random.default_rng(5)
    n, f, g = 8, 16, 8
    omic = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    vgrid = jnp.asarray(rng.normal(size=(n, g, 2, 3, 3)).astype(np.float32))

    base = float(losses.batch_similarity_loss(omic, vgrid, layout="reference"))
    masked = float(losses.batch_similarity_loss(
        omic, vgrid, sample_mask=jnp.ones((n,), bool), layout="reference"))
    assert abs(base - masked) < 1e-5 * max(abs(base), 1)


def test_batch_similarity_reference_layout_pad_content_invariance():
    """With a padded sample_mask, the masked reference layout must not depend
    on the CONTENT of the padded rows (the eval contract: wrap-padded tail
    rows contribute nothing)."""
    rng = np.random.default_rng(6)
    n, nv, f, g = 8, 6, 16, 8
    omic = rng.normal(size=(n, f)).astype(np.float32)
    vgrid = rng.normal(size=(n, g, 2, 3, 3)).astype(np.float32)
    mask = np.zeros((n,), bool)
    mask[:nv] = True

    l1 = float(losses.batch_similarity_loss(
        jnp.asarray(omic), jnp.asarray(vgrid), sample_mask=jnp.asarray(mask),
        layout="reference"))
    omic2, vgrid2 = omic.copy(), vgrid.copy()
    omic2[nv:] = rng.normal(size=(n - nv, f))
    vgrid2[nv:] = rng.normal(size=(n - nv, g, 2, 3, 3))
    l2 = float(losses.batch_similarity_loss(
        jnp.asarray(omic2), jnp.asarray(vgrid2), sample_mask=jnp.asarray(mask),
        layout="reference"))
    assert np.isfinite(l1)
    assert abs(l1 - l2) < 1e-5 * max(abs(l1), 1)


def test_batch_similarity_reference_layout_rejects_non8_groups():
    omic = jnp.ones((4, 8))
    vgrid = jnp.ones((4, 4, 2, 3, 3))
    with pytest.raises(ValueError, match="offset_groups"):
        losses.batch_similarity_loss(omic, vgrid, layout="reference")


def test_orthogonal_and_kl_and_cosine():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    q = rng.normal(size=(4, 8)).astype(np.float32)

    ours_kl = float(losses.kl_loss(jnp.asarray(p), jnp.asarray(q)))
    ref_kl = F.kl_div(torch.from_numpy(q).softmax(-1).log(),
                      torch.from_numpy(p).softmax(-1), reduction="sum").item()
    assert abs(ours_kl - ref_kl) < 1e-4

    ours_cos = np.asarray(losses.cosine_loss(jnp.asarray(p), jnp.asarray(q)))
    ref_cos = (1 - F.cosine_similarity(torch.from_numpy(p), torch.from_numpy(q),
                                       dim=1)).numpy()
    np.testing.assert_allclose(ours_cos, ref_cos, rtol=1e-4, atol=1e-5)

    o = np.asarray(losses.orthogonal_loss(jnp.asarray(p), jnp.asarray(q),
                                          jnp.asarray(q), jnp.asarray(p)))
    assert np.isfinite(o).all()
