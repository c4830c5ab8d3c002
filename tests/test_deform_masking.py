"""Masked deformable attention + bucketed flagship (SURVEY §7 hard-part 7).

Masked semantics: padded tokens behave exactly like the zeros padding outside the
image that the reference's grid_sample already produces
(``models/DeformableAttention2D.py:268-271``), and never contribute to pooling.
Provable properties: (1) outputs are invariant to garbage in padded slots,
(2) an all-ones mask equals the no-mask path, (3) non-square bags pad internally.
"""

import numpy as np

import jax
import jax.numpy as jnp

from sml_tpu.models.deform import DeformPathomicNet


def _model(**kw):
    defaults = dict(label_dim=4, dropout_rate=0.1, attn_dim=2, return_vgrid=True)
    defaults.update(kw)
    return DeformPathomicNet(**defaults)


def _inputs(rng, b, n):
    return (rng.normal(size=(b, n, 1024)).astype(np.float32),
            rng.normal(size=(b, 59)).astype(np.float32),
            rng.normal(size=(b, 361)).astype(np.float32))


def _init(model, x_path, x_t, x_i, mask=None):
    return model.init({"params": jax.random.PRNGKey(0)},
                      jnp.asarray(x_path), jnp.asarray(x_t), jnp.asarray(x_i),
                      deterministic=True,
                      mask=None if mask is None else jnp.asarray(mask))


OUT_KEYS = ("logits", "logits_tumor", "logits_immune", "features",
            "vgrid_tumor", "vgrid_immune", "omic_tumor")


def test_deform_mask_garbage_invariance():
    """Perturbing padded patches must not change any output consumed downstream."""
    rng = np.random.default_rng(0)
    b, n_real, n = 2, 40, 64
    x_path, x_t, x_i = _inputs(rng, b, n)
    mask = np.zeros((b, n), bool)
    mask[:, :n_real] = True

    model = _model()
    variables = _init(model, x_path, x_t, x_i, mask)

    out_zero = model.apply(variables, jnp.asarray(x_path * mask[..., None]),
                           jnp.asarray(x_t), jnp.asarray(x_i),
                           deterministic=True, mask=jnp.asarray(mask))
    garbage = x_path.copy()
    garbage[:, n_real:] = 1e3 * rng.normal(size=(b, n - n_real, 1024))
    out_garb = model.apply(variables, jnp.asarray(garbage),
                           jnp.asarray(x_t), jnp.asarray(x_i),
                           deterministic=True, mask=jnp.asarray(mask))
    for k in OUT_KEYS:
        np.testing.assert_allclose(np.asarray(out_zero[k]), np.asarray(out_garb[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_deform_full_mask_equals_nomask():
    rng = np.random.default_rng(1)
    b, n = 2, 64
    x_path, x_t, x_i = _inputs(rng, b, n)
    model = _model()
    variables = _init(model, x_path, x_t, x_i)

    out_nm = model.apply(variables, jnp.asarray(x_path), jnp.asarray(x_t),
                         jnp.asarray(x_i), deterministic=True)
    out_fm = model.apply(variables, jnp.asarray(x_path), jnp.asarray(x_t),
                         jnp.asarray(x_i), deterministic=True,
                         mask=jnp.ones((b, n), bool))
    for k in OUT_KEYS:
        np.testing.assert_allclose(np.asarray(out_nm[k]), np.asarray(out_fm[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_deform_nonsquare_internal_padding_equals_external():
    """A 60-token bag (non-square) must equal the same bag explicitly padded to 64
    with a mask — the internal pad-to-next-square path."""
    rng = np.random.default_rng(2)
    b, n_real, n = 2, 60, 64
    x_path, x_t, x_i = _inputs(rng, b, n_real)
    model = _model()
    variables = _init(model, x_path, x_t, x_i)

    out_int = model.apply(variables, jnp.asarray(x_path), jnp.asarray(x_t),
                          jnp.asarray(x_i), deterministic=True)

    padded = np.zeros((b, n, 1024), np.float32)
    padded[:, :n_real] = x_path
    mask = np.zeros((b, n), bool)
    mask[:, :n_real] = True
    out_ext = model.apply(variables, jnp.asarray(padded), jnp.asarray(x_t),
                          jnp.asarray(x_i), deterministic=True,
                          mask=jnp.asarray(mask))
    for k in OUT_KEYS:
        np.testing.assert_allclose(np.asarray(out_int[k]), np.asarray(out_ext[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_deform_mask_1d_garbage_invariance():
    rng = np.random.default_rng(3)
    b, n_real, n = 2, 40, 64
    x_path, x_t, x_i = _inputs(rng, b, n)
    mask = np.zeros((b, n), bool)
    mask[:, :n_real] = True

    model = _model(attn_dim=1, return_vgrid=False)
    variables = _init(model, x_path, x_t, x_i, mask)

    out_zero = model.apply(variables, jnp.asarray(x_path * mask[..., None]),
                           jnp.asarray(x_t), jnp.asarray(x_i),
                           deterministic=True, mask=jnp.asarray(mask))
    garbage = x_path.copy()
    garbage[:, n_real:] = 1e3 * rng.normal(size=(b, n - n_real, 1024))
    out_garb = model.apply(variables, jnp.asarray(garbage), jnp.asarray(x_t),
                           jnp.asarray(x_i), deterministic=True,
                           mask=jnp.asarray(mask))
    for k in ("logits", "logits_tumor", "features"):
        np.testing.assert_allclose(np.asarray(out_zero[k]), np.asarray(out_garb[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_deformpathomic_trains_on_mixed_size_bags():
    """End-to-end: variable-size synthetic bags bucketed to fixdim with masks,
    flagship mode, masked train steps produce finite decreasing loss."""
    import jax as _jax

    from sml_tpu.config import Config
    from sml_tpu.data.loader import Loader, build_datasets
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_train_step

    config = Config(mode="deformpathomic", dataset="synthetic", synthetic_size=16,
                    fixdim=60, batch_size=4, variable_bags=True,
                    task_type="diag2021", gradient_modulate=True, return_vgrid=True,
                    num_devices=1)
    ds = build_datasets(config, "Train")
    loader = Loader(ds, config.batch_size, shuffle=True, drop_last=True)
    batches = list(loader)
    assert all("mask" in b for b in batches)
    sizes = np.concatenate([b["mask"].sum(axis=1) for b in batches])
    assert sizes.min() < sizes.max(), "bags should vary in size"

    model = define_net(config)
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items() if k != "sample_mask"}
    variables = init_model(config, model, _jax.random.PRNGKey(0), b0)
    tx = define_optimizer(config, steps_per_epoch=len(batches))
    state = TrainState.create(variables, tx, _jax.random.PRNGKey(1))
    step = make_train_step(config, model, tx)

    losses = []
    for epoch in range(3):
        for batch in batches:
            dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_mask"}
            state, metrics = step(state, dev)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), "loss should decrease"
