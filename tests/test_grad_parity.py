"""Gradient parity vs the torch reference's train-step arithmetic.

Forward parity (test_reference_parity.py) proves the models are the same; these
tests prove the BACKWARD semantics match: transplanted weights, identical batch,
dropout off, then the reference's full train-step loss (task loss + BatchLoss
subspace similarity, ``train_test.py:52-85``) is backpropped in torch and every
parameter gradient is compared against ``compute_mode_loss``-based jax grads at
1e-4.  The gradient-modulation arithmetic (``train_test.py:87-184``: per-class
double-subtraction projection, survival C-index ratios) is then applied on both
sides and the post-modulation classifier gradients compared too.

The reference runs at hard-coded N=2500 (1-core torch backward there is minutes);
the deform tests use the shape-patched shadow reference (helpers/ref_patch.py)
at N=256 — same code path, tractable size.
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from measure_reference_baseline import _stub_modules  # noqa: E402

_stub_modules()

import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor

from helpers.ref_patch import load_patched_deform  # noqa: E402
from sml_tpu.config import Config  # noqa: E402
from sml_tpu.train import steps as steps_mod  # noqa: E402
from sml_tpu.train.metrics import cindex as np_cindex  # noqa: E402
from sml_tpu.utils.torch_compat import convert_reference_state_dict  # noqa: E402

N, GRID, B = 256, 16, 8
HS = 128  # mmhid
# NB: B must equal the 8 offset groups — the reference's ``vgrid.view(8, N, -1)``
# (utils/loss.py:23) only agrees with the per-group similarity our loss computes
# when batch == groups == 8 (see models/deform.py module docstring)


def ref_args(**over):
    base = dict(
        mode="deformpathomic", attn_dim=2, return_vgrid=True, return_grad="False",
        task_type="survival", label_dim=4, init_type="max", init_gain=0.02,
        fusion_type="concat", cut_fuse_grad=False, skip=0, use_bilinear=1,
        path_gate=1, omic_gate=1, path_dim=128, omic_dim=128, path_scale=1,
        omic_scale=1, mmhid=HS, dropout_rate=0.0, input_size_omic=431,
        input_size_omic_tumor=59, input_size_omic_immune=361, input_path_dim=1024,
        act_type="Sigmoid", batch_size=B, world_size=1, fixdim=N)
    base.update(over)
    return SimpleNamespace(**base)


def make_labels(task_type: str) -> np.ndarray:
    """(B, 12) label rows: slot 4 grade, 5 diag2021, 8 survival bin, 9 censor,
    11 survival time (mixed censorship so the in-step C-index is defined)."""
    lab = np.zeros((B, 12), np.float32)
    lab[:, 4] = [0, 1, 2, 1, 0, 2, 1, 0]
    lab[:, 5] = [0, 1, 2, 3, 1, 0, 3, 2]
    lab[:, 7] = [0, 1, 2, 0, 2, 1, 0, 1]
    lab[:, 8] = [0, 1, 2, 3, 1, 3, 0, 2]
    lab[:, 9] = [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    lab[:, 11] = [2.0, 5.0, 3.0, 7.0, 4.0, 9.0, 1.0, 6.0]
    return lab


def torch_task_loss(task_type, logits, label):
    """reference train_test.py:25-28,60-70 (train class weights; nll alpha=0)."""
    if task_type == "survival":
        from utils.utils import NLLSurvLoss

        hazards = logits  # deform model sigmoids in-model (model.py:534-537)
        s = torch.cumprod(1 - hazards, dim=1)
        return NLLSurvLoss(alpha=0.15)(hazards=hazards, S=s, Y=label[:, 8].long(),
                                       c=label[:, 9], alpha=0)
    w = torch.tensor([1.0, 4.15, 2.93, 2.43], dtype=torch.float32)
    return torch.nn.CrossEntropyLoss(weight=w)(logits, label[:, 5].long())


def torch_grads_as_tree(mode, ref, **conv_kw):
    """Route param .grads through the same state_dict converter as the weights —
    gradients share the weights' layout, so the converted tree lines up
    leaf-for-leaf with jax.grad's output."""
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    for name, p in ref.named_parameters():
        sd[name] = p.grad.clone() if p.grad is not None else torch.zeros_like(p)
    return convert_reference_state_dict(mode, sd, **conv_kw)["params"]


def assert_tree_close(mine, ref, rtol=1e-4, floor=1e-6, what=""):
    flat_m, tdef_m = jax.tree_util.tree_flatten(mine)
    flat_r, tdef_r = jax.tree_util.tree_flatten(ref)
    assert tdef_m == tdef_r, f"{what}: gradient tree structures differ"
    for i, (m, r) in enumerate(zip(flat_m, flat_r)):
        m, r = np.asarray(m), np.asarray(r)
        atol = max(floor, 1e-4 * float(np.abs(r).max()))
        np.testing.assert_allclose(m, r, rtol=rtol, atol=atol,
                                   err_msg=f"{what}: leaf {i} of {len(flat_m)}")


def reference_modulation(ref, feat_t, feat_i, label, task_type):
    """The reference's in-place classifier-grad modulation, verbatim arithmetic
    (train_test.py:87-184), on the un-wrapped (non-DDP) module.  The survival
    ratio uses sml_tpu's native C-index (proven sksurv-equivalent in
    tests/test_metrics.py) since sksurv isn't installed here."""
    W, b = ref.classifier.weight, ref.classifier.bias
    out_t = feat_t @ W[:, :HS].T + b / 2
    out_i = feat_i @ W[:, HS:].T + b / 2
    if task_type == "survival":
        s_t = torch.cumprod(1 - torch.sigmoid(out_t), dim=1)
        s_i = torch.cumprod(1 - torch.sigmoid(out_i), dim=1)
        risk_t = -torch.sum(s_t, dim=1)
        risk_i = -torch.sum(s_i, dim=1)
        censor, survtime = label[:, 9], label[:, 11]
        assert censor.float().mean() != 1
        c_t = np_cindex(risk_t.detach().numpy(), censor.numpy(), survtime.numpy())
        c_i = np_cindex(risk_i.detach().numpy(), censor.numpy(), survtime.numpy())
        ratio_t = c_t / c_i
    else:
        sm_t = torch.nn.functional.softmax(out_t, dim=1)
        sm_i = torch.nn.functional.softmax(out_i, dim=1)
        y = label[:, 5].long()
        score_t = sum(sm_t[i][y[i]] for i in range(out_t.size(0)))
        score_i = sum(sm_i[i][y[i]] for i in range(out_i.size(0)))
        ratio_t = score_t / score_i
    ratio_i = 1 / ratio_t

    modulated = 0
    for i_index, (grad_t, grad_i) in enumerate(
            zip(W.grad[:, :HS], W.grad[:, HS:])):
        sim = torch.dot(grad_t.flatten(), grad_i.flatten()) / (
            grad_t.norm() * grad_i.norm())
        if sim < 0:
            if ratio_t < 1:
                dot_product = torch.dot(grad_t.flatten(), grad_i.flatten())
                proj_component = dot_product / grad_i.norm() ** 2 * grad_i
                grad_t = grad_t - proj_component
                perpen = grad_t - proj_component
                grad_t = grad_t.norm() * perpen / perpen.norm()
                W.grad[i_index, :HS] = grad_t
                modulated += 1
            elif ratio_i < 1:
                dot_product = torch.dot(grad_i.flatten(), grad_t.flatten())
                proj_component = dot_product / grad_t.norm() ** 2 * grad_t
                grad_i = grad_i - proj_component
                perpen = grad_i - proj_component
                grad_i = grad_i.norm() * perpen / perpen.norm()
                W.grad[i_index, HS:] = grad_i
                modulated += 1
    return modulated


def _deform_setup(task_type, seed):
    import models.model as ref_model_mod

    from sml_tpu.models.deform import DeformPathomicNet

    torch.manual_seed(seed)
    patched = load_patched_deform(n=N, grid=GRID)
    orig = ref_model_mod.DeformCrossTransMIL
    ref_model_mod.DeformCrossTransMIL = patched
    try:
        ref = ref_model_mod.DeformPathomicNet(
            ref_args(task_type=task_type)).eval()
    finally:
        ref_model_mod.DeformCrossTransMIL = orig
    variables = convert_reference_state_dict("deformpathomic", ref.state_dict(),
                                             attn_dim=2)

    rng = np.random.default_rng(seed)
    x_path = rng.normal(size=(B, N, 1024)).astype(np.float32)
    x_t = rng.normal(size=(B, 59)).astype(np.float32)
    x_i = rng.normal(size=(B, 361)).astype(np.float32)
    labels = make_labels(task_type)

    mine = DeformPathomicNet(label_dim=4, dropout_rate=0.0, attn_dim=2,
                             return_vgrid=True, task_type=task_type)
    config = Config(mode="deformpathomic", task_type=task_type, fixdim=N,
                    label_dim=4, dropout_rate=0.0, gradient_modulate=True,
                    return_vgrid=True, batchloss_grad_scale="exact",
                    batchloss_layout="reference",  # exact utils/loss.py arithmetic
                    batch_size=B, mmhid=HS, num_devices=1)
    return ref, variables, mine, config, (x_path, x_t, x_i), labels


def _torch_train_loss(ref, task_type, x_path, x_t, x_i, labels):
    """reference train_test.py:52-77: task loss + BatchLoss similarity."""
    from utils.loss import BatchLoss

    feats, feat_t, feat_i, logits, *_ = ref(
        x_path=torch.from_numpy(x_path), x_omic=None,
        x_omic_tumor=torch.from_numpy(x_t), x_omic_immune=torch.from_numpy(x_i))
    label = torch.from_numpy(labels)
    loss3 = torch_task_loss(task_type, logits[2], label)
    bs_fn = BatchLoss(B, 1)
    batch_sim = (0.5 * torch.sum(bs_fn(logits[3], logits[4]))
                 + 0.5 * torch.sum(bs_fn(logits[5], logits[6])))
    return loss3 + batch_sim, (feat_t, feat_i)


@pytest.mark.slow
@pytest.mark.parametrize("task_type", ["survival", "diag2021"])
def test_deformpathomic_grad_parity(task_type):
    # seed 11 produces a per-class gradient conflict (sim<0) for BOTH tasks at
    # B=8, so the modulation branch actually fires (asserted below)
    ref, variables, mine, config, (x_path, x_t, x_i), labels = _deform_setup(
        task_type, seed=11)

    # ---- torch side: loss -> backward -> modulation ----
    loss_ref, (feat_t, feat_i) = _torch_train_loss(ref, task_type,
                                                   x_path, x_t, x_i, labels)
    loss_ref.backward()
    pre_mod_ref = torch_grads_as_tree("deformpathomic", ref, attn_dim=2)
    n_mod = reference_modulation(ref, feat_t, feat_i,
                                 torch.from_numpy(labels), task_type)
    assert n_mod > 0, "seed produced no conflicting gradients — test is vacuous"
    post_mod_ref = torch_grads_as_tree("deformpathomic", ref, attn_dim=2)

    # ---- jax side: the production loss + modulation functions ----
    jl = jnp.asarray(labels)

    def loss_fn(params):
        out = mine.apply({"params": params}, jnp.asarray(x_path),
                         jnp.asarray(x_t), jnp.asarray(x_i), deterministic=True)
        total, _ = steps_mod.compute_mode_loss(config, out, jl, train=True)
        return total, out

    (loss_mine, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    np.testing.assert_allclose(float(loss_mine), float(loss_ref.detach()),
                               rtol=1e-4, atol=1e-5, err_msg="train-step loss")
    assert_tree_close(grads, pre_mod_ref, what=f"pre-mod grads [{task_type}]")

    mod_grads = steps_mod.modulate_classifier_grads(config, grads,
                                                    variables["params"], out, jl)
    delta = np.abs(np.asarray(mod_grads["classifier"]["kernel"])
                   - np.asarray(grads["classifier"]["kernel"])).max()
    assert delta > 0, "jax modulation did not fire"
    assert_tree_close(mod_grads["classifier"]["kernel"],
                      post_mod_ref["classifier"]["kernel"],
                      what=f"post-modulation classifier grads [{task_type}]")


@pytest.mark.parametrize("task_type", ["survival"])
def test_cmta_grad_parity(task_type):
    """CMTA alignment backward: loss3 + 0.5*(L1(P.detach,P_hat)+L1(G.detach,G_hat))
    (reference train_test.py:296-374) vs compute_mode_loss's cmta branch."""
    from models.model import CMTA as RefCMTA

    from sml_tpu.models.cmta import CMTA

    torch.manual_seed(13)
    ref = RefCMTA(ref_args(mode="cmta", task_type=task_type)).eval()
    variables = convert_reference_state_dict("cmta", ref.state_dict())

    rng = np.random.default_rng(13)
    x_path = rng.normal(size=(B, 100, 1024)).astype(np.float32)
    x_omic = rng.normal(size=(B, 431)).astype(np.float32)
    labels = make_labels(task_type)
    label = torch.from_numpy(labels)

    from utils.utils import NLLSurvLoss

    logits, hazards, s, p, p_hat, g, g_hat = ref(
        x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))
    loss3 = NLLSurvLoss(alpha=0.15)(hazards=hazards, S=s, Y=label[:, 8].long(),
                                    c=label[:, 9], alpha=0)
    l1 = torch.nn.L1Loss()
    loss_ref = loss3 + 0.5 * (l1(p.detach(), p_hat) + l1(g.detach(), g_hat))
    loss_ref.backward()
    grads_ref = torch_grads_as_tree("cmta", ref)

    config = Config(mode="cmta", task_type=task_type, label_dim=4,
                    dropout_rate=0.0, gradient_modulate=False,
                    return_vgrid=False, batch_size=B, num_devices=1)
    mine = CMTA(label_dim=4)
    jl = jnp.asarray(labels)

    def loss_fn(params):
        out = mine.apply({"params": params}, jnp.asarray(x_path),
                         jnp.asarray(x_omic), deterministic=True)
        total, _ = steps_mod.compute_mode_loss(config, out, jl, train=True)
        return total

    loss_mine, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_mine), float(loss_ref.detach()),
                               rtol=1e-4, atol=1e-5, err_msg="cmta loss")
    assert_tree_close(grads, grads_ref, what="cmta grads")
