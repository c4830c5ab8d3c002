"""Weight-transplant forward parity vs the actual torch reference.

For every model family, build the reference torch module (imported from
/root/reference, never copied), transplant its state_dict into the flax model via
``sml_tpu.utils.torch_compat``, and assert forward outputs match on random inputs.
This is the proof that the rebuilt models are *the same models*
(reference ``models/model.py:142-187, 353-544, 559-705, 714-853``,
``models/DeformCrossTransMIL.py:79-160``, ``models/mil.py:34-259``).
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

_stub_modules()  # stubs optional deps and puts /root/reference on sys.path

import torch  # noqa: E402

# reference code calls .cuda() / torch.cuda.FloatTensor inline; run it on CPU
torch.Tensor.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor

from sml_tpu.utils.torch_compat import convert_reference_state_dict  # noqa: E402

RTOL, ATOL = 1e-4, 1e-4


def ref_args(**over):
    base = dict(
        mode="deformpathomic", attn_dim=2, return_vgrid=True, return_grad="False",
        task_type="diag2021", label_dim=4, init_type="max", init_gain=0.02,
        fusion_type="concat", cut_fuse_grad=False, skip=0, use_bilinear=1,
        path_gate=1, omic_gate=1, path_dim=128, omic_dim=128, path_scale=1,
        omic_scale=1, mmhid=128, dropout_rate=0.25, input_size_omic=431,
        input_size_omic_tumor=59, input_size_omic_immune=361, input_path_dim=1024,
        act_type="Sigmoid", batch_size=2, world_size=1, fixdim=2500)
    base.update(over)
    return SimpleNamespace(**base)


def rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def allclose(mine, ref, rtol=RTOL, atol=ATOL, what=""):
    np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(),
                               rtol=rtol, atol=atol, err_msg=what)


def test_maxnet_parity():
    from models.model import MaxNet as RefMaxNet

    from sml_tpu.models.maxnet import MaxNet

    torch.manual_seed(0)
    ref = RefMaxNet(input_dim=431, omic_dim=128, dropout_rate=0.25, label_dim=4,
                    init_max=True).eval()
    variables = convert_reference_state_dict("omic", ref.state_dict())

    rng = np.random.default_rng(0)
    x = rand(rng, 2, 431)
    feats, logits, _ = ref(x_omic=torch.from_numpy(x))

    mine = MaxNet(input_dim=431, omic_dim=128, dropout_rate=0.25, label_dim=4)
    out = mine.apply(variables, jnp.asarray(x), deterministic=True)
    allclose(out["features"], feats, what="maxnet features")
    allclose(out["logits"], logits, what="maxnet logits")


def test_abmil_parity():
    from models.mil import ABMIL as RefABMIL

    from sml_tpu.models.mil import ABMIL

    torch.manual_seed(1)
    ref = RefABMIL(ref_args()).eval()
    variables = convert_reference_state_dict("path", ref.state_dict())

    rng = np.random.default_rng(1)
    x = rand(rng, 2, 100, 1024)
    feats, logits, _ = ref(torch.from_numpy(x))

    out = ABMIL(label_dim=4).apply(variables, jnp.asarray(x), deterministic=True)
    allclose(out["features"], feats, what="abmil features")
    allclose(out["logits"], logits, what="abmil logits")


def test_transmil_parity():
    from models.mil import TransMIL as RefTransMIL

    from sml_tpu.models.mil import TransMIL

    torch.manual_seed(2)
    ref = RefTransMIL(ref_args()).eval()
    variables = convert_reference_state_dict("transmil", ref.state_dict())

    rng = np.random.default_rng(2)
    x = rand(rng, 2, 100, 1024)   # pads to 10x10 inside
    feats, logits, _ = ref(torch.from_numpy(x))

    out = TransMIL(label_dim=4).apply(variables, jnp.asarray(x), deterministic=True)
    allclose(out["features"], feats, what="transmil features")
    allclose(out["logits"], logits, what="transmil logits")


@pytest.mark.parametrize("fusion_type", ["concat", "pofusion"])
def test_pathomic_parity(fusion_type):
    from models.model import PathomicNet as RefPathomicNet, define_act_layer

    from sml_tpu.models.pathomic import PathomicNet

    torch.manual_seed(3)
    args = ref_args(mode="pathomic", fusion_type=fusion_type)
    ref = RefPathomicNet(args, define_act_layer("Sigmoid")).eval()
    variables = convert_reference_state_dict("pathomic", ref.state_dict(),
                                             fusion_type=fusion_type)

    rng = np.random.default_rng(3)
    x_path, x_omic = rand(rng, 2, 100, 1024), rand(rng, 2, 431)
    feats, path_vec, omic_vec, logits, *_ = ref(
        x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))

    mine = PathomicNet(label_dim=4, fusion_type=fusion_type)
    out = mine.apply(variables, jnp.asarray(x_path), jnp.asarray(x_omic),
                     deterministic=True)
    allclose(out["features"], feats, what="pathomic features")
    allclose(out["logits_path"], logits[0], what="pathomic logits_path")
    allclose(out["logits_omic"], logits[1], what="pathomic logits_omic")
    allclose(out["logits"], logits[2], what="pathomic logits_final")


def test_pathomic_original_parity():
    from models.model import PathomicNet_Original, define_act_layer

    from sml_tpu.models.pathomic import PathomicNetOriginal

    torch.manual_seed(4)
    args = ref_args(mode="pathomic_original")
    ref = PathomicNet_Original(args, define_act_layer("Sigmoid")).eval()
    variables = convert_reference_state_dict("pathomic_original", ref.state_dict())

    rng = np.random.default_rng(4)
    x_path, x_omic = rand(rng, 2, 100, 1024), rand(rng, 2, 431)
    out_ref = ref(x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))
    logits = out_ref[3]

    mine = PathomicNetOriginal(label_dim=4)
    out = mine.apply(variables, jnp.asarray(x_path), jnp.asarray(x_omic),
                     deterministic=True)
    # reference's path_classifier-on-3D-bag is a documented bug (model.py:299);
    # compare the well-defined outputs: final + omic logits
    allclose(out["logits_omic"], logits[1], what="pathomic_original logits_omic")
    allclose(out["logits"], logits[2], what="pathomic_original logits_final")


def test_mcat_parity():
    from models.model import MCAT_Surv

    from sml_tpu.models.mcat import MCATSurv

    torch.manual_seed(5)
    ref = MCAT_Surv(ref_args(mode="mcat")).eval()
    variables = convert_reference_state_dict("mcat", ref.state_dict())

    rng = np.random.default_rng(5)
    x_path, x_omic = rand(rng, 2, 100, 1024), rand(rng, 2, 431)
    logits_ref, hazards_ref, s_ref = ref(
        x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))

    out = MCATSurv(label_dim=4).apply(variables, jnp.asarray(x_path),
                                      jnp.asarray(x_omic), deterministic=True)
    allclose(out["logits"], logits_ref, what="mcat logits")
    allclose(out["hazards"], hazards_ref, what="mcat hazards")
    allclose(out["S"], s_ref, what="mcat S")


def test_mcat_bilinear_parity():
    """MCAT with fusion='bilinear' (reference ``models/model.py:605-606``).

    The reference's own call site (:655) is dead code: it wraps both pooled
    vectors in ``unsqueeze(0)``, so ``torch.cat`` inside BilinearFusion fails
    on rank mismatch for B>1 and ``cumprod(dim=1)`` fails on the squeezed 1-D
    hazards at B=1.  We transplant the reference weights and run its forward
    with ONLY the call convention fixed to the working CMTA one (:839 —
    ``mm(vec1, vec2)`` on (B, d)), which is what our model implements."""
    from models.model import MCAT_Surv

    from sml_tpu.models.mcat import MCATSurv

    torch.manual_seed(8)
    ref = MCAT_Surv(ref_args(mode="mcat"), fusion="bilinear").eval()
    variables = convert_reference_state_dict("mcat", ref.state_dict())

    real_mm = ref.mm

    class _CmtaConvention(torch.nn.Module):
        def forward(self, v1, v2):
            return real_mm(v1.squeeze(0), v2.squeeze(0)).unsqueeze(0)

    ref.mm = _CmtaConvention()

    rng = np.random.default_rng(8)
    x_path, x_omic = rand(rng, 2, 100, 1024), rand(rng, 2, 431)
    logits_ref, hazards_ref, s_ref = ref(
        x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))

    out = MCATSurv(label_dim=4, fusion="bilinear").apply(
        variables, jnp.asarray(x_path), jnp.asarray(x_omic), deterministic=True)
    allclose(out["logits"], logits_ref, what="mcat bilinear logits")
    allclose(out["hazards"], hazards_ref, what="mcat bilinear hazards")
    allclose(out["S"], s_ref, what="mcat bilinear S")


def test_cmta_parity():
    from models.model import CMTA as RefCMTA

    from sml_tpu.models.cmta import CMTA

    torch.manual_seed(6)
    ref = RefCMTA(ref_args(mode="cmta")).eval()
    variables = convert_reference_state_dict("cmta", ref.state_dict())

    rng = np.random.default_rng(6)
    x_path, x_omic = rand(rng, 2, 100, 1024), rand(rng, 2, 431)
    logits_ref, hazards_ref, s_ref, p, p_hat, g, g_hat = ref(
        x_path=torch.from_numpy(x_path), x_omic=torch.from_numpy(x_omic))

    out = CMTA(label_dim=4).apply(variables, jnp.asarray(x_path),
                                  jnp.asarray(x_omic), deterministic=True)
    allclose(out["P"], p, what="cmta P")
    allclose(out["G"], g, what="cmta G")
    allclose(out["P_hat"], p_hat, what="cmta P_hat")
    allclose(out["G_hat"], g_hat, what="cmta G_hat")
    allclose(out["logits"], logits_ref, what="cmta logits")
    allclose(out["hazards"], hazards_ref, what="cmta hazards")
    allclose(out["S"], s_ref, what="cmta S")


@pytest.mark.slow
def test_deformpathomic_parity():
    """Flagship 2-D deformable model at the reference's hard-coded N=2500
    (``models/DeformableAttention2D.py:239-240``).  Covers grid_sample, offsets,
    CPB bias, vgrid return, aux heads."""
    from models.model import DeformPathomicNet as RefDeform

    from sml_tpu.models.deform import DeformPathomicNet

    torch.manual_seed(7)
    args = ref_args(mode="deformpathomic", dropout_rate=0.1)
    ref = RefDeform(args).eval()
    variables = convert_reference_state_dict("deformpathomic", ref.state_dict(),
                                             attn_dim=2)

    rng = np.random.default_rng(7)
    b, n = 2, 2500
    x_path = rand(rng, b, n, 1024)
    x_t, x_i = rand(rng, b, 59), rand(rng, b, 361)

    feats_ref, _, _, logits_ref, *_ = ref(
        x_path=torch.from_numpy(x_path), x_omic=None,
        x_omic_tumor=torch.from_numpy(x_t), x_omic_immune=torch.from_numpy(x_i))
    # logits list: [hazard_tumor, hazard_immune, hazard,
    #               omic_tumor(B,2500,128), vgrid_tumor(B*g,2,12,12),
    #               omic_immune, vgrid_immune]   (model.py:539-542)

    mine = DeformPathomicNet(label_dim=4, dropout_rate=0.1, attn_dim=2,
                             return_vgrid=True)
    out = mine.apply(variables, jnp.asarray(x_path), jnp.asarray(x_t),
                     jnp.asarray(x_i), deterministic=True)

    allclose(out["logits_tumor"], logits_ref[0], what="deform hazard_tumor")
    allclose(out["logits_immune"], logits_ref[1], what="deform hazard_immune")
    allclose(out["logits"], logits_ref[2], what="deform hazard")
    allclose(out["features"], feats_ref, what="deform features")

    # omic: reference broadcasts (B, 2500, 128); mine returns the (B, 128) vector
    allclose(out["omic_tumor"], logits_ref[3][:, 0, :], what="deform omic_tumor")
    allclose(out["omic_immune"], logits_ref[5][:, 0, :], what="deform omic_immune")

    # vgrid: reference (B*g, 2, Hd, Wd) with channels (x, y); mine (B, g, Hd, Wd, 2)
    g = 8
    for name, idx in (("vgrid_tumor", 4), ("vgrid_immune", 6)):
        vg_ref = logits_ref[idx].detach().numpy()                 # (B*g, 2, Hd, Wd)
        hd, wd = vg_ref.shape[-2:]
        vg_ref = vg_ref.reshape(b, g, 2, hd, wd).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(np.asarray(out[name]), vg_ref,
                                   rtol=RTOL, atol=ATOL, err_msg=name)


def _ref_buggy_grid_sample_1d(inp, grid, align_corners=False):
    """Emulation of the reference's grid_sample_1d LIFT BUG
    (``models/DeformableAttention1D.py:36-43``): the coordinate lands in the x slot
    of a width-1 image, so the op returns midpoint(seq) * max(0, 1 - |g|/2) instead
    of sampling along the sequence.  Used only to prove the REST of the 1-D stack
    matches; sml_tpu's real sampler fixes the bug (``ops/grid_sample.py:77``)."""
    n, l, c = inp.shape
    y = (l - 1) / 2.0
    y0 = int(np.floor(y))
    wy = y - y0
    mid = inp[:, y0, :] * (1.0 - wy) + inp[:, min(y0 + 1, l - 1), :] * wy  # (N, C)
    w = jnp.clip(1.0 - jnp.abs(grid) / 2.0, 0.0)                            # (N, P)
    return mid[:, None, :] * w[..., None]


def test_ref_buggy_lift_emulation_matches_torch():
    """The emulation above must equal the reference's actual lift output."""
    import torch.nn.functional as F
    from einops import rearrange

    rng = np.random.default_rng(9)
    feats = rand(rng, 2, 3, 10)        # (B, C, L) torch layout
    g = rng.uniform(-1.1, 1.1, size=(2, 7)).astype(np.float32)

    grid_t = rearrange(torch.from_numpy(g), "... -> ... 1 1")
    grid_t = F.pad(grid_t, (0, 1), value=0.0)
    out_ref = F.grid_sample(rearrange(torch.from_numpy(feats), "... -> ... 1"),
                            grid_t, mode="bilinear", padding_mode="zeros",
                            align_corners=False)[..., 0]            # (B, C, P)
    mine = _ref_buggy_grid_sample_1d(
        jnp.asarray(feats.transpose(0, 2, 1)), jnp.asarray(g))      # (B, P, C)
    allclose(mine.transpose(0, 2, 1), out_ref, what="buggy 1d lift emulation")


@pytest.mark.slow
def test_deformpathomic_1d_parity(monkeypatch):
    """attn_dim=1 branch (cls token + 1-D deformable cross-attention,
    reference ``models/DeformCrossTransMIL.py:113-131``).  The reference's
    grid_sample_1d lift bug is emulated so the rest of the stack (offset convs,
    CPB1D, cls plumbing, heads) is proven equivalent."""
    from models.model import DeformPathomicNet as RefDeform

    import sml_tpu.ops.deformable as deformable_mod
    from sml_tpu.models.deform import DeformPathomicNet

    monkeypatch.setattr(deformable_mod, "grid_sample_1d", _ref_buggy_grid_sample_1d)

    torch.manual_seed(8)
    args = ref_args(mode="deformpathomic", attn_dim=1, dropout_rate=0.1,
                    return_vgrid=False)
    ref = RefDeform(args).eval()
    variables = convert_reference_state_dict("deformpathomic", ref.state_dict(),
                                             attn_dim=1)

    rng = np.random.default_rng(8)
    b, n = 2, 2500   # broadcast hard-codes 2500 (DeformCrossTransMIL.py:104)
    x_path = rand(rng, b, n, 1024)
    x_t, x_i = rand(rng, b, 59), rand(rng, b, 361)

    feats_ref, _, _, logits_ref, *_ = ref(
        x_path=torch.from_numpy(x_path), x_omic=None,
        x_omic_tumor=torch.from_numpy(x_t), x_omic_immune=torch.from_numpy(x_i))

    mine = DeformPathomicNet(label_dim=4, dropout_rate=0.1, attn_dim=1,
                             return_vgrid=False)
    out = mine.apply(variables, jnp.asarray(x_path), jnp.asarray(x_t),
                     jnp.asarray(x_i), deterministic=True)

    allclose(out["logits_tumor"], logits_ref[0], what="deform1d hazard_tumor")
    allclose(out["logits_immune"], logits_ref[1], what="deform1d hazard_immune")
    allclose(out["logits"], logits_ref[2], what="deform1d hazard")
    allclose(out["features"], feats_ref, what="deform1d features")
