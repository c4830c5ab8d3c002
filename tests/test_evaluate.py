"""evaluate(): padded final batch must not contaminate metrics."""

import numpy as np

import jax

from sml_tpu.config import Config
from sml_tpu.data.loader import Loader
from sml_tpu.data.synthetic import SyntheticDataset
from sml_tpu.models.factory import define_net, init_model, model_inputs
from sml_tpu.train.evaluate import evaluate
from sml_tpu.train.metrics import cindex
from sml_tpu.train.steps import make_eval_step


def test_evaluate_padding_exactness_survival():
    """Dataset size 20 with batch 8 -> last batch padded by 4; cindex must equal a
    direct computation over exactly the 20 real samples."""
    config = Config(dataset="synthetic", synthetic_size=80, fixdim=64, batch_size=8,
                    mode="deformpathomic", task_type="survival",
                    gradient_modulate=False, return_vgrid=True)
    ds = SyntheticDataset("Test", config)  # 20 samples
    assert len(ds) == 20
    loader = Loader(ds, 8)

    model = define_net(config)
    init_batch = next(iter(loader))
    init_batch.pop("sample_mask")
    variables = init_model(config, model, jax.random.PRNGKey(0), init_batch)
    eval_step = make_eval_step(config, model)

    result = evaluate(config, eval_step, variables, loader)

    # direct: run every sample through the model one batch at a time (padded same way)
    risks, labels = [], []
    for batch in Loader(ds, 8):
        mask = batch.pop("sample_mask") > 0
        out = eval_step(variables, batch)
        risks.append(np.asarray(out["risk"])[mask])
        labels.append(np.asarray(batch["labels"])[mask])
    risk = np.concatenate(risks)
    lab = np.concatenate(labels)
    assert len(risk) == 20
    expected = cindex(risk, lab[:, 9], lab[:, 11])
    assert abs(result["cindex"] - expected) < 1e-12


def test_evaluate_loss_masks_padded_rows():
    """The final padded batch's loss must equal the loss over ONLY its real rows —
    i.e. a 4-real+4-pad batch scores identically to the same 4 rows wrap-padded with
    DIFFERENT pad content (pads contribute nothing)."""
    config = Config(dataset="synthetic", synthetic_size=80, fixdim=64, batch_size=8,
                    mode="omic", task_type="survival", gradient_modulate=False,
                    return_vgrid=False)
    ds = SyntheticDataset("Test", config)  # 20 samples -> final batch 4 real + 4 pad
    model = define_net(config)
    batches = list(Loader(ds, 8))
    init_batch = {k: v for k, v in batches[0].items() if k != "sample_mask"}
    variables = init_model(config, model, jax.random.PRNGKey(0), init_batch)
    eval_step = make_eval_step(config, model)

    last = batches[-1]
    assert last["sample_mask"].sum() == 4
    out_a = eval_step(variables, last)

    # same 4 real rows, pads replaced by the FIRST row instead of wrap order
    mangled = dict(last)
    for k, v in last.items():
        if k == "sample_mask":
            continue
        arr = np.array(v)
        arr[4:] = arr[0]
        mangled[k] = arr
    out_b = eval_step(variables, mangled)
    assert abs(float(out_a["loss"]) - float(out_b["loss"])) < 1e-6

    # and it equals the batch-of-4 loss computed with no padding at all
    config4 = Config(dataset="synthetic", synthetic_size=80, fixdim=64, batch_size=4,
                     mode="omic", task_type="survival", gradient_modulate=False,
                     return_vgrid=False)
    eval_step4 = make_eval_step(config4, model)
    unpadded = {k: np.array(v)[:4] for k, v in last.items() if k != "sample_mask"}
    out_c = eval_step4(variables, unpadded)
    assert abs(float(out_a["loss"]) - float(out_c["loss"])) < 1e-6


def test_evaluate_classification_metrics_are_floats():
    config = Config(dataset="synthetic", synthetic_size=40, fixdim=64, batch_size=8,
                    mode="omic", task_type="diag2021", gradient_modulate=False,
                    return_vgrid=False)
    ds = SyntheticDataset("Test", config)
    loader = Loader(ds, 8)
    model = define_net(config)
    init_batch = next(iter(loader))
    init_batch.pop("sample_mask")
    variables = init_model(config, model, jax.random.PRNGKey(0), init_batch)
    eval_step = make_eval_step(config, model)
    result = evaluate(config, eval_step, variables, loader)
    for k in ("acc", "f1", "auc", "bac", "sens", "spec", "prec", "loss"):
        assert type(result[k]) is float
