"""Model / optimizer / scheduler factories (reference ``models/model.py:49-137``).

Optimizer parity: torch Adam/SGD couple weight decay into the gradient before the
moment updates (L2, not AdamW), reproduced with ``optax.add_decayed_weights`` placed
before the moment transform.  Schedulers step per EPOCH in the reference; here the lr
schedule is a function of the optax update count with ``steps_per_epoch`` baked in.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.traverse_util import flatten_dict, unflatten_dict

from sml_tpu.config import Config
from sml_tpu.models.cmta import CMTA
from sml_tpu.models.deform import DeformPathomicNet
from sml_tpu.models.maxnet import MaxNet, max_kernel_init
from sml_tpu.models.mil import ABMIL, TransMIL
from sml_tpu.models.mcat import MCATSurv
from sml_tpu.models.pathomic import PathomicNet, PathomicNetOriginal

# which batch keys each mode's __call__ consumes (batch dicts carry all of them)
MODE_INPUTS: Dict[str, Tuple[str, ...]] = {
    "path": ("x_path",),
    "omic": ("x_omic",),
    "pathomic": ("x_path", "x_omic"),
    "pathomic_original": ("x_path", "x_omic"),
    "mcat": ("x_path", "x_omic"),
    "cmta": ("x_path", "x_omic"),
    "deformpathomic": ("x_path", "x_omic_tumor", "x_omic_immune"),
}


def _dtype(config: Config):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[config.compute_dtype]


def feature_np_dtype(config: Config):
    """numpy dtype for the stored/transferred WSI feature bags (x_path).

    ``feature_dtype: auto`` follows compute_dtype — numerics-neutral, because
    the branch's first Dense casts its input to compute_dtype regardless; the
    win is HBM/transfer bytes (134 -> 67 MB per B=8 x 4096 batch)."""
    import numpy as np

    name = getattr(config, "feature_dtype", "auto")
    if name == "auto":
        name = config.compute_dtype
    return {"float32": np.float32, "bfloat16": jnp.bfloat16}[name]


def _seq_mesh(config: Config):
    """The (data, seq) mesh when sequence parallelism is configured, else None.

    Validates seq_devices against the Nystrom landmark counts of the mode's
    TransLayers UP FRONT — the shard_map body requires ``num_landmarks
    (= layer_dim // 2) % seq_devices == 0`` and would otherwise only fail via a
    deep assert (or an opaque shard_map divisibility error) after model build.
    """
    if getattr(config, "seq_devices", 0) and config.seq_devices > 1:
        layer_dims = []
        if config.mode == "cmta":
            layer_dims = [256]                      # CMTA feature_dim
        elif (config.mode == "path"
              and getattr(config, "path_arch", "abmil") == "transmil"):
            layer_dims = [512]                      # TransMIL TransLayer dim
        for dim in layer_dims:
            if (dim // 2) % config.seq_devices:
                raise ValueError(
                    f"seq_devices={config.seq_devices} must divide the Nystrom "
                    f"landmark count {dim // 2} (TransLayer dim {dim} // 2) for "
                    f"mode={config.mode!r}")
        if config.mode == "deformpathomic":
            if config.attn_dim != 2:
                raise ValueError("seq_devices requires attn_dim=2 for "
                                 "deformpathomic (1-D branch is not sharded)")
            side = config.grid_size
            if side % (4 * config.seq_devices):
                raise ValueError(
                    f"seq_devices={config.seq_devices}: the {side}x{side} query "
                    f"grid must split into whole kv rows per shard — side must "
                    f"be a multiple of 4*seq_devices")
        from sml_tpu.parallel.mesh import make_mesh

        return make_mesh(config)
    return None


def define_net(config: Config) -> nn.Module:
    init_max = config.init_type == "max"
    dtype = _dtype(config)
    mode = config.mode
    # the fused Pallas kernels only lower on real TPU backends
    use_pallas = bool(config.use_pallas) and jax.default_backend() == "tpu"
    if mode == "path":
        if getattr(config, "path_arch", "abmil") == "transmil":
            return TransMIL(label_dim=config.label_dim, path_dim=config.path_dim,
                            dtype=dtype, seq_mesh=_seq_mesh(config),
                            use_pallas=use_pallas)
        return ABMIL(label_dim=config.label_dim, path_dim=config.path_dim,
                     input_path_dim=config.input_path_dim, dtype=dtype)
    if mode == "omic":
        return MaxNet(input_dim=config.input_size_omic, omic_dim=config.omic_dim,
                      dropout_rate=config.dropout_rate, label_dim=config.label_dim,
                      init_max=init_max, dtype=dtype)
    if mode in ("pathomic", "pathomic_original"):
        cls = PathomicNet if mode == "pathomic" else PathomicNetOriginal
        return cls(label_dim=config.label_dim, input_size_omic=config.input_size_omic,
                   path_dim=config.path_dim, omic_dim=config.omic_dim,
                   mmhid=config.mmhid, dropout_rate=config.dropout_rate,
                   fusion_type=config.fusion_type, cut_fuse_grad=config.cut_fuse_grad,
                   skip=config.skip, use_bilinear=config.use_bilinear,
                   gate1=config.path_gate, gate2=config.omic_gate,
                   path_scale=config.path_scale, omic_scale=config.omic_scale,
                   init_max=init_max, dtype=dtype)
    if mode == "mcat":
        return MCATSurv(label_dim=config.label_dim, dtype=dtype,
                        fusion=config.coattn_fusion)
    if mode == "cmta":
        return CMTA(label_dim=config.label_dim, dtype=dtype,
                    fusion=config.coattn_fusion,
                    seq_mesh=_seq_mesh(config), use_pallas=use_pallas)
    if mode == "deformpathomic":
        return DeformPathomicNet(
            use_pallas=use_pallas,
            label_dim=config.label_dim,
            input_size_omic_tumor=config.input_size_omic_tumor,
            input_size_omic_immune=config.input_size_omic_immune,
            path_dim=config.path_dim, omic_dim=config.omic_dim, mmhid=config.mmhid,
            dropout_rate=config.dropout_rate, attn_dim=config.attn_dim,
            return_vgrid=config.return_vgrid, fusion_type=config.fusion_type,
            cut_fuse_grad=config.cut_fuse_grad, task_type=config.task_type,
            init_max=init_max, skip=config.skip, use_bilinear=config.use_bilinear,
            path_scale=config.path_scale, omic_scale=config.omic_scale,
            remat=config.remat, seq_mesh=_seq_mesh(config), dtype=dtype)
    raise NotImplementedError(f"model [{mode}] is not implemented")


# modes whose models accept a per-patch validity mask (padded/bucketed bags)
MASKABLE_MODES = ("path", "deformpathomic")


def model_inputs(config: Config, batch: Dict[str, Any]) -> Dict[str, Any]:
    kwargs = {k: batch[k] for k in MODE_INPUTS[config.mode]}
    if "mask" in batch and config.mode in MASKABLE_MODES:
        kwargs["mask"] = batch["mask"]
    return kwargs


def init_model(config: Config, model: nn.Module, rng: jax.Array,
               batch: Dict[str, Any]) -> Dict[str, Any]:
    """Initialize variables and apply the configured init scheme.

    ``init_type='max'`` is handled inside MaxNet/BilinearFusion kernel initializers
    (reference applies ``init_max_weights`` in those constructors); other types
    re-initialize every >=2-D kernel tree-wide, mirroring reference ``init_weights``
    (``utils/utils.py:180-211``).
    """
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "dropout": d_rng},
                           **model_inputs(config, batch), deterministic=True)
    if config.init_type in ("max", "none"):
        return variables
    return _reinit_kernels(variables, config.init_type, config.init_gain, p_rng)


def _reinit_kernels(variables, init_type: str, gain: float, rng: jax.Array):
    params = flatten_dict(variables["params"])
    new = {}
    keys = sorted(params.keys())
    rngs = jax.random.split(rng, len(keys))
    for key, krng in zip(keys, rngs):
        leaf = params[key]
        name = key[-1]
        if name in ("kernel", "weight") and leaf.ndim >= 2:
            new[key] = _init_kernel(krng, leaf, init_type, gain)
        elif name == "bias":
            new[key] = jnp.zeros_like(leaf)
        else:
            new[key] = leaf
    out = dict(variables)
    out["params"] = unflatten_dict(new)
    return out


def _init_kernel(rng, leaf, init_type: str, gain: float):
    shape, dtype = leaf.shape, leaf.dtype
    if init_type == "normal":
        return gain * jax.random.normal(rng, shape, dtype)
    if init_type == "xavier":
        init = jax.nn.initializers.variance_scaling(
            gain * gain, "fan_avg", "normal", in_axis=-2, out_axis=-1)
        return init(rng, shape, dtype)
    if init_type == "kaiming":
        init = jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal",
                                                    in_axis=-2, out_axis=-1)
        return init(rng, shape, dtype)
    if init_type == "orthogonal":
        init = jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)
        if len(shape) >= 2:
            return init(rng, shape, dtype)
        return leaf
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def make_lr_schedule(config: Config, steps_per_epoch: int) -> Callable[[int], float]:
    """Per-epoch torch scheduler semantics as a function of the optax step count."""
    lr0 = config.lr
    policy = config.lr_policy

    if policy == "onecycle":
        # torch OneCycleLR(max_lr=1e-3, epochs=epochs+epochs_decay, steps_per_epoch=200)
        total = (config.epochs + config.epochs_decay) * 200
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=1e-3, pct_start=0.3,
            div_factor=25.0, final_div_factor=1e4)

    def epoch_mult(epoch: jnp.ndarray) -> jnp.ndarray:
        if policy == "linear":
            return 1.0 - jnp.maximum(
                0.0, epoch + config.epoch_count - config.epochs
            ) / float(config.epochs_decay + 1)
        if policy == "exp":
            return 0.1 ** epoch
        if policy == "step":
            return 0.1 ** (epoch // config.lr_decay_iters)
        if policy == "cosine":
            return 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / config.epochs))
        # "plateau" never reaches here (define_optimizer injects a mutable lr
        # driven by ReduceLROnPlateau); "none" = constant
        return jnp.asarray(1.0)

    def schedule(count):
        epoch = jnp.asarray(count) // max(steps_per_epoch, 1)
        return lr0 * epoch_mult(epoch.astype(jnp.float32))

    return schedule


def define_optimizer(config: Config, steps_per_epoch: int = 1
                     ) -> optax.GradientTransformation:
    wd = config.weight_decay
    decay = [optax.add_decayed_weights(wd)] if wd else []
    if config.optimizer == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif config.optimizer == "sgd":
        core = optax.trace(decay=0.9, nesterov=False)
    elif config.optimizer == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.1)
    else:
        raise NotImplementedError(
            f"optimizer [{config.optimizer}] is not implemented")
    if config.lr_policy == "plateau":
        # metric-driven: the lr lives in opt_state.hyperparams, mutated between
        # epochs by ReduceLROnPlateau via set_learning_rate (torch
        # ReduceLROnPlateau semantics; reference models/model.py:105-106)
        final = optax.inject_hyperparams(
            lambda learning_rate: optax.scale_by_learning_rate(learning_rate))(
            learning_rate=config.lr)
    else:
        sched = make_lr_schedule(config, steps_per_epoch)
        final = optax.scale_by_learning_rate(sched)
    return optax.chain(*decay, core, final)


class ReduceLROnPlateau:
    """Host-side torch ``ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
    patience=5)`` (reference ``models/model.py:105-106``), rel-threshold mode."""

    def __init__(self, lr: float, factor: float = 0.2, threshold: float = 0.01,
                 patience: int = 5, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr


def set_learning_rate(state, lr: float):
    """Functionally update the injected learning_rate inside a TrainState's
    opt_state (only meaningful under ``lr_policy='plateau'``)."""
    import dataclasses

    import numpy as np

    def fix(entry):
        hp = getattr(entry, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            old = hp["learning_rate"]
            new_hp = dict(hp, learning_rate=jnp.asarray(
                np.asarray(lr, dtype=np.asarray(old).dtype)))
            if hasattr(entry, "_replace"):          # NamedTuple-style state
                return entry._replace(hyperparams=new_hp)
            return dataclasses.replace(entry, hyperparams=new_hp)
        return entry

    new_opt_state = tuple(fix(e) for e in state.opt_state)
    return state.replace(opt_state=new_opt_state)


def define_act_layer(act_type: str = "Tanh"):
    """Activation factory (reference ``models/model.py:115-128``)."""
    import jax.nn

    table = {
        "Tanh": jnp.tanh,
        "ReLU": jax.nn.relu,
        "Sigmoid": jax.nn.sigmoid,
        "LSM": lambda x: jax.nn.log_softmax(x, axis=1),
        "none": None,
    }
    if act_type not in table:
        raise NotImplementedError(f"activation layer [{act_type}] is not found")
    return table[act_type]


def define_bifusion(fusion_type: str, skip=1, use_bilinear=1, gate1=1, gate2=1,
                    dim1=32, dim2=32, scale_dim1=1, scale_dim2=1, mmhid=32,
                    dropout_rate=0.25, dtype=None):
    """Fusion-module factory (reference ``models/model.py:131-137``)."""
    from sml_tpu.ops.fusion import BilinearFusion

    if fusion_type != "pofusion":
        raise NotImplementedError(f"fusion type [{fusion_type}] is not found")
    return BilinearFusion(skip=skip, use_bilinear=use_bilinear, gate1=gate1,
                          gate2=gate2, dim1=dim1, dim2=dim2, scale_dim1=scale_dim1,
                          scale_dim2=scale_dim2, mmhid=mmhid,
                          dropout_rate=dropout_rate, dtype=dtype)


# alias mirroring the reference's name
define_scheduler = make_lr_schedule
