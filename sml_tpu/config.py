"""Config system: YAML (with ``defaults:`` includes) -> flat dict -> auto-CLI -> typed Config.

Mirrors the reference UX (``utils/yaml_config_hook.py:5-23`` + ``main.py:134-139`` in the
reference repo): every YAML key becomes an ``--key`` argparse flag whose type is inferred
from the YAML value, so any knob can be overridden from the command line.  Internally the
flat dict is wrapped in a typed ``Config`` dataclass-like object with attribute access.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List, Optional

import yaml


def yaml_config_hook(config_file: str) -> Dict[str, Any]:
    """Load a YAML config; expand a ``defaults:`` list of sibling YAML includes.

    Each entry of ``defaults:`` is a single-item mapping ``{subdir: name}`` resolved to
    ``<dir(config_file)>/<subdir>/<name>.yaml`` and merged (parity with the reference
    hook at ``utils/yaml_config_hook.py``).
    """
    with open(config_file) as f:
        cfg = yaml.safe_load(f)
        for d in cfg.get("defaults", []):
            config_dir, cf = d.popitem()
            cf = os.path.join(os.path.dirname(config_file), config_dir, cf + ".yaml")
            with open(cf) as f2:
                val = yaml.safe_load(f2)
                cfg.update(val)

    if "defaults" in cfg:
        del cfg["defaults"]
    return cfg


def _cli_type(v: Any):
    """Infer an argparse type from a YAML default value (bools parsed leniently)."""
    if isinstance(v, bool):
        def parse_bool(s: str) -> bool:
            return str(s).lower() in ("1", "true", "yes", "y", "on")

        return parse_bool
    if v is None:
        return str
    return type(v)


def build_parser(yaml_config: Dict[str, Any],
                 parser: Optional[argparse.ArgumentParser] = None) -> argparse.ArgumentParser:
    """Auto-generate ``--key`` flags for every YAML key (type inferred from value)."""
    parser = parser or argparse.ArgumentParser()
    for k, v in yaml_config.items():
        if isinstance(v, list):
            parser.add_argument(f"--{k}", default=v, nargs="*",
                                type=_cli_type(v[0]) if v else str)
        else:
            parser.add_argument(f"--{k}", default=v, type=_cli_type(v))
    parser.add_argument("--debug", action="store_true",
                        help="debug mode (disable external logging)")
    return parser


class Config:
    """Flat attribute-access config with defaults for every knob the framework knows.

    Unknown keys are allowed (stored as attributes) so user YAMLs can carry extra
    metadata without breaking.
    """

    # --- dataset ---
    fixdim: int = 2500                    # fixed WSI bag size (must be a perfect square for 2-D deform)
    label_path: str = "./data"
    dataDir: str = "./data/"
    dataset: str = "synthetic"            # "TCGA" | "IvYGAP" | "both" | "synthetic"
    checkpoints: str = "./checkpoints"
    novalset: bool = False
    synthetic_size: int = 256             # samples per synthetic split (train)
    variable_bags: bool = False           # synthetic: variable bag sizes, bucketed to fixdim with masks
    bucket_sizes: str = ""                # comma-separated bag-size buckets, e.g.
                                          # "1024,2500,4096": batches grouped by
                                          # bucket, one compiled program per
                                          # bucket shape (masks make padded bags
                                          # exact); "" = single fixdim bucket
    packed_dir: str = ""                  # dir with {Train,Val,Test}.bin packed data
                                          # (see scripts/pack_data.py); "" = per-sample readers

    # --- distributed ---
    coordinator_address: str = ""         # multi-host rendezvous "host:port" (the
                                          # reference's MASTER_ADDR/PORT, main.py:26-28);
                                          # empty = single-host or TPU-pod auto-detect
    num_processes: int = 0                # total hosts (reference nodes*gpus); 0 = auto
    process_id: int = -1                  # this host's rank (reference nr); -1 = auto
    workers: int = 0                      # host-side prefetch threads (0 = sync)
    data_axis: str = "data"               # mesh axis name for data parallelism
    num_devices: int = 0                  # 0 = all visible devices
    seq_devices: int = 0                  # sequence-parallel shards of the patch axis
                                          # (0/1 = off); builds a (data, seq) mesh and
                                          # routes Nystrom attention through
                                          # parallel/seq_parallel.py under shard_map

    # --- modality fusion ---
    fusion_type: str = "concat"           # "concat" | "add" | "pofusion"
    coattn_fusion: str = "concat"         # mcat/cmta final fusion: "concat" |
                                          # "bilinear" (reference's ctor kwarg,
                                          # models/model.py:560,605-606,715,777)
    skip: int = 0
    use_bilinear: int = 1
    input_size_omic: int = 431
    input_size_omic_tumor: int = 59
    input_size_omic_immune: int = 361
    input_path_dim: int = 1024
    path_gate: int = 1
    omic_gate: int = 1
    path_dim: int = 128
    omic_dim: int = 128
    path_scale: int = 1
    omic_scale: int = 1
    mmhid: int = 128
    cut_fuse_grad: bool = False

    # --- training ---
    reload: bool = False
    resume: bool = False                  # restore last_state (params+opt+step+PRNG
                                          # + epoch/best/plateau meta) and continue
                                          # the interrupted run (reference only ever
                                          # reloads best weights, main.py:95-103)
    seed: int = 42
    batch_size: int = 8                   # GLOBAL batch size (sharded over the data axis)
    image_size: tuple = (224, 224)
    start_epoch: int = 0
    epochs: int = 20
    lr: float = 1.0e-3
    lr_policy: str = "cosine"             # linear | exp | step | plateau | cosine | onecycle | none
    survival_loss: str = "nll_surv"       # loss zoo: ce_surv | nll_surv | cox_surv | nll_surv_{kl,mse,l1,cos,ol}
    lr_decay_iters: int = 50
    epoch_count: int = 1
    epochs_decay: int = 10
    dropout_rate: float = 0.1
    return_grad: bool = False
    optimizer: str = "adam"               # sgd | adam | adagrad
    weight_decay: float = 0.1
    init_type: str = "max"                # max | normal | xavier | kaiming | orthogonal | none
    init_gain: float = 0.02
    compute_dtype: str = "float32"        # "float32" | "bfloat16" (matmul compute dtype)
    feature_dtype: str = "auto"           # HBM/transfer dtype of the WSI feature bags
                                          # (x_path). "auto" = follow compute_dtype.
                                          # Numerics-neutral when it matches
                                          # compute_dtype (the first Dense casts its
                                          # input there anyway); halves the largest
                                          # batch stream + host->device transfer.
    use_pallas: bool = True               # use fused Pallas kernels on TPU where available
    eval_every_iters: int = 0             # reference evals every 10 iters; 0 = per-epoch only
    remat: bool = False                   # jax.checkpoint the heavy branches
    device_loop: bool = False             # scan train steps in one dispatch per chunk
                                          # (amortizes host/dispatch overhead)
    device_loop_chunk: int = 0            # steps per device-loop dispatch; 0 = whole
                                          # epoch in one scan (requires the epoch to
                                          # fit in HBM); k>0 streams the epoch in
                                          # k-step chunks with the next chunk's
                                          # host->device transfer overlapping compute

    # --- losses ---
    gradient_modulate: bool = True
    modulation_style: str = "reference"   # "reference" (exact quirk) | "orthogonal" (clean projection)
    return_vgrid: bool = True
    batchloss_grad_scale: str = "exact"   # "exact" | "ddp" (reference GatherLayer 1/world semantics)
    batchloss_layout: str = "group"       # "group" (documented per-group intent) |
                                          # "reference" (exact utils/loss.py:23
                                          # view(8,N,-1) row-block arithmetic)

    # --- model ---
    mode: str = "deformpathomic"          # path|omic|pathomic|pathomic_original|mcat|cmta|deformpathomic
    attn_dim: int = 2
    path_arch: str = "abmil"              # path-mode backbone: "abmil" | "transmil"

    # --- task ---
    task_type: str = "diag2021"           # diag2021 | survival | grade | subtype
    label_dim: int = 4
    survival_interval: str = "all"        # "uncensored" | "all"
    act_type: str = "Sigmoid"

    debug: bool = False

    def __init__(self, **kwargs: Any):
        # start from class-level defaults
        for k in _annotated_keys(type(self)):
            setattr(self, k, getattr(type(self), k))
        for k, v in kwargs.items():
            setattr(self, k, v)
        self.validate()

    def validate(self) -> None:
        if self.mode not in ("path", "omic", "pathomic", "pathomic_original",
                             "mcat", "cmta", "deformpathomic"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.task_type not in ("diag2021", "survival", "grade", "subtype"):
            raise ValueError(f"unknown task_type {self.task_type!r}")
        if self.attn_dim not in (1, 2):
            raise ValueError("attn_dim must be 1 or 2")
        if self.attn_dim == 1 and self.return_vgrid:
            # the 1-D deformable path produces no vgrid, so the vgrid-based
            # batch-similarity loss is undefined; the reference crashes here
            # too (UnboundLocalError at models/DeformCrossTransMIL.py:158) —
            # fail with guidance instead of a deep KeyError
            raise ValueError("attn_dim=1 has no vgrid (1-D deformable "
                             "attention): set return_vgrid=false (disables "
                             "the vgrid batch-similarity loss, as in the "
                             "reference)")
        # non-square fixdim is allowed: DeformCrossTransMIL pads the token axis to
        # the next perfect square internally (masked), generalizing the reference's
        # hard-coded 50x50 grid (models/DeformableAttention2D.py:239-240)

    @property
    def grid_size(self) -> int:
        import math
        return int(math.ceil(self.fixdim ** 0.5))

    def bucket_list(self) -> tuple:
        """Parsed ``bucket_sizes`` (sorted), or () when bucketing is off."""
        if not self.bucket_sizes:
            return ()
        return tuple(sorted(int(b) for b in str(self.bucket_sizes).split(",")))

    @classmethod
    def from_yaml(cls, path: str, overrides: Optional[List[str]] = None) -> "Config":
        yaml_cfg = yaml_config_hook(path)
        parser = build_parser(yaml_cfg)
        args = parser.parse_args(overrides if overrides is not None else [])
        return cls(**vars(args))

    def to_dict(self) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in self.__dict__}

    def replace(self, **kwargs: Any) -> "Config":
        d = self.to_dict()
        d.update(kwargs)
        return Config(**d)

    def __repr__(self) -> str:
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(self.to_dict().items()))
        return f"Config({items})"


def _annotated_keys(cls) -> List[str]:
    keys = []
    for klass in reversed(cls.__mro__):
        keys.extend(getattr(klass, "__annotations__", {}).keys())
    return keys


def config_defaults() -> Dict[str, Any]:
    """All known Config knobs with their defaults (for full CLI exposure)."""
    return {k: getattr(Config, k) for k in _annotated_keys(Config) if k != "debug"}


def full_cli_config(yaml_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Merge YAML over Config defaults so every knob gets a --flag, with YAML values
    (and hence the file the user edits) taking precedence."""
    merged = config_defaults()
    merged.update(yaml_cfg)
    return merged
