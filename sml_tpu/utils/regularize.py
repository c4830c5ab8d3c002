"""L1 weight-regularization helpers (reference ``utils/utils.py:34-173``).

The reference walks module attributes (`omic_net`, `linear_h_*`, `encoder*`,
`classifier`); here the equivalents operate on param pytrees with optional
subtree-name filters.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict


def regularize_weights(params) -> jnp.ndarray:
    """L1 norm of ALL parameters."""
    return sum(jnp.abs(p).sum() for p in jax.tree_util.tree_leaves(params))


def regularize_subtrees(params, names: Iterable[str]) -> jnp.ndarray:
    """L1 norm of parameters whose path contains any of ``names``."""
    names = tuple(names)
    total = jnp.asarray(0.0)
    for path, leaf in flatten_dict(params).items():
        if any(n in part for n in names for part in path):
            total = total + jnp.abs(leaf).sum()
    return total


def regularize_mm_weights(params) -> jnp.ndarray:
    """Reference ``regularize_MM_weights``: omic net + fusion linears + encoders +
    classifier."""
    return regularize_subtrees(params, ("omic_net", "linear_h", "linear_z",
                                        "linear_o", "encoder", "classifier"))


def regularize_mm_omic(params) -> jnp.ndarray:
    """Reference ``regularize_MM_omic``: omic-net parameters only."""
    return regularize_subtrees(params, ("omic_net",))
