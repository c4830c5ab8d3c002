"""Functional train state (params + optimizer + batch stats + PRNG + step)."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any            # {} when the model has no BatchNorm
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, rng: jax.Array
               ) -> "TrainState":
        params = variables["params"]
        return cls(step=0, params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), rng=rng)

    def model_variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
