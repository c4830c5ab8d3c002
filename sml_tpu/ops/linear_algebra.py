"""Iterative Moore-Penrose pseudo-inverse (Newton-Schulz), as used by Nystrom attention.

Numerics: the 6-step NS iteration is only contractive if the initial guess is scaled
inside the convergence region; the ``max(col_sums) * max(row_sums)`` scaling (same as the
reference, ``models/NystromAttention.py:20-35``) guarantees that for the row-stochastic
softmax matrices it is applied to.  Always iterate in float32 regardless of the compute
dtype — bf16 matmul error compounds across the polynomial evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp


def moore_penrose_pinv(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Approximate pinv of a batch of square matrices ``x`` (..., m, m)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))

    m = x.shape[-1]
    eye = jnp.eye(m, dtype=jnp.float32)

    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13.0 * eye - (xz @ (15.0 * eye - (xz @ (7.0 * eye - xz)))))

    return z.astype(orig_dtype)
