"""Bag-size bucketing for variable-length WSI bags.

The reference forces every bag to exactly ``fixdim`` patches by wrap-padding or
uniform subsampling at data-prep time (``data/dataset.py:150-181``).  Buckets
generalize that: each bag is padded up to the smallest bucket (compile once per
bucket) with a validity mask, and only bags larger than the largest bucket are
uniformly subsampled — so information is only dropped when unavoidable.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (1024, 2500, 4096)


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)


def bucket_bag(bag: np.ndarray, buckets: Sequence[int] = DEFAULT_BUCKETS,
               seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (with zeros + mask) or uniformly subsample ``bag`` (N, D) to a bucket size.

    Returns (bag[bucket, D], mask[bucket] bool).
    """
    n, d = bag.shape
    target = bucket_for(n, buckets)
    if n == target:
        return bag, np.ones(target, bool)
    if n < target:
        out = np.zeros((target, d), bag.dtype)
        out[:n] = bag
        mask = np.zeros(target, bool)
        mask[:n] = True
        return out, mask
    # uniform subsample, same rule as the reference's read_img downsampling
    idx = np.around(np.arange(target) * (n / target)).astype(int).clip(0, n - 1)
    return bag[idx], np.ones(target, bool)


def wrap_pad_bag(bag: np.ndarray, target: int) -> np.ndarray:
    """Reference-exact pad-by-repetition to ``target`` patches
    (``data/dataset.py:154-170``): tile whole copies then the first remainder rows."""
    n = bag.shape[0]
    if n >= target:
        idx = np.around(np.arange(target) * (n / target)).astype(int).clip(0, n - 1)
        return bag[idx]
    times = target // n
    rem = target % n
    parts = [bag] * times
    if rem:
        parts.append(bag[:rem])
    return np.concatenate(parts, axis=0)
