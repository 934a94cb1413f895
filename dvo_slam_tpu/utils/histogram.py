"""Histogram utilities (reference: dvo_core/src/util/histogram.cpp:28-99).

Used by the MAD scale estimator in the reference (median via histogram)
and for entropy diagnostics.  On TPU an exact sort is cheap at these
sizes, so ops/robust.py uses sort-based medians; these functions provide
the reference-parity histogram API for diagnostics and tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_histogram(data, mask, bins: int, min_value: float, max_value: float):
    """1-D histogram of masked data (compute1DHistogram equivalent)."""
    scale = bins / (max_value - min_value)
    idx = jnp.clip(((data - min_value) * scale).astype(jnp.int32), 0, bins - 1)
    weights = mask.astype(jnp.float32)
    return jnp.zeros(bins, jnp.float32).at[idx.reshape(-1)].add(weights.reshape(-1))


def median_from_histogram(hist, min_value: float, max_value: float):
    """Bin-center median (computeMedianFromHistogram equivalent)."""
    total = jnp.sum(hist)
    cdf = jnp.cumsum(hist)
    median_bin = jnp.argmax(cdf >= 0.5 * total)
    bins = hist.shape[0]
    width = (max_value - min_value) / bins
    return min_value + (median_bin.astype(jnp.float32) + 0.5) * width


def entropy_from_histogram(hist):
    """Shannon entropy in bits (computeEntropyFromHistogram equivalent)."""
    total = jnp.maximum(jnp.sum(hist), 1e-12)
    p = hist / total
    terms = jnp.where(p > 0, -p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    return jnp.sum(terms)
