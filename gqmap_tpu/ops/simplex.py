"""Mixture-weight updates: simplex projection and softmax natural gradient.

* :func:`project_simplex` — vectorized Euclidean projection onto the
  probability simplex (sort-and-threshold algorithm of Ye,
  ``projsplx.m:15-31``); the reference keeps this as the alternative
  (commented) alpha update (``gqmap_gpu_mixture.m:49``).
* :func:`softmax_natural_step` — the live update: natural-gradient-style
  step on softmax logits, ``dw = alpha .* (dalpha - sum(dalpha .* alpha))``
  with clamped logits (``gqmap_gpu_mixture.m:78-86``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["project_simplex", "softmax_natural_step", "softmax"]


def project_simplex(y: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Euclidean projection of ``y`` onto ``{x >= 0, sum x = 1}``.

    Vectorized over all leading axes. Equivalent to ``projsplx.m``: sort
    descending, find the largest prefix whose running threshold stays below
    the next element, subtract, clamp.
    """
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    s = -jnp.sort(-y, axis=-1)  # descending
    css = jnp.cumsum(s, axis=-1)
    idx = jnp.arange(1, n + 1, dtype=y.dtype)
    tmax = (css - 1.0) / idx
    # valid prefix: tmax_j >= s_{j+1}; MATLAB picks the FIRST such j, and if
    # none exists uses j = n. The standard identity: the first valid j equals
    # rho where rho = max{j : s_j > tmax_{j-1}}... we replicate the MATLAB
    # loop directly: candidates j in 1..n-1 with tmax_j >= s_{j+1}, else n.
    nxt = s[..., 1:]
    valid = tmax[..., :-1] >= nxt
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    first = jnp.argmax(valid, axis=-1)  # first True (0-based j-1)
    j_full = jnp.full(first.shape, n - 1)
    pick = jnp.where(any_valid[..., 0], first, j_full)
    t = jnp.take_along_axis(tmax, pick[..., None], axis=-1)
    x = jnp.maximum(y - t, 0.0)
    return jnp.moveaxis(x, -1, axis)


def softmax(w: jnp.ndarray) -> jnp.ndarray:
    """``exp(w) / sum(exp(w))`` exactly as the reference writes it.

    Logits are clamped to +-300 by the update, so the naive form is safe in
    float32/float64 and matches ``gqmap_gpu_mixture.m:18,84`` bit-for-bit in
    spirit (no max-subtraction).
    """
    e = jnp.exp(w)
    return e / jnp.sum(e)


def softmax_natural_step(
    w: jnp.ndarray, dalpha: jnp.ndarray, lr, w_clip: float = 300.0
) -> jnp.ndarray:
    """One clamped natural-gradient step on the mixture logits.

    ``gqmap_gpu_mixture.m:82-83``: ``dw = alpha.*(dalpha - sum(dalpha.*alpha));
    w = clip(w + dw*lr, -300, 300)``.
    """
    alpha = softmax(w)
    dw = alpha * (dalpha - jnp.sum(dalpha * alpha))
    return jnp.clip(w + dw * lr, -w_clip, w_clip)
