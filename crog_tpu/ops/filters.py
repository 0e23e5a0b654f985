"""Gaussian filtering.

Host path mirrors skimage.filters.gaussian defaults (mode='nearest',
truncate=4.0) used in grasp-mask generation (reference utils/dataset.py:673-676)
and SSG eval smoothing (utils/grasp_eval.py:198).  A jittable separable device
version serves the on-device eval stack.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy import ndimage

import jax.numpy as jnp


def gaussian_blur_np(img: np.ndarray, sigma: float) -> np.ndarray:
    from crog_tpu import native

    out = native.gaussian_blur(img, sigma)
    if out is not None:
        return out
    return ndimage.gaussian_filter(
        img.astype(np.float64), sigma=sigma, mode="nearest", truncate=4.0
    )


@lru_cache(maxsize=None)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_jax(img, sigma: float):
    """Separable gaussian blur of [..., H, W] with edge ('nearest') padding."""
    k = jnp.asarray(_gaussian_kernel1d(float(sigma)))
    r = (k.shape[0] - 1) // 2
    orig = img.dtype
    x = img.astype(jnp.float32)
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    # convolve along H: windowed weighted sum via tensordot over a rolled stack
    x = sum(k[i] * xp[..., i : i + x.shape[-2], :] for i in range(k.shape[0]))
    pad = [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)]
    xp = jnp.pad(x, pad, mode="edge")
    x = sum(k[i] * xp[..., :, i : i + img.shape[-1]] for i in range(k.shape[0]))
    return x.astype(orig)
