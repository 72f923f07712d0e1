"""Image / grid resize primitives with torch-parity semantics.

- :func:`cubic_resize_np` — host-side bicubic (cubic convolution, a=-0.75,
  half-pixel centers, edge clamp, no antialias) matching
  ``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)``.
  Used for DINOv2 positional-embedding interpolation (done once per
  resolution on the host).
- :func:`bilinear_resize` — device-side bilinear with half-pixel centers
  matching ``F.interpolate(mode='bilinear', align_corners=False)`` and PIL
  upscaling; used in model preprocessing pipelines.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )
    return w


def _resize_weights_1d(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel 4-tap indices (clamped) and cubic weights."""
    scale = in_size / out_size
    dst = np.arange(out_size)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    # the cubic kernel is even: weight of tap k is W(src - k)
    w = _cubic_kernel(np.stack([t + 1, t, t - 1, t - 2], axis=1))
    taps = np.clip(taps, 0, in_size - 1)
    return taps, w


def cubic_resize_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Separable bicubic resize of (H, W, C) -> (h, w, C), torch semantics."""
    H, W = img.shape[:2]
    h, w = out_hw
    ty, wy = _resize_weights_1d(H, h)
    tx, wx = _resize_weights_1d(W, w)
    # rows: (h, 4, W, C) -> (h, W, C)
    rows = (img[ty] * wy[..., None, None]).sum(axis=1)
    # cols: (h, w, 4, C) -> (h, w, C)
    out = (rows[:, tx] * wx[None, ..., None]).sum(axis=2)
    return out.astype(img.dtype)


def bilinear_resize(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Device bilinear resize of (..., H, W, C), half-pixel centers."""
    *lead, H, W, C = img.shape
    out = jax.image.resize(
        img, tuple(lead) + (out_hw[0], out_hw[1], C), method="bilinear"
    )
    return out
