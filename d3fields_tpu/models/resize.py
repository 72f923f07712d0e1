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


def _resize_weights_1d(in_size: int, out_size: int,
                       scale: float | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel 4-tap indices (clamped) and cubic weights.

    ``scale`` overrides the in/out ratio — F.interpolate(scale_factor=s)
    samples with the GIVEN scale, not the realized size ratio (torch-hub
    DINOv2's interpolate_offset=0.1 pos-embed path depends on this).
    """
    scale = (in_size / out_size) if scale is None else 1.0 / scale
    dst = np.arange(out_size)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    # the cubic kernel is even: weight of tap k is W(src - k)
    w = _cubic_kernel(np.stack([t + 1, t, t - 1, t - 2], axis=1))
    taps = np.clip(taps, 0, in_size - 1)
    return taps, w


def cubic_resize_np(img: np.ndarray, out_hw: tuple[int, int],
                    scale_hw: tuple[float, float] | None = None) -> np.ndarray:
    """Separable bicubic resize of (H, W, C) -> (h, w, C), torch semantics.

    ``scale_hw`` forwards explicit per-axis scale factors (see
    ``_resize_weights_1d``)."""
    H, W = img.shape[:2]
    h, w = out_hw
    sy, sx = scale_hw if scale_hw is not None else (None, None)
    ty, wy = _resize_weights_1d(H, h, sy)
    tx, wx = _resize_weights_1d(W, w, sx)
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


def _linear_weights_1d(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """2-tap half-pixel linear weights WITHOUT antialiasing (torch
    F.interpolate(mode='bilinear', align_corners=False, antialias=False))."""
    scale = in_size / out_size
    dst = np.arange(out_size)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    taps = np.stack([base, base + 1], axis=1)
    w = np.stack([1.0 - t, t], axis=1)
    taps = np.clip(taps, 0, in_size - 1)
    return taps, w


def bilinear_resize_exact(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Non-antialiased bilinear resize of (..., H, W, C) — exact
    F.interpolate semantics on BOTH up- and downscale (jax.image.resize
    antialiases downscales, which blurs thresholded mask logits differently
    from the reference SAM postprocess)."""
    import jax.numpy as jnp

    *lead, H, W, C = img.shape
    ty, wy = _linear_weights_1d(H, out_hw[0])
    tx, wx = _linear_weights_1d(W, out_hw[1])
    ty_j, wy_j = jnp.asarray(ty), jnp.asarray(wy, img.dtype)
    tx_j, wx_j = jnp.asarray(tx), jnp.asarray(wx, img.dtype)
    rows = (jnp.take(img, ty_j.reshape(-1), axis=-3)
            .reshape(*lead, out_hw[0], 2, W, C) * wy_j[:, :, None, None]).sum(-3)
    out = (jnp.take(rows, tx_j.reshape(-1), axis=-2)
           .reshape(*lead, out_hw[0], out_hw[1], 2, C) * wx_j[:, :, None]).sum(-2)
    return out
