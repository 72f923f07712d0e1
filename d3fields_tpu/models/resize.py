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


# ---------------------------------------------------------------------------
# PIL-exact bilinear resize (the reference's preprocessing resampler)
# ---------------------------------------------------------------------------

_PIL_PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c 8bpc fixed point


def _pil_coeffs_1d(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Pillow ``precompute_coeffs`` + ``normalize_coeffs_8bpc`` for the
    bilinear (triangle, support=1) filter: per-output-pixel first tap index
    and int32 fixed-point weights (22 fractional bits)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    xmins = np.zeros(out_size, np.int64)
    weights = np.zeros((out_size, ksize), np.int64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size) - xmin
        pts = (np.arange(xmax) + xmin - center + 0.5) / filterscale
        w = np.clip(1.0 - np.abs(pts), 0.0, None)
        w = w / w.sum()
        # triangle-filter weights are non-negative, so Pillow's
        # round-half-away-from-zero reduces to the positive arm
        q = (0.5 + w * (1 << _PIL_PRECISION_BITS)).astype(np.int64)
        xmins[xx] = xmin
        weights[xx, :xmax] = q
    return xmins, weights


def _pil_pass_u8(img: np.ndarray, xmins: np.ndarray, weights: np.ndarray,
                 axis: int) -> np.ndarray:
    """One 8bpc resample pass along ``axis`` with Pillow's rounding:
    init accumulator to 1 << (PRECISION_BITS-1), shift down, clip to u8.

    Arithmetic runs in float64 multiply-adds (BLAS-speed, no giant int64
    gather temp) — exact, because every intermediate is an integer bounded
    by ksize * 255 * 2^22 << 2^53.
    """
    img = np.moveaxis(img, axis, 0).astype(np.float64)
    out_size, ksize = weights.shape
    acc = np.full((out_size,) + img.shape[1:],
                  float(1 << (_PIL_PRECISION_BITS - 1)))
    for k in range(ksize):  # ksize is 3 (upscale) .. ~2*scale+1 (downscale)
        taps = np.clip(xmins + k, 0, img.shape[0] - 1)
        w = weights[:, k].astype(np.float64)
        acc += img[taps] * w.reshape((out_size,) + (1,) * (img.ndim - 1))
    out = np.clip(np.floor(acc / (1 << _PIL_PRECISION_BITS)), 0, 255)
    return np.moveaxis(out.astype(np.uint8), 0, axis)


def pil_bilinear_resize_u8(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Bit-exact Pillow ``Image.resize(..., BILINEAR)`` on uint8 images.

    This is what the reference's preprocessing does — torchvision
    ``T.Resize`` on a PIL image (``fusion.py:603-607``): an antialiased
    triangle filter evaluated in 8-bit fixed point with a rounded uint8
    intermediate between the horizontal and vertical passes. Accepts
    (H, W, C) or (K, H, W, C); resize axes are the trailing (H, W).

    Delegates to Pillow's C resampler when importable (fast path); the
    in-tree numpy reimplementation below is the documented spec, the
    fallback, and what the test asserts bit-equality between.
    """
    assert img.dtype == np.uint8, "PIL 8bpc path is uint8-only"
    h, w = out_hw
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:
        if img.ndim == 3:
            return np.asarray(Image.fromarray(img).resize((w, h),
                                                          Image.BILINEAR))
        return np.stack([
            np.asarray(Image.fromarray(im).resize((w, h), Image.BILINEAR))
            for im in img
        ])
    return _pil_bilinear_resize_u8_np(img, out_hw)


def _pil_bilinear_resize_u8_np(img: np.ndarray,
                               out_hw: tuple[int, int]) -> np.ndarray:
    """Numpy reimplementation of Pillow's 8bpc bilinear resample."""
    h, w = out_hw
    H, W = img.shape[-3], img.shape[-2]
    out = img
    if W != w:  # Pillow: horizontal pass first, at the original height
        xm, wx = _pil_coeffs_1d(W, w)
        out = _pil_pass_u8(out, xm, wx, axis=-2)
    if H != h:
        ym, wy = _pil_coeffs_1d(H, h)
        out = _pil_pass_u8(out, ym, wy, axis=-3)
    return out


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
