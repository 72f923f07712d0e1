"""On-chip agreement gate for the SAM decoder's fast matmul precision.

``compute_dtype="bfloat16"`` on the predictor drops the decoder's f32
matmul-precision pin to default MXU precision — measured ~9x faster
(517 -> 58 ms for a 4-view rig decode; the pin forces multi-pass bf16
emulation on skinny matmuls). The decoder's VALUES stay f32 either way,
so the only divergence is matmul rounding; this gate bounds its effect on
the 0-thresholded masks and the IoU head. CPU tests cannot see this
(precision pins are TPU-only), hence the real-chip tier.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_decode_precision_agreement(tpu_backend):
    import jax.numpy as jnp

    from d3fields_tpu.models.sam import model as S

    cfg = S.SamConfig.vit_huge()
    params = S.random_params_direct(cfg)
    rs = np.random.RandomState(0)
    embs = jnp.asarray(rs.randn(2, cfg.grid, cfg.grid, 256)
                       .astype(np.float32) * 0.5)
    boxes = rs.uniform(50, 900, (2, 4, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rs.uniform(100, 300, (2, 4, 2))
    bj = jnp.asarray(boxes)

    m32, i32 = S.sam_decode_boxes_views(params, embs, bj, cfg, True,
                                        "float32")
    m16, i16 = S.sam_decode_boxes_views(params, embs, bj, cfg, True,
                                        "bfloat16")
    # thresholded masks: only knife-edge pixels may flip
    agree = (np.asarray(m32 > 0) == np.asarray(m16 > 0)).mean()
    assert agree > 0.98, agree
    assert np.abs(np.asarray(i32) - np.asarray(i16)).max() < 0.05
