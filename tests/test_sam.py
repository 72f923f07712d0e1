"""SAM port parity vs the huggingface torch implementation (tiny config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3fields_tpu.models.sam import model as S

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def oracle():
    # one builder for oracle + smoke-mode weights (model.build_random_hf),
    # so the two can't drift apart
    cfg = S.SamConfig.tiny_test()
    hf = S.build_random_hf(cfg, seed=0)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = S.convert_hf_state_dict(sd, cfg)
    return hf, params, cfg


def test_vision_encoder_parity(oracle):
    hf, params, cfg = oracle
    rs = np.random.RandomState(0)
    px = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf.vision_encoder(
            torch.from_numpy(px).permute(0, 3, 1, 2)
        ).last_hidden_state.permute(0, 2, 3, 1).numpy()
    got = np.asarray(S.vision_encoder(params["vision"], jnp.asarray(px), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_image_wide_pe_parity(oracle):
    hf, params, cfg = oracle
    ref = hf.get_image_wide_positional_embeddings()[0].permute(1, 2, 0).numpy()
    got = np.asarray(
        S.image_wide_positional_embedding(params["prompt"], cfg.grid)
    )
    # the random fourier table has O(20) entries; sin/cos amplify f32
    # rounding, so parity is ~1e-5 not 1e-7
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5)


def test_box_prompt_parity(oracle):
    hf, params, cfg = oracle
    boxes = np.array([[4.0, 6.0, 40.0, 50.0], [0.0, 0.0, 20.0, 30.0]],
                     np.float32)
    with torch.no_grad():
        ref, _ = hf.prompt_encoder(
            input_points=None, input_labels=None,
            input_boxes=torch.from_numpy(boxes)[None], input_masks=None,
        )
    got = np.asarray(S.embed_boxes(params["prompt"], jnp.asarray(boxes),
                                   cfg.image_size))
    np.testing.assert_allclose(got, ref[0].numpy(), rtol=1e-4, atol=1e-5)


def test_point_prompt_parity(oracle):
    hf, params, cfg = oracle
    pts = np.array([[[8.0, 9.0], [30.0, 22.0]]], np.float32)  # (1, 2, 2)
    lbl = np.array([[1, 0]], np.int32)
    with torch.no_grad():
        ref, _ = hf.prompt_encoder(
            input_points=torch.from_numpy(pts)[None],
            input_labels=torch.from_numpy(lbl)[None],
            input_boxes=None, input_masks=None,
        )
    got = S.embed_points(params["prompt"], jnp.asarray(pts),
                         jnp.asarray(lbl), cfg.image_size, pad=True)
    np.testing.assert_allclose(np.asarray(got), ref[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_full_point_prediction_parity(oracle):
    """Click-prompt decoding (the headless capability behind the reference
    GUI's fbrs/S2M click segmentation) matches the HF oracle end-to-end:
    positive + negative clicks per prompt, padded prompts too."""
    hf, params, cfg = oracle
    rs = np.random.RandomState(2)
    px = rs.randn(1, 64, 64, 3).astype(np.float32)
    # two prompts: (fg, bg) clicks and a single fg click with a pad entry
    pts = np.array([[[8.0, 9.0], [30.0, 22.0]],
                    [[40.0, 41.0], [0.0, 0.0]]], np.float32)
    lbl = np.array([[1, 0], [1, -1]], np.int32)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            input_points=torch.from_numpy(pts)[None],
            input_labels=torch.from_numpy(lbl)[None],
            multimask_output=True,
        )
    emb = S.sam_encode_image(params, jnp.asarray(px), cfg)
    masks, iou = S.sam_decode_points(
        params, emb, jnp.asarray(pts), jnp.asarray(lbl), cfg, True
    )
    ref_iou = out.iou_scores[0].numpy()
    ref_masks = out.pred_masks[0].numpy()
    iou_scale = np.abs(ref_iou).max() + 1e-12
    mask_scale = np.abs(ref_masks).max() + 1e-12
    assert np.abs(np.asarray(iou) - ref_iou).max() / iou_scale < 2e-2
    assert np.abs(np.asarray(masks) - ref_masks).max() / mask_scale < 2e-2


def test_mask_prompt_parity(oracle):
    """Mask-prompt (iterative refinement) dense embeddings and the full
    point+mask decode match the HF oracle (SamMaskEmbedding /
    _embed_masks)."""
    hf, params, cfg = oracle
    rs = np.random.RandomState(4)
    grid = cfg.grid
    px = rs.randn(1, 64, 64, 3).astype(np.float32)
    mask_in = rs.randn(1, 4 * grid, 4 * grid).astype(np.float32)
    pts = np.array([[[8.0, 9.0]]], np.float32)
    lbl = np.array([[1]], np.int32)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            input_points=torch.from_numpy(pts)[None],
            input_labels=torch.from_numpy(lbl)[None],
            input_masks=torch.from_numpy(mask_in)[:, None],
            multimask_output=True,
        )
    emb = S.sam_encode_image(params, jnp.asarray(px), cfg)
    masks, iou = S.sam_decode_points(
        params, emb, jnp.asarray(pts), jnp.asarray(lbl), cfg, True,
        mask_input=jnp.asarray(mask_in),
    )
    ref_masks = out.pred_masks[0].numpy()
    scale = np.abs(ref_masks).max() + 1e-12
    np.testing.assert_allclose(np.asarray(masks) / scale, ref_masks / scale,
                               atol=5e-3)


def test_predictor_point_prompts(oracle):
    """SamPredictor.predict_points: original-pixel clicks on a non-square
    image flow through coordinate scaling, prompt bucketing and the
    full-resolution postprocess."""
    from d3fields_tpu.models.sam.predictor import SamPredictor

    _, params, cfg = oracle
    rs = np.random.RandomState(3)
    rgb = (rs.rand(50, 60, 3) * 255).astype(np.uint8)
    pred = SamPredictor(params, cfg).set_image(rgb)
    pts = np.array([[[10.0, 12.0], [40.0, 30.0]],
                    [[25.0, 25.0], [0.0, 0.0]]], np.float32)
    lbl = np.array([[1, 0], [1, -1]], np.int32)
    masks, iou, low = pred.predict_points(pts, lbl)
    assert masks.shape == (2, 3, 50, 60) and masks.dtype == bool
    assert iou.shape == (2, 3)
    # single-mask mode, then iterative refinement feeding the low-res
    # logits back as the mask prompt (upstream SAM's mask_input loop)
    m1, i1, low1 = pred.predict_points(pts[:1], lbl[:1],
                                       multimask_output=False)
    assert m1.shape == (1, 1, 50, 60) and i1.shape == (1, 1)
    m2, i2, _ = pred.predict_points(pts[:1], lbl[:1],
                                    multimask_output=False,
                                    mask_input=low1[:, 0])
    assert m2.shape == (1, 1, 50, 60) and np.isfinite(i2).all()


def test_full_box_prediction_parity(oracle):
    hf, params, cfg = oracle
    rs = np.random.RandomState(1)
    px = rs.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[4.0, 6.0, 40.0, 50.0], [10.0, 5.0, 60.0, 44.0],
                      [0.0, 0.0, 63.0, 63.0]], np.float32)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            input_boxes=torch.from_numpy(boxes)[None],
            multimask_output=True,
        )
    masks, iou = S.sam_predict_boxes(
        params, jnp.asarray(px), jnp.asarray(boxes), cfg, True
    )
    # compare at the oracle's own output scale: absolute tolerances once
    # masked a real decoder bug (layer-0 residual) because tiny random nets
    # emit ~1e-5-magnitude outputs
    ref_iou = out.iou_scores[0].numpy()
    ref_masks = out.pred_masks[0].numpy()
    iou_scale = np.abs(ref_iou).max() + 1e-12
    mask_scale = np.abs(ref_masks).max() + 1e-12
    assert np.abs(np.asarray(iou) - ref_iou).max() / iou_scale < 2e-2
    assert np.abs(np.asarray(masks) - ref_masks).max() / mask_scale < 2e-2


def test_random_params_direct_structure(oracle):
    """The torch-free direct initializer (used by bench — the HF route
    costs ~2 min at ViT-H scale) must stay structurally identical to the
    audited HF-converted pytree: same treedef, same leaf shapes, and it
    must run through the encoder+decoder producing finite outputs."""
    _, params, cfg = oracle
    direct = S.random_params_direct(cfg, seed=1)
    assert jax.tree.structure(params) == jax.tree.structure(direct)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        assert np.asarray(a).shape == np.asarray(b).shape

    px = np.random.RandomState(0).randn(1, cfg.image_size, cfg.image_size,
                                        3).astype(np.float32)
    emb = S.sam_encode_image(direct, jnp.asarray(px), cfg)
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]], jnp.float32)
    masks, iou = S.sam_decode_boxes(direct, emb, boxes, cfg)
    assert np.isfinite(np.asarray(masks)).all()
    assert np.isfinite(np.asarray(iou)).all()


def test_bf16_encoder_agreement(oracle):
    """The bf16 ViT-trunk option (the TPU MXU path, ~4x encode) must stay
    numerically close to the f32 encoder: high embedding cosine, and the
    decoded 0-thresholded masks nearly identical."""
    _, params, cfg = oracle
    rs = np.random.RandomState(1)
    px = jnp.asarray(rs.randn(1, cfg.image_size, cfg.image_size, 3)
                     .astype(np.float32))
    e32 = np.asarray(S.sam_encode_image(params, px, cfg))
    e16 = np.asarray(S.sam_encode_image(params, px, cfg, "bfloat16"))
    a, b = e32.reshape(-1, e32.shape[-1]), e16.reshape(-1, e16.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos.min()

    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]], jnp.float32)
    m32, i32 = S.sam_decode_boxes(params, jnp.asarray(e32), boxes, cfg, True)
    m16, i16 = S.sam_decode_boxes(params, jnp.asarray(e16), boxes, cfg, True)
    agree = (np.asarray(m32 > 0) == np.asarray(m16 > 0)).mean()
    assert agree > 0.98, agree  # only threshold-knife-edge pixels may flip
    assert np.abs(np.asarray(i32) - np.asarray(i16)).max() < 0.05


def test_predict_boxes_views_matches_per_view_loop(oracle):
    """One-dispatch multi-view decode (set_images + predict_boxes_views)
    == the per-view set_image/predict_boxes loop, incl. a zero-box view
    and differing per-view box counts, and for every encoder view_chunk."""
    from d3fields_tpu.models.sam.predictor import SamPredictor

    _, params, cfg = oracle
    rs = np.random.RandomState(3)
    imgs = rs.randint(0, 255, (4, 48, 56, 3), dtype=np.uint8)
    boxes = [
        np.array([[4.0, 4.0, 30.0, 40.0], [10.0, 8.0, 44.0, 30.0]],
                 np.float32),
        np.zeros((0, 4), np.float32),
        np.array([[2.0, 2.0, 20.0, 20.0]], np.float32),
        np.array([[6.0, 3.0, 50.0, 46.0], [1.0, 1.0, 10.0, 12.0],
                  [12.0, 20.0, 40.0, 44.0]], np.float32),
    ]
    sam = SamPredictor(params, cfg)
    ref = []
    for v in range(4):
        if boxes[v].shape[0] == 0:
            ref.append(None)
            continue
        sam.set_image(imgs[v])
        ref.append(sam.predict_boxes(boxes[v]))

    for chunk in (1, 2, 4):
        got = SamPredictor(params, cfg).set_images(
            imgs, view_chunk=chunk).predict_boxes_views(boxes)
        assert len(got) == 4
        for v in range(4):
            m, i = got[v]
            if ref[v] is None:
                assert m.shape[0] == 0 and i.shape[0] == 0
                continue
            rm, ri = ref[v]
            assert m.shape == rm.shape
            # identical math, different batching: thresholded masks equal
            # up to knife-edge pixels, iou to float tolerance
            agree = (m == rm).mean()
            assert agree > 0.999, agree
            np.testing.assert_allclose(i, ri, rtol=1e-4, atol=1e-5)
