"""GroundingDINO port parity vs huggingface (tiny configs) + grounded-SAM
pipeline contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3fields_tpu.models.groundingdino import bert as BB
from d3fields_tpu.models.groundingdino import model as G
from d3fields_tpu.models.groundingdino import swin as SW
from d3fields_tpu.models.groundingdino.detector import (
    GroundingDinoDetector, tokenize_classes,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def oracle():
    # one weight source for oracle + port: G.build_random_hf constructs the
    # HF model from OUR config (incl. the bbox-head/decoder-layer_norm
    # randomization that once masked a real final-box bug) and the params
    # are converted from its state dict
    cfg = G.GroundingDinoConfig.tiny_test()
    hf = G.build_random_hf(cfg, seed=0)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = G.convert_hf_state_dict(sd, cfg)
    return hf, params, cfg


def test_bert_parity():
    from transformers import BertConfig as HFBert, BertModel

    hfc = HFBert(vocab_size=200, hidden_size=16, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=32,
                 max_position_embeddings=32)
    torch.manual_seed(1)
    hf = BertModel(hfc, add_pooling_layer=False).eval()
    cfg = BB.BertConfig(vocab_size=200, hidden_size=16, num_layers=2,
                        num_heads=2, intermediate_size=32, max_position=32)
    params = BB.convert_hf_bert(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg
    )
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 200, (2, 10))
    mask3d = rs.rand(2, 10, 10) > 0.3
    mask3d |= np.eye(10, dtype=bool)
    pos = rs.randint(0, 32, (2, 10))
    types = np.zeros((2, 10), np.int64)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(ids), torch.from_numpy(mask3d),
            torch.from_numpy(types), torch.from_numpy(pos),
        ).last_hidden_state.numpy()
    got = np.asarray(BB.bert_encode(
        params, jnp.asarray(ids), jnp.asarray(mask3d), jnp.asarray(types),
        jnp.asarray(pos), cfg,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_text_mask_generation_matches_reference():
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map,
    )

    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    ref_mask, ref_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.from_numpy(ids)
    )
    mask, pos = G.generate_text_masks(ids)
    np.testing.assert_array_equal(mask, ref_mask.numpy())
    np.testing.assert_array_equal(pos, ref_pos.numpy())


@pytest.mark.slow
def test_full_forward_parity(oracle):
    hf, params, cfg = oracle
    rs = np.random.RandomState(0)
    px = rs.randn(1, 64, 64, 3).astype(np.float32)
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        )
    logits, boxes = G.groundingdino_forward(params, cfg, jnp.asarray(px), ids)
    ref_l = out.logits.numpy()
    gl = np.asarray(logits)
    fin = np.isfinite(ref_l)
    assert (np.isfinite(gl) == fin).all()
    np.testing.assert_allclose(gl[fin], ref_l[fin], rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(boxes), out.pred_boxes.numpy(), rtol=1e-4, atol=1e-5
    )


def _toy_tokenizer(text):
    return [200 + (hash(w) % 1000) for w in text.split()]


@pytest.mark.slow
def test_detector_contract(oracle):
    _, params, cfg = oracle
    det = GroundingDinoDetector(params, cfg, tokenize=_toy_tokenizer,
                                short_side=64, max_side=96)
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    out = det.predict_with_classes(img, ["mug", "red pen"], box_threshold=0.0)
    assert out.xyxy.shape == (cfg.num_queries, 4)  # threshold 0 keeps all
    assert set(np.unique(out.class_id)) <= {0, 1}
    assert (out.confidence >= 0).all() and (out.confidence <= 1).all()
    # impossible threshold -> empty detections, well-formed shapes
    empty = det.predict_with_classes(img, ["mug"], box_threshold=1.1)
    assert empty.xyxy.shape == (0, 4) and empty.class_id.shape == (0,)


@pytest.mark.slow
def test_grounded_sam_backend_end_to_end(oracle):
    """Full open-text instance segmentation with tiny dino + tiny SAM."""
    from transformers import (
        SamConfig as HFSamConfig, SamMaskDecoderConfig, SamModel,
        SamPromptEncoderConfig, SamVisionConfig,
    )

    from d3fields_tpu.models.sam import model as S
    from d3fields_tpu.models.sam.predictor import SamPredictor
    from d3fields_tpu.seg.grounded_sam import GroundedSAMBackend

    _, gparams, gcfg = oracle
    torch.manual_seed(3)
    hf_sam = SamModel(HFSamConfig(
        vision_config=SamVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, output_channels=16, window_size=14,
            global_attn_indexes=[1], num_pos_feats=8,
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=16, image_embedding_size=8, image_size=64, patch_size=8
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=16, num_attention_heads=2, mlp_dim=64,
            iou_head_hidden_dim=16,
        ),
    )).eval()
    scfg = S.SamConfig(
        hidden_size=32, num_layers=2, num_heads=2, mlp_dim=128, patch_size=8,
        image_size=64, window_size=14, global_attn_indexes=(1,),
        output_channels=16, prompt_hidden=16, decoder_heads=2,
        decoder_mlp_dim=64, iou_head_hidden=16,
    )
    sparams = S.convert_hf_state_dict(
        {k: v.detach().numpy() for k, v in hf_sam.state_dict().items()}, scfg
    )

    backend = GroundedSAMBackend(
        GroundingDinoDetector(gparams, gcfg, tokenize=_toy_tokenizer,
                              short_side=64, max_side=96),
        SamPredictor(sparams, scfg),
    )
    rs = np.random.RandomState(4)
    img = rs.randint(0, 255, (72, 96, 3), dtype=np.uint8)
    vm = backend.segment(img, ["mug", "shoe"], [0.3, 0.3])
    # reference contract: background first with confidence 1.0
    assert vm.labels[0] == "background"
    assert vm.confidences[0] == 1.0
    assert vm.masks.shape[1:] == (72, 96)
    assert vm.masks.dtype == bool
    assert set(vm.labels[1:]) <= {"mug", "shoe"}
    # background is exactly the complement of the union
    if vm.masks.shape[0] > 1:
        np.testing.assert_array_equal(
            vm.masks[0], ~np.any(vm.masks[1:], axis=0)
        )


@pytest.mark.slow
def test_batched_views_match_per_view(oracle):
    """segment_views == per-view segment (one batched forward vs loop)."""
    from transformers import (
        SamConfig as HFSamConfig, SamMaskDecoderConfig, SamModel,
        SamPromptEncoderConfig, SamVisionConfig,
    )

    from d3fields_tpu.models.sam import model as S
    from d3fields_tpu.models.sam.predictor import SamPredictor
    from d3fields_tpu.seg.grounded_sam import GroundedSAMBackend

    _, gparams, gcfg = oracle
    torch.manual_seed(3)
    hf_sam = SamModel(HFSamConfig(
        vision_config=SamVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, output_channels=16, window_size=14,
            global_attn_indexes=[1], num_pos_feats=8,
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=16, image_embedding_size=8, image_size=64, patch_size=8
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=16, num_attention_heads=2, mlp_dim=64,
            iou_head_hidden_dim=16,
        ),
    )).eval()
    scfg = S.SamConfig(
        hidden_size=32, num_layers=2, num_heads=2, mlp_dim=128, patch_size=8,
        image_size=64, window_size=14, global_attn_indexes=(1,),
        output_channels=16, prompt_hidden=16, decoder_heads=2,
        decoder_mlp_dim=64, iou_head_hidden=16,
    )
    sparams = S.convert_hf_state_dict(
        {k: v.detach().numpy() for k, v in hf_sam.state_dict().items()}, scfg
    )
    backend = GroundedSAMBackend(
        GroundingDinoDetector(gparams, gcfg, tokenize=_toy_tokenizer,
                              short_side=64, max_side=96),
        SamPredictor(sparams, scfg),
    )
    rs = np.random.RandomState(7)
    imgs = rs.randint(0, 255, (2, 72, 96, 3), dtype=np.uint8)
    batched = backend.segment_views(imgs, ["mug", "shoe"], [0.3])
    single = [backend.segment(imgs[v], ["mug", "shoe"], [0.3])
              for v in range(2)]
    for b, s in zip(batched, single):
        assert b.labels == s.labels
        np.testing.assert_array_equal(b.masks, s.masks)
        np.testing.assert_allclose(b.confidences, s.confidences, rtol=1e-4)


def test_postprocess_empty_class_span():
    """A class whose tokenization is empty (zero-width span) gets score 0
    instead of crashing the zero-size reduction."""
    import numpy as np
    from d3fields_tpu.models.groundingdino.detector import _postprocess_view

    probs = np.zeros((4, 8), np.float32)
    probs[0, 2] = 0.9   # box 0 -> class 0 tokens [2, 4)
    probs[1, 5] = 0.8   # box 1 -> class 2 tokens [5, 6)
    boxes = np.array([[0.2, 0.2, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2],
                      [0.2, 0.7, 0.2, 0.2], [0.7, 0.2, 0.2, 0.2]], np.float32)
    spans = [(2, 4), (4, 4), (5, 6)]  # middle class tokenizes to nothing
    det = _postprocess_view(probs, boxes, spans, 0.3, 0.25, (100, 100))
    assert set(det.class_id.tolist()) == {0, 2}


def test_tokenizer_matches_hf_bert(tmp_path):
    """Token-id equality between our vocab-file tokenizer and HF
    ``BertTokenizer`` on realistic detection captions — including the
    punctuated/accented forms the old whitespace-only tokenizer sent to
    [UNK] (reference behavior via HF inside GroundingDINO,
    ``utils/grounded_sam.py:418-424``)."""
    from transformers import BertTokenizer

    from d3fields_tpu.apps._backends import _wordpiece_tokenizer

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "coffee", "mug", "blue", "green", "shoe", "a", "the", "toy",
        "mickey", "'", "s", ".", ",", "/", "!", "-", "cafe", "table",
        "spoon", "on", "red", "##s", "##ful", "cup", "##board", "手", "机",
        "wooden", "block", "##e",
    ]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n", encoding="utf-8")

    hf = BertTokenizer(str(vf), do_lower_case=True)
    ours = _wordpiece_tokenizer(str(vf))

    captions = [
        "coffee mug.",
        "blue/green shoe",
        "Mickey's toy!",
        "café table",          # accent strip: café -> cafe
        "spoons , cupboard",
        "red cups on the table.",
        "wooden  block\t!",         # messy whitespace
        "手机",                      # CJK chars split to singles
        "unknownword mug",          # [UNK] fallback
        "a cupful of coffee",
        "mug\ue000 on the table",   # private-use char (Co): HF strips it
        "red\x07 cup",              # bell control char (Cc): stripped
    ]
    for cap in captions:
        ref_ids = hf(cap, add_special_tokens=False)["input_ids"]
        assert ours(cap) == ref_ids, (
            f"caption {cap!r}: ours={ours(cap)} hf={ref_ids} "
            f"(hf tokens: {hf.convert_ids_to_tokens(ref_ids)})"
        )


@pytest.mark.slow
def test_full_forward_parity_four_stage_swin():
    """Production Swin topology at tiny size: FOUR stages with the real
    out_stages (1,2,3) and num_feature_levels=4 — exercises the deeper
    patch-merging path and the stage->level extra-conv that the 2-stage
    tiny oracle misses (the swin_b/swin_t presets both have this shape)."""
    from transformers import (
        BertConfig as HFBert, GroundingDinoConfig as HFGDC,
        GroundingDinoForObjectDetection, SwinConfig as HFSwin,
    )

    from d3fields_tpu.models.groundingdino import bert as B_
    from d3fields_tpu.models.groundingdino import swin as SW

    hfc = HFGDC(
        backbone_config=HFSwin(
            embed_dim=8, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
            window_size=4, image_size=128, patch_size=4,
            out_features=["stage2", "stage3", "stage4"],
        ),
        text_config=HFBert(vocab_size=2000, hidden_size=24,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=48, max_position_embeddings=64),
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=16,
        max_text_len=32, num_feature_levels=4,
    )
    torch.manual_seed(1)
    hf = GroundingDinoForObjectDetection(hfc).eval()
    with torch.no_grad():
        for head in hf.bbox_embed:
            head.layers[-1].weight.normal_(0, 0.05)
            head.layers[-1].bias.normal_(0, 0.05)
        hf.model.decoder.layer_norm.weight.normal_(1.0, 0.2)
        hf.model.decoder.layer_norm.bias.normal_(0, 0.2)
        hf.model.encoder_output_bbox_embed.layers[-1].weight.normal_(0, 0.05)
        hf.model.encoder_output_bbox_embed.layers[-1].bias.normal_(0, 0.05)

    cfg = G.GroundingDinoConfig(
        d_model=32, num_feature_levels=4, encoder_layers=1, decoder_layers=1,
        encoder_heads=4, decoder_heads=4, encoder_ffn_dim=64,
        decoder_ffn_dim=64, num_queries=16, max_text_len=32,
        swin=SW.SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 4, 8), window_size=4,
                           out_stages=(1, 2, 3)),
        text=B_.BertConfig(vocab_size=2000, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           max_position=64),
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    from d3fields_tpu.utils.convert import audit_conversion, ALLOWED_UNUSED

    params, _ = audit_conversion(
        lambda s: G.convert_hf_state_dict(s, cfg), sd,
        allowed_unused=ALLOWED_UNUSED["gdino"],
    )

    rs = np.random.RandomState(0)
    px = rs.randn(1, 128, 128, 3).astype(np.float32)
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(px).permute(0, 3, 1, 2),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        )
    logits, boxes = G.groundingdino_forward(params, cfg, jnp.asarray(px), ids)
    ref_l = out.logits.numpy()
    gl = np.asarray(logits)
    fin = np.isfinite(ref_l)
    assert (np.isfinite(gl) == fin).all()
    np.testing.assert_allclose(gl[fin], ref_l[fin], rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(boxes), out.pred_boxes.numpy(), rtol=1e-4, atol=2e-5
    )


def test_view_chunked_batch_matches_unchunked(oracle):
    """view_chunk changes scheduling only: chunked (incl. a padded tail
    chunk) == one-batch detection bit-for-bit at the numpy level."""
    _, gparams, gcfg = oracle
    rs = np.random.RandomState(11)
    imgs = rs.randint(0, 255, (3, 72, 96, 3), dtype=np.uint8)
    kw = dict(tokenize=_toy_tokenizer, short_side=64, max_side=96)
    full = GroundingDinoDetector(gparams, gcfg, **kw)
    chunked = GroundingDinoDetector(gparams, gcfg, view_chunk=2, **kw)
    a = full.predict_with_classes_batch(imgs, ["mug", "shoe"], 0.3)
    b = chunked.predict_with_classes_batch(imgs, ["mug", "shoe"], 0.3)
    assert len(a) == len(b) == 3
    for da, db in zip(a, b):
        np.testing.assert_allclose(da.xyxy, db.xyxy, atol=1e-5)
        np.testing.assert_allclose(da.confidence, db.confidence, atol=1e-6)
        np.testing.assert_array_equal(da.class_id, db.class_id)


def test_query_chunked_deformable_matches_unchunked(oracle):
    """query_chunk tiles the encoder's deformable gather with lax.map —
    identical math (per-query independence), so the full forward must be
    BITWISE equal with and without tiling, including a padded tail tile
    (Q=145 tokens at 64x64 here, chunk 7 -> 21 tiles incl. a pad tail)."""
    _, params, cfg = oracle
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    l0, b0 = G.groundingdino_forward(params, cfg, px, ids)
    l1, b1 = G.groundingdino_forward(params, cfg, px, ids, "float32", 7)
    fin = np.isfinite(np.asarray(l0))
    assert (np.isfinite(np.asarray(l1)) == fin).all()
    np.testing.assert_array_equal(np.asarray(l1)[fin], np.asarray(l0)[fin])
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b0))


def test_bf16_trunk_agreement(oracle):
    """The gated bf16 trunk (Swin + encoder on the MXU; BERT / selection /
    decoder / heads stay f32 — model.py) must agree with f32 at the
    detection level: every top-10 f32 query has a bf16 counterpart at
    IoU > 0.9, and the score distribution is unchanged to < 0.05
    (measured drift: IoU 1.0, sorted-score max delta 0.009)."""
    _, params, cfg = oracle
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    l32, b32 = G.groundingdino_forward(params, cfg, px, ids)
    l16, b16 = G.groundingdino_forward(params, cfg, px, ids, "bfloat16")
    s32 = np.asarray(jax.nn.sigmoid(l32[0])).max(1)
    s16 = np.asarray(jax.nn.sigmoid(l16[0])).max(1)
    assert np.abs(np.sort(s32) - np.sort(s16)).max() < 0.05

    def cxcywh_iou(a, b):
        lt = np.maximum(a[:, None, :2] - a[:, None, 2:] / 2,
                        b[None, :, :2] - b[None, :, 2:] / 2)
        rb = np.minimum(a[:, None, :2] + a[:, None, 2:] / 2,
                        b[None, :, :2] + b[None, :, 2:] / 2)
        inter = np.clip(rb - lt, 0, None).prod(-1)
        aa = a[:, 2:].prod(-1)
        ab = b[:, 2:].prod(-1)
        return inter / (aa[:, None] + ab[None] - inter + 1e-9)

    top32 = np.argsort(-s32)[:10]
    top16 = np.argsort(-s16)[:10]
    m = cxcywh_iou(np.asarray(b32[0])[top32], np.asarray(b16[0])[top16])
    assert m.max(axis=1).min() > 0.9, m.max(axis=1)


def test_corner_table_bilinear_matches_reference_sampler():
    """The 4-corner-table gather (the TPU hot path) == the per-corner
    masked-take reference sampler, including out-of-bounds and border
    samples (zeros padding, align_corners=False)."""
    rs = np.random.RandomState(5)
    bn, h, w, hd = 3, 7, 9, 4
    v = jnp.asarray(rs.randn(bn, h, w, hd).astype(np.float32))
    # coords spanning in-bounds, borders, and far out of bounds
    gx = jnp.asarray(rs.uniform(-1.8, 1.8, (bn, 50)).astype(np.float32))
    gy = jnp.asarray(rs.uniform(-1.8, 1.8, (bn, 50)).astype(np.float32))
    table = G._corner_table(v)
    got = np.asarray(G._table_bilinear(table, (h, w), gx, gy))
    ref = np.asarray(jax.vmap(G._bilinear_sample_nchw)(v, gx, gy))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_pallas_gather_interpret_matches_xla():
    """The Mosaic deformable-gather kernel (interpret mode — same math the
    chip runs, minus the lowering) == deformable_attention_core, including
    out-of-bounds samples and the padded query tail (Q=333 pads to 512 at
    T=256 here)."""
    from d3fields_tpu.models.groundingdino.gather_pallas import (
        concat_corner_tables, deformable_gather_pallas)

    rs = np.random.RandomState(7)
    B, nh, hd, P = 2, 4, 8, 4
    shapes = ((13, 17), (7, 9), (4, 5))
    S = sum(h * w for h, w in shapes)
    Q = 333
    value = jnp.asarray(rs.randn(B, S, nh, hd).astype(np.float32))
    loc = jnp.asarray(
        rs.uniform(-0.2, 1.2, (B, Q, nh, len(shapes), P, 2)).astype(
            np.float32))
    wgt = rs.rand(B, Q, nh, len(shapes), P).astype(np.float32)
    wgt = jnp.asarray(wgt / wgt.sum(axis=(-2, -1), keepdims=True))
    ref = np.asarray(G.deformable_attention_core(value, list(shapes), loc,
                                                 wgt))
    tables = concat_corner_tables(value, shapes)
    got = np.asarray(deformable_gather_pallas(tables, shapes, loc, wgt,
                                              interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_forward_gather_impl_pallas_matches_xla(oracle):
    """The full forward with gather_impl="pallas_interpret" (the encoder
    gather through the kernel) matches the XLA-gather forward — pinning
    the gather_impl threading detector -> forward -> encoder layers."""
    _, params, cfg = oracle
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    l0, b0 = G.groundingdino_forward(params, cfg, px, ids)
    l1, b1 = G.groundingdino_forward(params, cfg, px, ids, "float32", None,
                                     "pallas_interpret")
    fin = np.isfinite(np.asarray(l0))
    assert (np.isfinite(np.asarray(l1)) == fin).all()
    np.testing.assert_allclose(np.asarray(l1)[fin], np.asarray(l0)[fin],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-4, atol=1e-4)


def test_postprocess_device_reduction_parity():
    """The on-device logits reduction (_reduce_detection_outputs — what the
    predict paths fetch instead of the full sigmoid maps) yields detections
    identical to the full-map numpy reference (_postprocess_view),
    including the empty-span and all-below-text-threshold fallbacks."""
    from d3fields_tpu.models.groundingdino.detector import (
        _postprocess_view, _postprocess_view_reduced,
        _reduce_detection_outputs, _span_mask, _unpack_reduced)

    rs = np.random.RandomState(11)
    V, Q, L = 3, 64, 32
    logits = rs.randn(V, Q, L).astype(np.float32) * 2.0
    boxes = rs.uniform(0.2, 0.8, (V, Q, 4)).astype(np.float32)
    spans = [(1, 4), (5, 5), (6, 12)]  # includes a width-0 span
    for thr_t in (0.25, 0.95):  # 0.95: exercises the fallback branch
        red = np.asarray(_reduce_detection_outputs(
            jnp.asarray(logits), jnp.asarray(boxes),
            jnp.asarray(_span_mask(spans, L)), jnp.float32(thr_t)))
        assert red.shape == (V, Q, 1 + 4 + 2 * len(spans))
        sc, st, sf, bx = _unpack_reduced(red, len(spans))
        for v in range(V):
            ref = _postprocess_view(
                np.asarray(jax.nn.sigmoid(jnp.asarray(logits[v]))),
                boxes[v], spans, 0.3, thr_t, (120, 160))
            got = _postprocess_view_reduced(sc[v], st[v], sf[v], bx[v],
                                            0.3, (120, 160))
            np.testing.assert_array_equal(got.xyxy, ref.xyxy)
            np.testing.assert_array_equal(got.confidence, ref.confidence)
            np.testing.assert_array_equal(got.class_id, ref.class_id)


def test_pallas_gather_query_tile_guard():
    """query_tile must be a multiple of 8: the kernel's gather loop walks
    whole 8-query groups, and a ragged tail would silently read
    uninitialized scratch as taps (round-5 review finding)."""
    from d3fields_tpu.models.groundingdino.gather_pallas import (
        deformable_gather_pallas)

    with pytest.raises(ValueError, match="multiple of 8"):
        deformable_gather_pallas(
            jnp.zeros((4, 30, 128)), ((2, 3),),
            jnp.zeros((1, 10, 4, 1, 4, 2)), jnp.zeros((1, 10, 4, 1, 4)),
            query_tile=100)
