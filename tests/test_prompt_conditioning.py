"""Image-conditioned prompt encoding through prepare_inputs.

Every reference backend except FLUX conditions BOTH CFG halves' prompt
embeddings on the reference image(s):
  * Step1X passes ref_image= into encode_prompt for cond AND uncond
    (reference RegionE/Step1XEdit/inplace.py:235-256);
  * Qwen passes image=prompt_image, the input resized to the output
    resolution (RegionE/QwenImageEdit/inplace.py:220-252);
  * Plus passes image=condition_images, every reference resized to
    CONDITION_IMAGE_SIZE=384^2 area (RegionE/QwenImageEditPlus/
    inplace.py:53-54,236-278);
  * FLUX encode_prompt takes no image; its negative half uses the
    NEGATIVE pooled embedding (RegionE/FluxKontext/inplace.py:198-204,356).
"""

import numpy as np
import jax
import pytest

from regione_tpu.core.config import RegionEParams
from regione_tpu.models import vae as V
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.flux_kontext import FluxKontextPipeline
from regione_tpu.pipelines.qwen_image_edit import (
    QwenImageEditPipeline, QwenImageEditPlusPipeline, calculate_dimensions)
from regione_tpu.pipelines.step1x_edit import (
    Step1XEditPipeline, Step1XEditV1P2Pipeline)


class RecordingEncoder:
    """Stub prompt encoder: records every encode() call verbatim and returns
    per-prompt deterministic features (distinct pooled per prompt)."""

    def __init__(self, dim: int, pooled_dim: int | None = None,
                 t_for: dict | None = None, default_t: int = 6):
        self.dim = dim
        self.pooled_dim = pooled_dim
        self.t_for = t_for or {}
        self.default_t = default_t
        self.calls: list[tuple[str, object]] = []

    def encode(self, prompt: str, image=None):
        self.calls.append((prompt, image))
        t = self.t_for.get(prompt, self.default_t)
        rng = np.random.default_rng(abs(hash(prompt)) % (2**32))
        emb = rng.standard_normal((1, t, self.dim)).astype(np.float32)
        mask = np.ones((1, t), bool)
        pooled = (rng.standard_normal((1, self.pooled_dim)).astype(np.float32)
                  if self.pooled_dim else None)
        return emb, pooled, mask


def tiny_vae():
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    return vae_cfg, V.init_vae(jax.random.PRNGKey(1), vae_cfg)


def make_pipe(cls, preset, pooled_dim=None, **kw):
    cfg = get_config(preset)
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       capacity_granularity=8)
    pipe = cls(cfg, params, re, **kw)
    pipe.attach_vae(*tiny_vae())
    enc = RecordingEncoder(cfg.txt_in_dim, pooled_dim)
    pipe.attach_text_encoder(enc)
    return pipe, enc


IMG = (np.random.default_rng(3).random((48, 64, 3)) * 255).astype(np.uint8)


@pytest.mark.parametrize("cls,preset", [
    (Step1XEditPipeline, "tiny"),
    (Step1XEditV1P2Pipeline, "tiny"),
    (QwenImageEditPipeline, "tiny-qwen"),
])
def test_image_reaches_encoder_for_both_cfg_halves(cls, preset):
    pipe, enc = make_pipe(cls, preset, true_cfg_scale=4.0)
    assert pipe.do_cfg
    ctx, (w, h, gh, gw, _insize) = pipe.prepare_inputs(
        IMG, "add a red hat", "low quality", width=32, height=32)
    prompts = [c[0] for c in enc.calls]
    assert prompts == ["add a red hat", "low quality"]
    for _, image in enc.calls:
        assert image is not None, "CFG half encoded without the ref image"
        (im,) = image
        # Qwen/Step1X recipe: the edit target resized to the OUTPUT
        # resolution (reference prompt_image, QwenImageEdit/inplace.py:220)
        assert im.shape == (h, w, 3) and im.dtype == np.uint8


def test_flux_encoder_never_sees_the_image_and_uses_negative_pooled():
    pipe, enc = make_pipe(FluxKontextPipeline, "tiny-flux", pooled_dim=8,
                          true_cfg_scale=2.0)
    assert pipe.do_cfg
    ctx, _ = pipe.prepare_inputs(IMG, "make it night", "blurry",
                                 width=32, height=32)
    assert [c[0] for c in enc.calls] == ["make it night", "blurry"]
    for _, image in enc.calls:
        assert image is None, "FLUX T5/CLIP must not receive images"
    # negative pooled half == the NEGATIVE prompt's pooled embedding
    pooled = np.asarray(ctx.pooled)
    assert pooled.shape[0] == 2
    want_p = enc.encode("make it night")[1]
    want_n = enc.encode("blurry")[1]
    np.testing.assert_allclose(pooled[0], want_p[0], rtol=1e-5)
    np.testing.assert_allclose(pooled[1], want_n[0], rtol=1e-5)
    assert not np.allclose(pooled[0], pooled[1])


def test_plus_condition_images_resized_to_384_area():
    pipe, enc = make_pipe(QwenImageEditPlusPipeline, "tiny-qwen",
                          true_cfg_scale=4.0)
    pipe.vae_image_area = 32 * 32  # keep the tiny VAE tiny; encoder path
    # keeps the reference 384^2 condition recipe
    ref2 = (np.random.default_rng(4).random((40, 24, 3)) * 255).astype(np.uint8)
    ctx, _ = pipe.prepare_inputs([IMG, ref2], "merge", "bad",
                                 width=32, height=32)
    assert len(enc.calls) == 2
    for _, image in enc.calls:
        assert isinstance(image, list) and len(image) == 2
        for im, src in zip(image, [IMG, ref2]):
            ch, cw = im.shape[:2]
            # reference recipe: calculate_dimensions(384^2, src aspect, /32)
            want_w, want_h = calculate_dimensions(
                384 * 384, src.shape[1] / src.shape[0], 32)
            assert (cw, ch) == (want_w, want_h)
            assert cw % 32 == 0 and ch % 32 == 0
            assert abs(cw * ch - 384 * 384) / (384 * 384) < 0.25


def test_default_negative_prompt_per_backend():
    """Qwen family ships a single-space uncond (reference drivers pass
    negative_prompt=' ' explicitly); Step1X resolves to '' when an image
    is present.  Explicit negative prompts always win."""
    qp, qenc = make_pipe(QwenImageEditPipeline, "tiny-qwen",
                         true_cfg_scale=4.0)
    qp.prepare_inputs(IMG, "edit", width=32, height=32)
    assert [c[0] for c in qenc.calls] == ["edit", " "]

    sp, senc = make_pipe(Step1XEditPipeline, "tiny", true_cfg_scale=4.0)
    sp.prepare_inputs(IMG, "edit", width=32, height=32)
    assert [c[0] for c in senc.calls] == ["edit", ""]

    qp2, qenc2 = make_pipe(QwenImageEditPipeline, "tiny-qwen",
                           true_cfg_scale=4.0)
    qp2.prepare_inputs(IMG, "edit", negative_prompt="blurry",
                       width=32, height=32)
    assert [c[0] for c in qenc2.calls] == ["edit", "blurry"]


def test_plus_ref_vae_size_uses_per_image_area_not_target():
    pipe, _ = make_pipe(QwenImageEditPlusPipeline, "tiny-qwen",
                        true_cfg_scale=4.0)
    # reference: vae_image_sizes from VAE_IMAGE_SIZE and the REF's aspect
    w, h = pipe.ref_vae_size(512, 2048, 32, 32)
    ww, wh = calculate_dimensions(1024 * 1024, 512 / 2048, 32)
    assert (w, h) == (ww, wh)
    assert abs(w * h - 1024 * 1024) / (1024 * 1024) < 0.1


def test_cfg_halves_with_different_lengths_pad_and_mask():
    """Drop-and-repad yields different cond/uncond lengths (the reference
    runs two differently-shaped passes; we pad + bias-mask instead)."""
    pipe, enc = make_pipe(Step1XEditPipeline, "tiny", true_cfg_scale=4.0)
    enc.t_for = {"long prompt": 10, "": 4}
    ctx, _ = pipe.prepare_inputs(IMG, "long prompt", "", width=32, height=32)
    assert ctx.txt.shape == (2, 10, pipe.cfg.txt_in_dim)
    bias = np.asarray(ctx.txt_bias)
    # positive half: all 10 txt rows live; negative: rows 4.. masked
    assert (bias[0, 0, 0, :10] == 0).all()
    assert (bias[1, 0, 0, :4] == 0).all()
    assert (bias[1, 0, 0, 4:10] < -1e8).all()
    # image rows (beyond t_txt) stay unmasked for both halves
    assert (bias[:, 0, 0, 10:] == 0).all()
