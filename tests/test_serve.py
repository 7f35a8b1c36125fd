"""EditService: overlapped-prep serving over the tiny pipeline."""

import numpy as np
import jax
import pytest

from regione_tpu.core.config import RegionEParams
from regione_tpu.models import vae as V
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.models.text_encoders import MockTextEncoder
from regione_tpu.pipelines.serve import EditRequest, EditService
from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline


def test_edit_service_batch():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    pipe = Step1XEditPipeline(cfg, params, RegionEParams(
        threshold=0.0, erosion_dilation=False, capacity_granularity=8))
    pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(1), vae_cfg))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, cfg.pooled_dim,
                                             max_length=8))
    svc = EditService(pipe, use_regione=True)
    rng = np.random.default_rng(0)
    reqs = [EditRequest(
        image=(rng.random((32, 32, 3)) * 255).astype(np.uint8),
        prompt=f"edit {i}", width=32, height=32, seed=i) for i in range(3)]
    results = svc.run(reqs)
    assert len(results) == 3
    for r in results:
        assert r.image.dtype == np.uint8 and r.image.shape[-1] == 3
        assert r.latency_s > 0 and r.prep_s >= 0
        assert r.stats is not None
    # second/third requests reuse the compiled sampler: much faster
    assert results[2].latency_s < results[0].latency_s


def test_edit_service_batched_grouping():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(2), cfg)
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    pipe = Step1XEditPipeline(cfg, params, RegionEParams(
        threshold=0.0, erosion_dilation=False, capacity_granularity=8))
    pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(3), vae_cfg))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, cfg.pooled_dim,
                                             max_length=8))
    svc = EditService(pipe, use_regione=True)
    rng = np.random.default_rng(1)
    reqs = [EditRequest(
        image=(rng.random((32, 32, 3)) * 255).astype(np.uint8),
        prompt=f"edit {i}", width=32, height=32, seed=i) for i in range(3)]
    results = svc.run_batched(reqs, max_batch=2)  # 2 groups: [0,1], [2]
    assert len(results) == 3
    for r in results:
        assert r.image.dtype == np.uint8 and np.isfinite(r.latency_s)
        # per-image stats + honest group latency accounting
        assert r.stats.edited_tokens >= 0
        assert r.group_latency_s == pytest.approx(
            r.latency_s * r.group_size)
    assert [r.group_size for r in results] == [2, 2, 1]
    assert results[0].group_latency_s == results[1].group_latency_s


def test_batched_grouping_splits_multiref_condition_lengths():
    """Requests whose condition sequences differ (multi-reference vs
    single-image) must land in SEPARATE vmapped groups — stacking them
    would fail on the cond_latent axis."""
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models import vae as V
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.models.text_encoders import MockTextEncoder
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPlusPipeline
    from regione_tpu.pipelines.serve import EditRequest, EditService
    import jax

    cfg = get_config("tiny-qwen")
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       capacity_granularity=8)
    pipe = QwenImageEditPlusPipeline(
        cfg, init_mmdit(jax.random.PRNGKey(0), cfg), re, true_cfg_scale=4.0)
    vc = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                     norm_num_groups=4, layers_per_block=1)
    pipe.attach_vae(vc, V.init_vae(jax.random.PRNGKey(1), vc))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, None,
                                             max_length=8))
    pipe.vae_image_area = 32 * 32
    pipe.condition_image_area = 32 * 32
    rng = np.random.default_rng(0)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    ref = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    svc = EditService(pipe)
    reqs = [EditRequest(image=[img, ref], prompt="a", width=32, height=32),
            EditRequest(image=[img, ref], prompt="b", width=32, height=32),
            EditRequest(image=img, prompt="c", width=32, height=32)]
    res = svc.run_batched(reqs, max_batch=4)
    assert [r.group_size for r in res] == [2, 2, 1]
    for r in res:
        assert r.image.shape == (32, 32, 3) and r.image.dtype == np.uint8


def test_batched_grouping_splits_equal_length_different_rope():
    """Equal-LENGTH condition sequences can still decompose into different
    grids (transposed-aspect Plus refs): the group key must split on rope
    CONTENT, not just cond length — the whole group rides the first
    request's rope tables (pipelines/base.py edit_latents_batch)."""
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models import vae as V
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.models.text_encoders import MockTextEncoder
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPlusPipeline
    from regione_tpu.pipelines.serve import (EditRequest, EditService,
                                             _rope_digest)
    import jax

    cfg = get_config("tiny-qwen")
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       capacity_granularity=8)
    pipe = QwenImageEditPlusPipeline(
        cfg, init_mmdit(jax.random.PRNGKey(0), cfg), re, true_cfg_scale=4.0)
    vc = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                     norm_num_groups=4, layers_per_block=1)
    pipe.attach_vae(vc, V.init_vae(jax.random.PRNGKey(1), vc))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, None,
                                             max_length=8))
    pipe.vae_image_area = 16 * 64
    pipe.condition_image_area = 32 * 32
    rng = np.random.default_rng(0)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    ref_wide = (rng.random((16, 64, 3)) * 255).astype(np.uint8)
    ref_tall = np.transpose(ref_wide, (1, 0, 2)).copy()
    svc = EditService(pipe)
    reqs = [EditRequest(image=[img, ref_wide], prompt="a",
                        width=32, height=32),
            EditRequest(image=[img, ref_tall], prompt="b",
                        width=32, height=32)]

    # pin the scenario: same cond length, different rope tables
    (ctx_a, *_), _ = svc._prepare(reqs[0])
    (ctx_b, *_), _ = svc._prepare(reqs[1])
    assert ctx_a.cond_latent.shape[-2] == ctx_b.cond_latent.shape[-2]
    assert _rope_digest(ctx_a) != _rope_digest(ctx_b)

    res = svc.run_batched(reqs, max_batch=4)
    assert [r.group_size for r in res] == [1, 1]
    for r in res:
        assert r.image.shape == (32, 32, 3) and r.image.dtype == np.uint8

    # and the batch entry point itself refuses a mixed group
    with pytest.raises(ValueError, match="rope"):
        pipe.edit_latents_batch(
            [np.zeros((1, 16, cfg.in_channels), np.float32)] * 2,
            [ctx_a, ctx_b], 4, 4)


from tests.test_output_geometry import snapped_area_policy

# the resize-back logic is policy-independent; the real policy would snap
# to a 1024^2-area grid far too large for a CPU test
_tiny_area_policy = snapped_area_policy(32 * 32)


def test_edit_service_restores_input_geometry(monkeypatch):
    """Serve surface must match pipe.__call__'s output-geometry parity
    (the reference plugin's _output_process_image): a request WITHOUT an
    explicit width/height comes back at the caller's original size, even
    when the pipeline snapped to a different processing resolution; an
    explicit size is honored as-is."""
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(4), cfg)
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    pipe = Step1XEditPipeline(cfg, params, RegionEParams(
        threshold=0.0, erosion_dilation=False, capacity_granularity=8))
    pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(5), vae_cfg))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, cfg.pooled_dim,
                                             max_length=8))
    monkeypatch.setattr(type(pipe), "target_resolution", _tiny_area_policy)
    svc = EditService(pipe, use_regione=True)
    rng = np.random.default_rng(2)
    img = (rng.random((40, 24, 3)) * 255).astype(np.uint8)  # h=40, w=24

    # no explicit size -> restored to the input geometry
    [r] = svc.run([EditRequest(image=img, prompt="edit", seed=0)])
    assert r.image.shape[:2] == (40, 24), r.image.shape
    [rb] = svc.run_batched([EditRequest(image=img, prompt="edit", seed=0)])
    assert rb.image.shape[:2] == (40, 24), rb.image.shape

    # explicit size -> kept at the requested resolution
    [re_] = svc.run([EditRequest(image=img, prompt="edit",
                                 width=32, height=32, seed=0)])
    assert re_.image.shape[:2] == (32, 32), re_.image.shape

    # PARTIAL size (width only) is a hint, not an output geometry —
    # matches base.py __call__'s `width is not None AND height is not
    # None` rule, so the result is still restored to the input size
    [rp] = svc.run([EditRequest(image=img, prompt="edit",
                                width=32, seed=0)])
    assert rp.image.shape[:2] == (40, 24), rp.image.shape
