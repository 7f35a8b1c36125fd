"""Batched (vmapped) multi-image sampling must match per-image results."""

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.core.config import RegionEParams
from regione_tpu.core.gamma import gamma_for
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.base import EditInputs, EditPipelineBase

GRID = 8
S = GRID * GRID
T_TXT = 4
B = 3


def test_batch_matches_per_image():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       cache_threshold=0.05, capacity_granularity=8)
    pipe = EditPipelineBase(cfg, params, re, gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)

    rng = np.random.default_rng(0)
    lat_list, ctx_list = [], []
    for i in range(B):
        ctx_list.append(EditInputs(
            txt=jnp.asarray(rng.standard_normal((1, T_TXT, cfg.txt_in_dim)),
                            jnp.float32),
            cond_latent=jnp.asarray(
                rng.standard_normal((1, S, cfg.in_channels)), jnp.float32),
            rope_img=rope_img, rope_txt=rope_txt,
            pooled=jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                               jnp.float32),
        ))
        lat_list.append(jnp.asarray(
            rng.standard_normal((1, S, cfg.in_channels)), jnp.float32))

    outs_b, stats_b = pipe.edit_latents_batch(lat_list, ctx_list, GRID, GRID)
    assert len(outs_b) == B and len(stats_b) == B
    assert stats_b[0].capacity >= 8

    # per-image reference (pin the shared capacity so shapes match exactly)
    pipe2 = EditPipelineBase(cfg, params, re.replace(
        rags_capacity=stats_b[0].capacity), gamma=gamma_for("step1x-edit"))
    for i in range(B):
        ref, st = pipe2.edit_latents(lat_list[i], ctx_list[i], GRID, GRID)
        assert 0 < st.edited_tokens < S
        # batched stats are per-image, not group max (serve.py honesty)
        assert stats_b[i].edited_tokens == st.edited_tokens
        np.testing.assert_allclose(np.asarray(outs_b[i]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"image {i}")


def test_batch_matches_per_image_int4_cache():
    """The vmapped group program under nibble-packed int4 KV caches must
    match the single-image sampler bit-for-bit (same packed cache math on
    both sides).  This is the path scripts/bench_serve_batch.py
    --cache-int4 exercises to fit batch 4 on one v5e (SERVE_r05_B4.json
    recorded int8 caches OOMing at 17.24 GiB of 15.75)."""
    import dataclasses

    cfg = dataclasses.replace(get_config("tiny"), cache_int4=True)
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       cache_threshold=0.05, capacity_granularity=8)
    pipe = EditPipelineBase(cfg, params, re, gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)

    rng = np.random.default_rng(7)
    lat_list, ctx_list = [], []
    for i in range(2):
        ctx_list.append(EditInputs(
            txt=jnp.asarray(rng.standard_normal((1, T_TXT, cfg.txt_in_dim)),
                            jnp.float32),
            cond_latent=jnp.asarray(
                rng.standard_normal((1, S, cfg.in_channels)), jnp.float32),
            rope_img=rope_img, rope_txt=rope_txt,
            pooled=jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                               jnp.float32),
        ))
        lat_list.append(jnp.asarray(
            rng.standard_normal((1, S, cfg.in_channels)), jnp.float32))

    outs_b, stats_b = pipe.edit_latents_batch(lat_list, ctx_list, GRID, GRID)
    pipe2 = EditPipelineBase(cfg, params, re.replace(
        rags_capacity=stats_b[0].capacity), gamma=gamma_for("step1x-edit"))
    for i in range(2):
        ref, st = pipe2.edit_latents(lat_list[i], ctx_list[i], GRID, GRID)
        assert stats_b[i].edited_tokens == st.edited_tokens
        np.testing.assert_allclose(np.asarray(outs_b[i]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"image {i}")
