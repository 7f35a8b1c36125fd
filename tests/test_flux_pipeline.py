"""FLUX.1 Kontext path: guidance-embedding (distilled) single forward,
resolution snapping, and oracle parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regione_tpu.core.config import RegionEParams
from regione_tpu.core.gamma import gamma_for
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.base import EditInputs
from regione_tpu.pipelines.flux_kontext import (
    FluxKontextPipeline, snap_kontext_resolution)
from tests.oracle import oracle_edit

GRID = 8
S = GRID * GRID
T_TXT = 4


def test_resolution_snap():
    # square input -> 1024x1024 (in the preferred list)
    assert snap_kontext_resolution(800, 800) == (1024, 1024)
    # 16:9 (1.78) is closest to 1392/752 (1.85)
    assert snap_kontext_resolution(1920, 1080) == (1392, 752)


def test_flux_guidance_embed_matches_oracle():
    cfg = get_config("tiny-flux")
    params = init_mmdit(jax.random.PRNGKey(11), cfg)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       cache_threshold=0.05, capacity_granularity=8)
    pipe = FluxKontextPipeline(cfg, params, re,
                               gamma=gamma_for("flux-kontext"),
                               guidance_scale=2.5)
    assert not pipe.do_cfg  # distilled: single forward with guidance embed

    rng = np.random.default_rng(2)
    txt = rng.standard_normal((1, T_TXT, cfg.txt_in_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32)
    cond = rng.standard_normal((1, S, cfg.in_channels)).astype(np.float32)
    lat0 = rng.standard_normal((1, S, cfg.in_channels)).astype(np.float32)
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    ctx = EditInputs(
        txt=jnp.asarray(txt), cond_latent=jnp.asarray(cond),
        rope_img=rope_img, rope_txt=rope_txt, pooled=jnp.asarray(pooled),
        guidance=jnp.full((1,), 2.5, jnp.float32),
    )
    got, stats = pipe.edit_latents(jnp.asarray(lat0), ctx, GRID, GRID)
    want, _ = oracle_edit(
        params, cfg, re, gamma_for("flux-kontext"), lat0, cond, txt,
        GRID, GRID, pooled=pooled, guidance=2.5)
    assert 0 < stats.edited_tokens < S
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
    # guidance value actually matters
    ctx2 = EditInputs(
        txt=ctx.txt, cond_latent=ctx.cond_latent, rope_img=rope_img,
        rope_txt=rope_txt, pooled=ctx.pooled,
        guidance=jnp.full((1,), 7.5, jnp.float32))
    got2, _ = pipe.edit_latents(jnp.asarray(lat0), ctx2, GRID, GRID)
    assert not np.allclose(np.asarray(got), np.asarray(got2))
