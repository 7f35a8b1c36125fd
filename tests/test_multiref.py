"""Multi-reference (Plus) conditioning: S_cond != S_noise end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.core.config import RegionEParams
from regione_tpu.models import vae as V
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.models.text_encoders import MockTextEncoder
from regione_tpu.pipelines.base import EditInputs
from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPlusPipeline


def make_plus_pipe():
    cfg = get_config("tiny-qwen")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       capacity_granularity=8)
    pipe = QwenImageEditPlusPipeline(cfg, params, re, true_cfg_scale=4.0)
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(1), vae_cfg))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim, None, max_length=8))
    # shrink the reference 1024^2/384^2 dual-size areas to test scale
    pipe.vae_image_area = 32 * 32
    pipe.condition_image_area = 32 * 32
    return cfg, pipe


def test_latent_level_multiref_runs():
    """Edit with a condition sequence longer than the noise sequence (one
    target grid + one extra reference of a different grid)."""
    cfg, pipe = make_plus_pipe()
    grid = 8
    s = grid * grid
    s_extra = 4 * 6
    rng = np.random.default_rng(0)
    rope_img, rope_txt = pipe.build_rope(grid, grid, 8,
                                         cond_grids=[(grid, grid), (4, 6)])
    cos, _ = rope_img
    assert cos.shape[0] == s + s + s_extra  # noise + target-cond + extra-cond
    ctx = EditInputs(
        txt=jnp.asarray(rng.standard_normal((2, 8, cfg.txt_in_dim)), jnp.float32),
        cond_latent=jnp.asarray(
            rng.standard_normal((1, s + s_extra, cfg.in_channels)), jnp.float32),
        rope_img=rope_img, rope_txt=rope_txt,
    )
    lat0 = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)
    out, stats = pipe.edit_latents(lat0, ctx, grid, grid)
    assert out.shape == (1, s, cfg.in_channels)
    assert 0 < stats.edited_tokens < s
    # dense baseline with the same long condition also runs
    dense, _ = pipe.edit_latents(lat0, ctx, grid, grid, dense_only=True)
    assert dense.shape == out.shape
    assert np.isfinite(np.asarray(out)).all()


def test_image_level_multiref_call():
    cfg, pipe = make_plus_pipe()
    rng = np.random.default_rng(1)
    target = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    ref2 = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    out, stats = pipe([target, ref2], "put the object from the second image "
                      "into the first", width=32, height=32, seed=5)
    assert out.shape[-1] == 3 and stats is not None
