"""Full-size preset bring-up (abstract): every production preset must
instantiate, match its published parameter count, and trace a full
cache-write forward at production token geometry — all via jax.eval_shape,
so no memory is allocated (the real 12B/20B tensors don't fit test CPUs).

Published sizes: Step1X-Edit / FLUX.1 ~12B (19 double + 38 single,
hidden 3072); Qwen-Image ~20B (60 joint blocks).  SURVEY.md §2.4."""

import jax
import jax.numpy as jnp
import pytest

from regione_tpu.models.mmdit import (
    MODE_WRITE,
    init_cache,
    init_mmdit,
    mmdit_forward,
)
from regione_tpu.models.presets import get_config

# preset -> (published params, tolerance): the connector/backbone split of
# Step1X is not published tensor-by-tensor, so ranges are +-8%.
EXPECTED_PARAMS = {
    "step1x-edit": (12.3e9, 0.08),
    "step1x-edit-v1p2": (12.3e9, 0.08),
    "flux-kontext": (12.0e9, 0.08),
    "qwen-image-edit": (20.4e9, 0.08),
    "qwen-image-edit-plus": (20.4e9, 0.08),
}


def _abstract_params(cfg):
    return jax.eval_shape(lambda k: init_mmdit(k, cfg), jax.random.PRNGKey(0))


@pytest.mark.parametrize("preset", sorted(EXPECTED_PARAMS))
def test_fullsize_param_count_matches_published(preset):
    cfg = get_config(preset)
    shapes = _abstract_params(cfg)
    import math
    n = sum(math.prod(l.shape) for l in jax.tree.leaves(shapes))
    want, tol = EXPECTED_PARAMS[preset]
    assert abs(n - want) / want < tol, (
        f"{preset}: {n/1e9:.2f}B params vs published {want/1e9:.1f}B")


@pytest.mark.parametrize("preset", sorted(EXPECTED_PARAMS))
def test_fullsize_forward_traces_at_production_geometry(preset):
    """Cache-write dense forward over 1024^2 tokens (64x64 grid, CFG pair)
    traces with the right output shapes — catches any shape bug that only
    appears at full width/depth (head splits, fused linear1 columns...)."""
    cfg = get_config(preset)
    grid, t_txt, b = 64, 128, 2
    s_kv = 2 * grid * grid

    params = _abstract_params(cfg)
    rope_dim = sum(cfg.axes_dims)   # == head_dim
    rope_img = (jax.ShapeDtypeStruct((s_kv, rope_dim), jnp.float32),) * 2
    rope_txt = (jax.ShapeDtypeStruct((t_txt, rope_dim), jnp.float32),) * 2

    def fwd(params):
        img = jnp.zeros((b, s_kv, cfg.in_channels), cfg.dtype)
        txt = jnp.zeros((b, t_txt, cfg.txt_in_dim), cfg.dtype)
        t = jnp.full((b,), 0.9, cfg.dtype)
        ri = tuple(jnp.zeros(r.shape, r.dtype) for r in rope_img)
        rt = tuple(jnp.zeros(r.shape, r.dtype) for r in rope_txt)
        pooled = (jnp.zeros((b, cfg.pooled_dim), cfg.dtype)
                  if cfg.pooled_dim else None)
        guidance = jnp.full((b,), 3.5, jnp.float32) if cfg.guidance_embed else None
        cache = init_cache(cfg, b, s_kv, t_txt)
        v, cache = mmdit_forward(params, cfg, img, txt, t, ri, rt,
                                 pooled=pooled, guidance=guidance,
                                 mode=MODE_WRITE, cache=cache)
        return v, cache

    v, cache = jax.eval_shape(fwd, params)
    assert v.shape == (b, s_kv, cfg.out_channels)
    assert cache["dk"].shape == (cfg.depth_double, b, cfg.heads, s_kv,
                                 cfg.head_dim)
    if cfg.depth_single:
        # image rows only — txt rows re-embed every step and are not cached
        assert cache["sk"].shape == (cfg.depth_single, b, cfg.heads,
                                     s_kv, cfg.head_dim)
