"""Backbone architecture presets.

Full-size presets mirror the published architectures of the reference's five
backends (for weight conversion); "dev" presets are scaled-down versions of
the same topology for single-chip benchmarking (a TPU v5e chip has 16 GB HBM
— the 12B/20B full models need the tensor-parallel path in
regione_tpu.parallel); "tiny" is for CPU unit tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from regione_tpu.models.connector import ConnectorConfig
from regione_tpu.models.mmdit import MMDiTConfig

PRESETS: dict[str, MMDiTConfig] = {
    # Step1X-Edit v1.1/v1.2: FLUX-topology MMDiT, Qwen2.5-VL text features
    # via connector (reference patched forward inplace.py:460-580).
    "step1x-edit": MMDiTConfig(
        hidden=3072, heads=24, head_dim=128, depth_double=19, depth_single=38,
        txt_in_dim=3584, pooled_dim=768, guidance_embed=False,
        axes_dims=(16, 56, 56),
        connector=ConnectorConfig(in_dim=3584, hidden=3584, heads=28,
                                  depth=2, pooled_dim=768),
    ),
    "step1x-edit-v1p2": MMDiTConfig(
        hidden=3072, heads=24, head_dim=128, depth_double=19, depth_single=38,
        txt_in_dim=3584, pooled_dim=768, guidance_embed=False,
        axes_dims=(16, 56, 56),
        connector=ConnectorConfig(in_dim=3584, hidden=3584, heads=28,
                                  depth=2, pooled_dim=768),
    ),
    # FLUX.1 Kontext dev: guidance-distilled (embedded guidance scale).
    "flux-kontext": MMDiTConfig(
        hidden=3072, heads=24, head_dim=128, depth_double=19, depth_single=38,
        txt_in_dim=4096, pooled_dim=768, guidance_embed=True,
        axes_dims=(16, 56, 56),
    ),
    # Qwen-Image-Edit: 60 joint double-stream blocks, no single blocks,
    # no pooled projection (reference RegionE/QwenImageEdit/inplace.py).
    "qwen-image-edit": MMDiTConfig(
        hidden=3072, heads=24, head_dim=128, depth_double=60, depth_single=0,
        txt_in_dim=3584, pooled_dim=0, guidance_embed=False,
        axes_dims=(16, 56, 56), txt_norm=True,
    ),
    "qwen-image-edit-plus": MMDiTConfig(
        hidden=3072, heads=24, head_dim=128, depth_double=60, depth_single=0,
        txt_in_dim=3584, pooled_dim=0, guidance_embed=False,
        axes_dims=(16, 56, 56), txt_norm=True,
    ),
    # scaled-down single-chip benchmarking configs (same topology)
    "step1x-edit:dev": MMDiTConfig(
        hidden=1536, heads=12, head_dim=128, depth_double=8, depth_single=16,
        txt_in_dim=1024, pooled_dim=768, guidance_embed=False,
        axes_dims=(16, 56, 56),
    ),
    "flux-kontext:dev": MMDiTConfig(
        hidden=1536, heads=12, head_dim=128, depth_double=8, depth_single=16,
        txt_in_dim=1024, pooled_dim=768, guidance_embed=True,
        axes_dims=(16, 56, 56),
    ),
    "qwen-image-edit:dev": MMDiTConfig(
        hidden=1536, heads=12, head_dim=128, depth_double=24, depth_single=0,
        txt_in_dim=1024, pooled_dim=0, guidance_embed=False,
        axes_dims=(16, 56, 56), txt_norm=True,
    ),
    # CPU unit-test config
    "tiny": MMDiTConfig(
        hidden=32, heads=2, head_dim=16, depth_double=2, depth_single=2,
        txt_in_dim=16, pooled_dim=8, guidance_embed=False,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32,
    ),
    # tiny mirror of the full Step1X architecture (connector-bearing), for
    # converter roundtrips and CPU pipeline tests of the connector path
    "tiny-step1x": MMDiTConfig(
        hidden=32, heads=2, head_dim=16, depth_double=2, depth_single=2,
        txt_in_dim=16, pooled_dim=8, guidance_embed=False,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32,
        connector=ConnectorConfig(in_dim=16, hidden=16, heads=2, depth=2,
                                  pooled_dim=8, time_embed_dim=32,
                                  dtype=jnp.float32),
    ),
    "tiny-flux": MMDiTConfig(
        hidden=32, heads=2, head_dim=16, depth_double=2, depth_single=2,
        txt_in_dim=16, pooled_dim=8, guidance_embed=True,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32,
    ),
    # virtual-mesh sharding tests / driver dryrun: head count (8) and all
    # feature dims divisible by tp=4 so the (dp=2, tp=4) mesh genuinely
    # shards every rule in regione_tpu.parallel.sharding.
    "tiny-tp": MMDiTConfig(
        hidden=128, heads=8, head_dim=16, depth_double=2, depth_single=2,
        txt_in_dim=16, pooled_dim=8, guidance_embed=False,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32,
    ),
    "tiny-qwen": MMDiTConfig(
        hidden=32, heads=2, head_dim=16, depth_double=3, depth_single=0,
        txt_in_dim=16, pooled_dim=0, guidance_embed=False,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32, txt_norm=True,
    ),
    # Qwen topology for TP execution tests / driver dryrun: joint double
    # blocks only + txt_norm (the Qwen-specific surface), heads (8) and all
    # feature dims divisible by tp=4.
    "tiny-qwen-tp": MMDiTConfig(
        hidden=128, heads=8, head_dim=16, depth_double=3, depth_single=0,
        txt_in_dim=16, pooled_dim=0, guidance_embed=False,
        axes_dims=(4, 6, 6), time_embed_dim=32, mlp_ratio=2.0,
        in_channels=8, out_channels=8, dtype=jnp.float32, txt_norm=True,
    ),
}


def get_config(name: str) -> MMDiTConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; known: {sorted(PRESETS)}") from None
