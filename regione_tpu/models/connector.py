"""Step1X-Edit text connector (timestep-conditioned token refiner).

The Step1X backends do not feed VL-encoder features straight into the DiT:
a learned connector refines them PER TIMESTEP and produces the pooled
vector y for the AdaLN stack — `encoder_hidden_states, y =
self.connector(encoder_hidden_states, timestep, prompt_embeds_mask)` inside
the patched transformer forward (reference RegionE/Step1XEdit/
inplace.py:514-520).  Because it is timestep-dependent, it must run inside
the jitted model forward, not at prompt-encoding time.

Structure mirrors the public Step1X-Edit `Qwen2Connector`
(single-token-refiner + global projection), so converted checkpoints map
tensor-for-tensor (weights/convert.py `convert_connector`):

  * refiner: input_embedder linear, timestep MLP (t_embedder.mlp.0/.2),
    context MLP over the masked mean of the RAW VL features
    (c_embedder.linear_1/.2), then `depth` blocks of
    LayerNorm -> self-attention -> LayerNorm -> MLP with per-block
    gate-only AdaLN modulation from silu(temb + cemb)
    (adaLN_modulation = [SiLU, Linear(h, 2h)]).
  * pooled head: `y = global_proj_out(masked_mean(raw_feats) *
    (1 + scale_factor))` — a single linear from the RAW feature mean
    (NOT the refined tokens), with a learned scalar scale.

Both heads read the raw features; only the refined tokens pass through the
blocks.  The reference invokes this per timestep inside the transformer
forward (RegionE/Step1XEdit/inplace.py:514-520), so it lives inside the
jitted model forward here too.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from regione_tpu.models.layers import (
    init_linear,
    init_mlp_embed,
    layernorm,
    linear,
    mlp_embed,
    sdpa,
    split_heads,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class ConnectorConfig:
    in_dim: int = 3584          # VL encoder feature dim (Qwen2.5-VL)
    hidden: int = 3584
    heads: int = 28
    depth: int = 2
    pooled_dim: int = 768
    time_embed_dim: int = 256
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16


def connector_apply(p, cfg: ConnectorConfig, feats, t, mask=None):
    """feats: [B, T, in_dim]; t: [B] sigma; mask: [B, T] bool or None.
    Returns (refined [B, T, hidden], y [B, pooled_dim])."""
    dt = cfg.dtype
    if mask is None:
        mask_f = jnp.ones(feats.shape[:2], jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)
    denom = jnp.maximum(mask_f.sum(-1, keepdims=True), 1.0)
    # masked mean of the RAW VL features feeds both the context embed and
    # the global pooled head (Qwen2Connector.forward / SingleTokenRefiner)
    ctx = (feats.astype(jnp.float32) * mask_f[..., None]).sum(1) / denom
    y = linear(p["global_proj"],
               (ctx * (1.0 + p["scale_factor"].astype(jnp.float32))).astype(dt))

    x = linear(p["in_proj"], feats.astype(dt))
    temb = mlp_embed(p["t_embed"],
                     timestep_embedding(t, cfg.time_embed_dim).astype(dt))
    cemb = mlp_embed(p["c_embed"], ctx.astype(dt))
    c = jax.nn.silu(temb + cemb)

    bias = None
    if mask is not None:
        bias = jnp.where(mask, 0.0, -1e9)[:, None, None, :].astype(jnp.float32)

    def body(x, pl):
        gate_msa, gate_mlp = jnp.split(
            linear(pl["mod"], c)[:, None, :], 2, axis=-1)
        h = layernorm(x, scale=pl["norm1"]["scale"], bias=pl["norm1"]["bias"])
        q = split_heads(linear(pl["attn"]["q"], h), cfg.heads)
        k = split_heads(linear(pl["attn"]["k"], h), cfg.heads)
        v = split_heads(linear(pl["attn"]["v"], h), cfg.heads)
        x = x + gate_msa * linear(pl["attn"]["out"], sdpa(q, k, v, bias=bias))
        h2 = layernorm(x, scale=pl["norm2"]["scale"], bias=pl["norm2"]["bias"])
        x = x + gate_mlp * linear(
            pl["mlp"]["out"], jax.nn.silu(linear(pl["mlp"]["in"], h2)))
        return x, None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    return x, y


def init_connector(key, cfg: ConnectorConfig):
    dt = cfg.dtype
    h = cfg.hidden
    mh = int(h * cfg.mlp_ratio)
    keys = jax.random.split(key, 8)

    def init_block(k):
        ks = jax.random.split(k, 7)
        return {
            "norm1": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "norm2": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "attn": {"q": init_linear(ks[0], h, h, dt),
                     "k": init_linear(ks[1], h, h, dt),
                     "v": init_linear(ks[2], h, h, dt),
                     "out": init_linear(ks[3], h, h, dt)},
            "mlp": {"in": init_linear(ks[4], h, mh, dt),
                    "out": init_linear(ks[5], mh, h, dt)},
            "mod": init_linear(ks[6], h, 2 * h, dt),
        }

    return {
        "in_proj": init_linear(keys[0], cfg.in_dim, h, dt),
        "t_embed": init_mlp_embed(keys[1], cfg.time_embed_dim, h, dt),
        "c_embed": init_mlp_embed(keys[2], cfg.in_dim, h, dt),
        "global_proj": init_linear(keys[3], cfg.in_dim, cfg.pooled_dim, dt),
        # reference init: scale_factor = -(1 - 0.09), i.e. (1+sf) = 0.09
        "scale_factor": jnp.full((1,), -0.91, dt),
        "blocks": jax.vmap(init_block)(jax.random.split(keys[5], cfg.depth)),
    }
