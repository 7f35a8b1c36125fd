"""Wan 2.1 VAE (Qwen-Image family) — single-frame image path in JAX.

Qwen-Image-Edit ships `AutoencoderKLWan`, a causal-3D video VAE, but the
reference only ever feeds it single still frames (`src/Qwen-Image/main.py`
loads it via from_pretrained; every edit is one image).  For one frame a
causal temporal convolution reduces exactly to its LAST temporal tap — the
(k_t - 1) leading taps see only causal zero padding — so at conversion time
every 3-D kernel folds to a 2-D kernel (`weights.convert.convert_wan_vae`)
and the whole model runs as plain NHWC 2-D convs on the MXU.  The fold is
proven against a from-scratch causal-conv3d oracle in
tests/test_wan_vae.py; multi-frame video decode is out of scope (the
reference never uses it).

Differences from the Flux AutoencoderKL (models/vae.py):
  * RMS norms over channels (WanRMS_norm: x / ||x||_2(C) * sqrt(C) * gamma)
    instead of group norms;
  * resamples change channel count on upsample (C -> C/2) and the
    encoder/decoder level dims follow [1] + dim_mult / reversed;
  * extra quant_conv / post_quant_conv 1x1 projections around the latent;
  * latent normalization is per-channel (z - latents_mean) / latents_std
    (diffusers QwenImagePipeline convention), not scalar scale/shift.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from regione_tpu.models.vae import conv2d


# Wan 2.1 VAE defaults (diffusers AutoencoderKLWan config for Qwen-Image).
_WAN_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
_WAN_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16       # z_dim
    base_dim: int = 96
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    latents_mean: tuple = _WAN_LATENTS_MEAN
    latents_std: tuple = _WAN_LATENTS_STD
    dtype: Any = jnp.float32

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def encoder_dims(self) -> list[int]:
        return [self.base_dim * m for m in (1,) + tuple(self.dim_mult)]

    @property
    def decoder_dims(self) -> list[int]:
        m = tuple(self.dim_mult)
        return [self.base_dim * u for u in (m[-1],) + m[::-1]]


def rms_norm(p, x, eps: float = 1e-12):
    """WanRMS_norm: L2-normalize over channels, rescale by sqrt(C) * gamma
    (+ optional bias).  NHWC, fp32 math."""
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, -1, keepdims=True))
    y = xf / jnp.maximum(n, eps) * math.sqrt(x.shape[-1]) * p["gamma"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def resnet_block(p, x):
    h = conv2d(p["conv1"], jax.nn.silu(rms_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], jax.nn.silu(rms_norm(p["norm2"], h)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def attn_block(p, x):
    """Single-head spatial self-attention (WanAttentionBlock): RMS norm,
    fused 1x1 qkv conv, SDPA over spatial positions, 1x1 proj, residual."""
    b, h, w, c = x.shape
    y = rms_norm(p["norm"], x).reshape(b, h * w, c)
    qkv = y @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("btd,bsd->bts", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    att = jax.nn.softmax(logits, -1).astype(y.dtype)
    o = jnp.einsum("bts,bsd->btd", att, v) @ p["proj"]["w"] + p["proj"]["b"]
    return x + o.reshape(b, h, w, c)


def _mid(p, x):
    x = resnet_block(p["res1"], x)
    x = attn_block(p["attn"], x)
    return resnet_block(p["res2"], x)


def encode(params, cfg: WanVAEConfig, images: jnp.ndarray,
           key: jax.Array | None = None) -> jnp.ndarray:
    """[B, H, W, 3] in [-1, 1] -> latent [B, H/8, W/8, z].  Deterministic
    posterior mode by default; pass `key` to sample."""
    x = conv2d(params["conv_in"], images.astype(cfg.dtype))
    for blk in params["down"]:
        for rp in blk["resnets"]:
            x = resnet_block(rp, x)
        if "downsample" in blk:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(blk["downsample"], x, stride=2, padding=0)
    x = _mid(params["mid"], x)
    x = conv2d(params["conv_out"], jax.nn.silu(rms_norm(params["norm_out"], x)))
    x = conv2d(params["quant_conv"], x, padding=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean


def decode(params, cfg: WanVAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, H/8, W/8, z] (already de-normalized) -> [B, H, W, 3]."""
    x = conv2d(params["post_quant_conv"], latents.astype(cfg.dtype), padding=0)
    x = conv2d(params["conv_in"], x)
    x = _mid(params["mid"], x)
    for blk in params["up"]:
        for rp in blk["resnets"]:
            x = resnet_block(rp, x)
        if "upsample" in blk:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = conv2d(blk["upsample"], x)   # halves channels
    x = conv2d(params["conv_out"], jax.nn.silu(rms_norm(params["norm_out"], x)))
    return x


def normalize_latents(cfg: WanVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """encoder output -> DiT latent space: (z - mean) / std per channel."""
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return (z - mean) / std


def denormalize_latents(cfg: WanVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return z * std + mean


# ---------------------------------------------------------------------------
# init (tests / synthesized checkpoints)
# ---------------------------------------------------------------------------

def _conv(key, kh, kw, cin, cout, dtype):
    lim = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), dtype, -lim, lim),
            "b": jnp.zeros((cout,), dtype)}


def _rms(c, dtype):
    return {"gamma": jnp.ones((c,), dtype)}


def _res(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _rms(cin, dtype), "conv1": _conv(k1, 3, 3, cin, cout, dtype),
         "norm2": _rms(cout, dtype), "conv2": _conv(k2, 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["shortcut"] = _conv(k3, 1, 1, cin, cout, dtype)
    return p


def _attn(key, c, dtype):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / math.sqrt(c)
    return {
        "norm": _rms(c, dtype),
        "qkv": {"w": jax.random.uniform(k1, (c, 3 * c), dtype, -lim, lim),
                "b": jnp.zeros((3 * c,), dtype)},
        "proj": {"w": jax.random.uniform(k2, (c, c), dtype, -lim, lim),
                 "b": jnp.zeros((c,), dtype)},
    }


def init_wan_vae(key, cfg: WanVAEConfig):
    dt = cfg.dtype
    keys = iter(jax.random.split(key, 256))
    edims = cfg.encoder_dims     # e.g. [96, 96, 192, 384, 384]
    z = cfg.latent_channels

    enc_levels = []
    for i, (cin, cout) in enumerate(zip(edims[:-1], edims[1:])):
        blk = {"resnets": []}
        d = cin
        for _ in range(cfg.num_res_blocks):
            blk["resnets"].append(_res(next(keys), d, cout, dt))
            d = cout
        if i != len(cfg.dim_mult) - 1:
            blk["downsample"] = _conv(next(keys), 3, 3, cout, cout, dt)
        enc_levels.append(blk)
    c_mid = edims[-1]
    params = {
        "conv_in": _conv(next(keys), 3, 3, cfg.in_channels, edims[0], dt),
        "down": enc_levels,
        "mid": {"res1": _res(next(keys), c_mid, c_mid, dt),
                "attn": _attn(next(keys), c_mid, dt),
                "res2": _res(next(keys), c_mid, c_mid, dt)},
        "norm_out": _rms(c_mid, dt),
        "conv_out": _conv(next(keys), 3, 3, c_mid, 2 * z, dt),
        "quant_conv": _conv(next(keys), 1, 1, 2 * z, 2 * z, dt),
    }
    enc = params

    ddims = cfg.decoder_dims     # e.g. [384, 384, 384, 192, 96]
    dec_levels = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        d = cin if i == 0 else cin // 2   # upsample halved the channels
        blk = {"resnets": []}
        for _ in range(cfg.num_res_blocks + 1):
            blk["resnets"].append(_res(next(keys), d, cout, dt))
            d = cout
        if i != len(cfg.dim_mult) - 1:
            blk["upsample"] = _conv(next(keys), 3, 3, cout, cout // 2, dt)
        dec_levels.append(blk)
    c0 = ddims[0]
    dec = {
        "post_quant_conv": _conv(next(keys), 1, 1, z, z, dt),
        "conv_in": _conv(next(keys), 3, 3, z, c0, dt),
        "mid": {"res1": _res(next(keys), c0, c0, dt),
                "attn": _attn(next(keys), c0, dt),
                "res2": _res(next(keys), c0, c0, dt)},
        "up": dec_levels,
        "norm_out": _rms(ddims[-1], dt),
        "conv_out": _conv(next(keys), 3, 3, ddims[-1], cfg.in_channels, dt),
    }
    return {"encoder": {k: enc[k] for k in
                        ("conv_in", "down", "mid", "norm_out", "conv_out",
                         "quant_conv")},
            "decoder": dec}
