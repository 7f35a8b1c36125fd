"""Variational autoencoder (AutoencoderKL, Flux family) in functional JAX.

Used by Step1X-Edit / FLUX.1 Kontext (16 latent channels, spatial /8,
scaling_factor + shift_factor normalization — reference decodes with
``latents / scaling + shift`` at RegionE/Step1XEdit/inplace.py:446).
Qwen-Image ships a different (Wan-style causal-3D) VAE; its single-frame
image path reduces to the same spatial topology and is mapped onto this
module by the weight converter (multi-frame video decode is out of scope —
the reference only edits stills).

Layout is NHWC throughout (TPU conv-friendly).  Params are nested dicts:
conv {"w": [kh, kw, cin, cout], "b": [cout]}, groupnorm {"scale", "bias"}.

Also hosts the token packing helpers: the DiT consumes latents patchified
2x2 into [B, (H/16)(W/16), 4*C_lat] tokens (reference _pack_latents /
_unpack_latents in the diffusers pipelines).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    dtype: Any = jnp.float32

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(p, x, stride: int = 1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"]


def groupnorm(p, x, groups: int, eps: float = 1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def resnet_block(p, x, groups: int):
    h = groupnorm(p["norm1"], x, groups)
    h = conv2d(p["conv1"], jax.nn.silu(h))
    h = groupnorm(p["norm2"], h, groups)
    h = conv2d(p["conv2"], jax.nn.silu(h))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def attn_block(p, x, groups: int):
    """Single-head spatial self-attention (VAE mid-block)."""
    b, h, w, c = x.shape
    y = groupnorm(p["norm"], x, groups).reshape(b, h * w, c)
    q = y @ p["q"]["w"] + p["q"]["b"]
    k = y @ p["k"]["w"] + p["k"]["b"]
    v = y @ p["v"]["w"] + p["v"]["b"]
    logits = jnp.einsum("btd,bsd->bts", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    att = jax.nn.softmax(logits, -1).astype(y.dtype)
    o = jnp.einsum("bts,bsd->btd", att, v) @ p["out"]["w"] + p["out"]["b"]
    return x + o.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encode(params, cfg: VAEConfig, images: jnp.ndarray,
           key: jax.Array | None = None) -> jnp.ndarray:
    """images [B, H, W, 3] in [-1, 1] -> latent [B, H/8, W/8, C_lat].

    Default: mode of the posterior (diffusers .mode()) — deterministic.
    Pass `key` to sample the posterior instead (mean + std * eps), matching
    the reference's encode path which samples with a seeded generator."""
    g = cfg.norm_num_groups
    x = conv2d(params["conv_in"], images.astype(cfg.dtype))
    for i, blk in enumerate(params["down"]):
        for rp in blk["resnets"]:
            x = resnet_block(rp, x, g)
        if "downsample" in blk:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(blk["downsample"], x, stride=2, padding=0)
    m = params["mid"]
    x = resnet_block(m["res1"], x, g)
    x = attn_block(m["attn"], x, g)
    x = resnet_block(m["res2"], x, g)
    x = groupnorm(params["norm_out"], x, g)
    x = conv2d(params["conv_out"], jax.nn.silu(x))
    mean, logvar = jnp.split(x, 2, axis=-1)
    if key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean


def decode(params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, H/8, W/8, C_lat] (already de-normalized) -> [B, H, W, 3]."""
    g = cfg.norm_num_groups
    x = conv2d(params["conv_in"], latents.astype(cfg.dtype))
    m = params["mid"]
    x = resnet_block(m["res1"], x, g)
    x = attn_block(m["attn"], x, g)
    x = resnet_block(m["res2"], x, g)
    for blk in params["up"]:
        for rp in blk["resnets"]:
            x = resnet_block(rp, x, g)
        if "upsample" in blk:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = conv2d(blk["upsample"], x)
    x = groupnorm(params["norm_out"], x, g)
    x = conv2d(params["conv_out"], jax.nn.silu(x))
    return x


def vae_module(cfg):
    """Dispatch to the VAE family implementing `cfg` (AutoencoderKL here,
    Wan in models.vae_wan) — each exposes encode/decode/normalize_latents/
    denormalize_latents with identical signatures."""
    import sys

    from regione_tpu.models import vae_wan
    if isinstance(cfg, vae_wan.WanVAEConfig):
        return vae_wan
    return sys.modules[__name__]


def normalize_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """encoder output -> DiT latent space (diffusers convention)."""
    return (z - cfg.shift_factor) * cfg.scaling_factor


def denormalize_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """DiT latent space -> decoder input (reference inplace.py:446)."""
    return z / cfg.scaling_factor + cfg.shift_factor


# ---------------------------------------------------------------------------
# token packing (2x2 patchify)
# ---------------------------------------------------------------------------

def pack_latents(z: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/2)(W/2), 4C] tokens (patch_size 2)."""
    b, h, w, c = z.shape
    z = z.reshape(b, h // 2, 2, w // 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(tokens: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """[B, S, 4C] -> [B, 2*grid_h, 2*grid_w, C]."""
    b, s, c4 = tokens.shape
    assert s == grid_h * grid_w
    c = c4 // 4
    z = tokens.reshape(b, grid_h, grid_w, 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, 2 * grid_h, 2 * grid_w, c)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype):
    lim = 1.0 / math.sqrt(kh * kw * cin)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), dtype, -lim, lim),
            "b": jnp.zeros((cout,), dtype)}


def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _init_gn(cin, dtype), "conv1": _init_conv(k1, 3, 3, cin, cout, dtype),
         "norm2": _init_gn(cout, dtype), "conv2": _init_conv(k2, 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["shortcut"] = _init_conv(k3, 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    lim = 1.0 / math.sqrt(c)
    def lin(k):
        return {"w": jax.random.uniform(k, (c, c), dtype, -lim, lim),
                "b": jnp.zeros((c,), dtype)}
    return {"norm": _init_gn(c, dtype), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "out": lin(ks[3])}


def init_vae(key, cfg: VAEConfig):
    dt = cfg.dtype
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 256))
    enc = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, chans[0], dt)}
    down = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(next(keys), cin if j == 0 else cout,
                                               cout, dt))
        if i < len(chans) - 1:
            blk["downsample"] = _init_conv(next(keys), 3, 3, cout, cout, dt)
        down.append(blk)
        cin = cout
    enc["down"] = down
    c_mid = chans[-1]
    enc["mid"] = {"res1": _init_resnet(next(keys), c_mid, c_mid, dt),
                  "attn": _init_attn(next(keys), c_mid, dt),
                  "res2": _init_resnet(next(keys), c_mid, c_mid, dt)}
    enc["norm_out"] = _init_gn(c_mid, dt)
    enc["conv_out"] = _init_conv(next(keys), 3, 3, c_mid, 2 * cfg.latent_channels, dt)

    dec = {"conv_in": _init_conv(next(keys), 3, 3, cfg.latent_channels, c_mid, dt)}
    dec["mid"] = {"res1": _init_resnet(next(keys), c_mid, c_mid, dt),
                  "attn": _init_attn(next(keys), c_mid, dt),
                  "res2": _init_resnet(next(keys), c_mid, c_mid, dt)}
    up = []
    rev = list(reversed(chans))
    cin = c_mid
    for i, cout in enumerate(rev):
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_init_resnet(next(keys), cin if j == 0 else cout,
                                               cout, dt))
        if i < len(rev) - 1:
            blk["upsample"] = _init_conv(next(keys), 3, 3, cout, cout, dt)
        up.append(blk)
        cin = cout
    dec["up"] = up
    dec["norm_out"] = _init_gn(chans[0], dt)
    dec["conv_out"] = _init_conv(next(keys), 3, 3, chans[0], cfg.in_channels, dt)
    return {"encoder": enc, "decoder": dec}
