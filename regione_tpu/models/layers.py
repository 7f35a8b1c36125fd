"""Functional building blocks for flow-matching DiT backbones.

Plain-pytree functional style (params are nested dicts of jnp arrays): easy
to shard with jax.sharding, easy to convert from HF torch checkpoints, and
scan-friendly (block params are stacked along a leading layer axis so the
whole depth compiles as one `lax.scan` body — a single trace instead of 19+38
unrolled blocks).

Conventions:
  linear params  : {"w": [in, out], "b": [out]}  (note: transposed vs torch)
  rmsnorm params : {"scale": [dim]}
  layernorm      : {"scale": [dim], "bias": [dim]} (elementwise-affine only
                   where the architecture has it; AdaLN norms have none)

RoPE follows the diffusers Flux convention (consecutive-pair rotation with
cos/sin interleave-repeated to head_dim) so converted weights reproduce the
reference numerics (reference applies diffusers' apply_rotary_emb at
RegionE/Step1XEdit/inplace.py:784-786).
"""

from __future__ import annotations

import contextlib
import math
import threading
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

# W8A8 mode (opt-in per forward via `with act_int8():`, set from
# MMDiTConfig.act_int8 by mmdit_forward): activations are dynamically
# quantized per row so int8-weight linears run s8 x s8 -> s32 on the MXU.
# The v5e runs int8 matmuls ~1.4x faster than bf16 at DiT shapes (measured
# 177 vs 129 T/s incl. readback on [9216,3072]x[3072,12288]); weight-only
# int8 with bf16 activations gets none of that (the dequantized operand is
# bf16, 125 T/s).  Trace-time flag — each jitted program bakes its mode in.
# Thread-local so concurrent traces (e.g. a server building two pipelines
# with different act_int8 settings) can't bake each other's mode in.
_ACT_INT8 = threading.local()


@contextlib.contextmanager
def act_int8(enabled: bool = True):
    prev = act_int8_active()
    _ACT_INT8.on = enabled
    try:
        yield
    finally:
        _ACT_INT8.on = prev


def act_int8_active() -> bool:
    return getattr(_ACT_INT8, "on", False)


def quantize_rows(x):
    """Dynamic per-row symmetric int8 quant: x [..., K] -> (int8 same
    shape, f32 row scales [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_a = amax / 127.0 + 1e-12
    x8 = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
    return x8, s_a


def linear_q8(p, x8, s_a, out_dtype=jnp.bfloat16):
    """int8-weight linear over PRE-quantized activations: s8 x s8 -> s32
    on the MXU, output scaled by row x per-channel scales.

    XLA materializes the dot's output fusion BEFORE any scaling — with
    an f32 epilogue that is a full-width f32 [M, N] temp (408 MB at the
    12B single-block MLP width, the margin that kept W8A8 FLUX-1024px
    from compiling).  Converting the s32 accumulator straight to
    out_dtype inside the dot fusion keeps the temp at bf16 width (same
    as the weight-only path); the bf16 rounding of accumulator and
    scales (~0.2-0.4% each) is well under the 8-bit activation grid
    (~1%)."""
    nb = x8.ndim - 1
    acc = jax.lax.dot_general(
        x8, p["w_q"], (((nb,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(out_dtype) * s_a.astype(out_dtype)
    return out * p["scale"].astype(out_dtype) + p["b"]


def linear4(p, x):
    """Nibble-packed int4 linear (regione_tpu.ops.quant.quantize_linear4).

    The packed byte's low nibble is reduction row i, the high nibble row
    i + in/2, so the matmul splits into two dots over the input halves —
    the sign-extend shifts and group-scale multiplies fuse into each dot's
    operand load (no unpacked [in, out] weight is ever materialized, and
    no interleave copy exists in the graph).  Compute is bf16 on the MXU;
    int4 buys FIT (single-chip residency for the 20B Qwen), not speed."""
    from regione_tpu.ops.quant import unpack_int4
    pk, scale4 = p["w_qp"], p["scale4"]
    # stacked [L, in/2, out] leaves are consumed per-layer under lax.scan;
    # dq() below reshapes assuming a single layer, so reject lead axes
    # loudly instead of silently folding them into the group axis
    assert pk.ndim == 2, (
        f"linear4 expects a per-layer [in/2, out] packed weight, got "
        f"{pk.shape}; index the stacked layer axis (lax.scan xs) first")
    half, d_out = pk.shape[-2], pk.shape[-1]
    g = scale4.shape[-2]
    lo, hi = unpack_int4(pk)

    def dq(w4, sc):
        wg = w4.astype(jnp.float32).reshape(g // 2, half // (g // 2), d_out)
        return (wg * sc[:, None, :]).reshape(half, d_out).astype(x.dtype)

    x_lo, x_hi = x[..., :half], x[..., half:]
    acc = (jnp.dot(x_lo, dq(lo, scale4[: g // 2]),
                   preferred_element_type=x.dtype)
           + jnp.dot(x_hi, dq(hi, scale4[g // 2:]),
                     preferred_element_type=x.dtype))
    return acc + p["b"]


def linear(p, x):
    if "w_qp" in p:  # nibble-packed int4 (regione_tpu.ops.quant)
        return linear4(p, x)
    if "w_q" in p:  # weight-only int8 (regione_tpu.ops.quant)
        if act_int8_active():
            # W8A8: dynamic per-row activation quant -> int8 MXU matmul
            x8, s_a = quantize_rows(x)
            return linear_q8(p, x8, s_a, out_dtype=x.dtype)
        # weight-only: XLA fuses the convert+scale into the operand load
        w = (p["w_q"].astype(jnp.float32) * p["scale"]).astype(x.dtype)
        return jnp.dot(x, w, preferred_element_type=x.dtype) + p["b"]
    return jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def row_projector(x, p_probe):
    """(carry, proj) for several linears sharing the input `x`:
    `proj(p, carry)` applies one linear from the shared carry.

    Under W8A8 (and when `p_probe` shows int8 weights) the carry is `x`
    quantized ONCE — (int8 copy, row scales) — so every projection runs
    from one int8 materialization instead of N transient ones (at 12B
    this is the HBM margin between fitting and not; models/mmdit uses it
    for the q/k/v trio and the single-block linear1 halves).  Otherwise
    the carry is `x` itself.  The carry is a pytree of ARRAYS so callers
    can thread it through `lax.optimization_barrier`."""
    if act_int8_active() and "w_q" in p_probe:
        out_dtype = x.dtype

        def proj(p, carry):
            return linear_q8(p, carry[0], carry[1], out_dtype=out_dtype)

        return quantize_rows(x), proj
    return x, lambda p, carry: linear(p, carry)


def rmsnorm(x, scale, eps: float = 1e-6):
    """RMS norm over the last dim in fp32, cast back (qk-norm style)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def layernorm(x, eps: float = 1e-6, scale=None, bias=None):
    """LayerNorm; AdaLN uses the affine-free form."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (Flux convention: t in [0,1] scaled by
    1000 before embedding; fp32)."""
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_embed(p, x):
    """Two-layer SiLU MLP used for time/vector/guidance embeds."""
    return linear(p["out"], jax.nn.silu(linear(p["in"], x)))


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_table(ids: jnp.ndarray, axes_dims: Sequence[int], theta: float = 10000.0):
    """Multi-axis rotary table.

    Args:
      ids: [S, A] integer/float positions per rotary axis.
      axes_dims: per-axis rotary sub-dimension; sum == head_dim.

    Returns:
      (cos, sin): each [S, head_dim], frequencies interleave-repeated x2 so
      that application is `x * cos + rotate_pairs(x) * sin` (diffusers Flux
      `use_real=True` convention).
    """
    cos_parts, sin_parts = [], []
    for a, d in enumerate(axes_dims):
        half = d // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / d))
        angles = ids[:, a].astype(jnp.float32)[:, None] * freqs[None]  # [S, half]
        angles = jnp.repeat(angles, 2, axis=-1)  # interleave-repeat to d
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def _rotate_pairs(x):
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def apply_rope(x: jnp.ndarray, rope) -> jnp.ndarray:
    """x: [..., S, D]; rope: (cos, sin) each [S, D]. fp32 rotation."""
    cos, sin = rope
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_pairs(xf) * sin
    return out.astype(x.dtype)


def concat_rope(a, b):
    return (jnp.concatenate([a[0], b[0]], 0), jnp.concatenate([a[1], b[1]], 0))


def gather_rope(rope, ids):
    """Gather rope rows by padded ids (fill 0 => cos=0/sin=0 for pad rows;
    pad rows are garbage-by-design and dropped downstream)."""
    cos, sin = rope
    return (
        jnp.take(cos, ids, axis=0, mode="fill", fill_value=0),
        jnp.take(sin, ids, axis=0, mode="fill", fill_value=0),
    )


# ---------------------------------------------------------------------------
# attention (XLA path; Pallas flash kernel lives in regione_tpu.ops)
# ---------------------------------------------------------------------------

def sdpa(q, k, v, bias=None):
    """Scaled dot-product attention.

    q: [B, H, T, d], k/v: [B, H, S, d] -> [B, T, H*d].
    Dispatches to the Pallas TPU flash kernel (regione_tpu.ops) when the
    backend/shapes allow; falls back to a fused-by-XLA fp32-softmax path.
    bias: [B, 1, 1, S] additive (key-column mask) or None.
    """
    from regione_tpu.ops.flash_attention import flash_attention, use_flash
    if use_flash(q.shape, k.shape):
        brow = None
        if bias is not None:
            brow = bias.reshape(bias.shape[0], bias.shape[-1])
        return flash_attention(q, k, v, brow)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    b, h, t, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def sdpa_cached(q, txt_kv, k_cache, v_cache, bias=None):
    """RAGS attention against the head-major KV cache, read in place.

    The cache lives as [B, H, S, d] (models.mmdit.init_cache) so the
    kernels' per-head K/V blocks are contiguous slices — no transposed or
    concatenated copy of the cache ever hits HBM (the reference's merged
    [S, H*d] torch layout costs a ~20 GB/step transpose at dev scale).

    q: [B, H, T, d].
    txt_kv: (k_t, v_t) [B, H, T1, d] fresh txt rows (double blocks — txt
        re-embeds each step) or None (single blocks: the cache already
        holds the txt rows).
    k_cache/v_cache: [B, H, S, d] bf16, or (int8 rows, [B, H, S] f32
        scales) when the cache is quantized (ops.quant).
    bias: [B, 1, 1, T1+S] additive key-column bias or None.
    """
    from regione_tpu.ops.flash_attention import (
        flash_attention, flash_attention_rows2, rows2_fits_vmem, use_flash)
    quant = isinstance(k_cache, tuple)
    rows = k_cache[0] if quant else k_cache
    # int4 cache: S/2 packed rows vs S scale rows (S-halves convention)
    packed = quant and rows.shape[2] * 2 == k_cache[1].shape[2]
    s = k_cache[1].shape[2] if quant else rows.shape[2]
    rows2_ok = (txt_kv is None
                or (s % (256 if packed else 128) == 0
                    and rows2_fits_vmem(txt_kv[0].shape[2], s,
                                        q.shape[-1], quant, packed)))
    if use_flash(q.shape, rows.shape) and rows2_ok:
        brow = (bias.reshape(bias.shape[0], bias.shape[-1])
                if bias is not None else None)
        kq, ks = k_cache if quant else (k_cache, None)
        vq, vs = v_cache if quant else (v_cache, None)
        if txt_kv is None:
            return flash_attention(q, kq, vq, brow, k_scale=ks, v_scale=vs)
        return flash_attention_rows2(q, txt_kv[0], txt_kv[1], kq, vq,
                                     brow, k_scale=ks, v_scale=vs)
    # fallback (CPU / unaligned): dequantize + concat
    if quant:
        from regione_tpu.ops.quant import (dequantize_kv_heads,
                                           dequantize_kv_heads4)
        deq = dequantize_kv_heads4 if packed else dequantize_kv_heads
        k_cache = deq(k_cache[0], k_cache[1], q.dtype)
        v_cache = deq(v_cache[0], v_cache[1], q.dtype)
    k, v = k_cache, v_cache
    if txt_kv is not None:
        k = jnp.concatenate([txt_kv[0].astype(k.dtype), k], axis=2)
        v = jnp.concatenate([txt_kv[1].astype(v.dtype), v], axis=2)
    return sdpa(q, k, v, bias=bias)


def split_heads(x, heads):
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def init_linear(key, d_in, d_out, dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    lim = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -lim, lim),
        "b": jnp.zeros((d_out,), dtype),
    }


def init_mlp_embed(key, d_in, d_hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"in": init_linear(k1, d_in, d_hidden, dtype),
            "out": init_linear(k2, d_hidden, d_hidden, dtype)}
