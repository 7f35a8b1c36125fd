"""Pallas TPU attention kernels for the RegionE shapes.

The hot attention here is non-causal with a full-sequence KV side
(S = txt + noise + condition, <= ~10k tokens at 1024^2):

  * dense steps : q = [txt ‖ noise ‖ cond]  (S x S)
  * RAGS steps  : q = [txt ‖ edited_cap]    (T_act x S) — the mixed
    edited-query x full-KV shape the reference serves with flash-attn v2
    (RegionE/Step1XEdit/inplace.py:788-798)

Two kernels:

1. `_kv_resident_kernel` (primary): a whole head's K and V stay resident in
   VMEM (bf16 K+V at S=8320, d=128 is ~4.3 MB), grid = (batch*heads,
   T/BQ).  Each q block does one full-row softmax — no online rescaling,
   no K/V re-reads (Pallas skips the DMA when a block index is unchanged
   across grid steps).  HBM traffic per layer drops from the XLA path's
   materialized [T, S] fp32 logits (~6.6 GB at dense 8320^2 x 24 heads) to
   just Q/K/V/O — the difference is the dense-step bottleneck on v5e.

2. `_flash_kernel` (fallback for very long S): classic online-softmax
   flash attention with fp32 running max/denominator, used when the
   resident logits row would not fit VMEM.

Both accept an additive key-column bias row [B, S] (padded-text masking —
also used internally to mask sequence padding added for tile alignment).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# logits row bytes per q-block that we allow in VMEM for the resident kernel
_RESIDENT_LOGITS_BUDGET = 6 * 1024 * 1024


def _kv_resident_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]                                   # [BQ, D]
    k = k_ref[0]                                   # [S, D]
    v = v_ref[0]                                   # [S, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [BQ, S]
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, n_kv: int):
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, -1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(s_idx == n_kv - 1)
    def _final():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, block_q: int = 128, block_k: int = 512,
                    interpret: bool = False):
    """q: [B, H, T, D]; k, v: [B, H, S, D]; bias: [B, S] additive or None.
    Returns [B, T, H*D] (same contract as models.layers.sdpa).
    Pads T/S internally to tile multiples; padded keys are bias-masked."""
    b, h, t, d = q.shape
    s = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    resident = 4 * block_q * _round_up(s, 128) <= _RESIDENT_LOGITS_BUDGET
    bq = min(block_q, _round_up(t, 8))
    bk = _round_up(s, 128) if resident else block_k

    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s or bias is not None:
        # sequence padding requires masking the padded key columns
        if bias is None:
            bias = jnp.zeros((b, s), jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, s_pad - s)),
                       constant_values=_NEG_INF)
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))

    n_t = t_pad // bq
    n_kv = s_pad // bk
    qf = q.reshape(b * h, t_pad, d)
    kf = k.reshape(b * h, s_pad, d)
    vf = v.reshape(b * h, s_pad, d)

    if bias is not None:
        bias_f = jnp.broadcast_to(bias.reshape(b, 1, s_pad), (b, h, s_pad)
                                  ).reshape(b * h, 1, s_pad)

    if resident:
        grid = (b * h, n_t)
        in_specs = [
            pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda g, i: (g, 0, 0)),
        ]
        args = [qf, kf, vf]
        if bias is not None:
            in_specs.append(pl.BlockSpec((1, 1, s_pad), lambda g, i: (g, 0, 0)))
            args.append(bias_f)
            kernel = functools.partial(_kv_resident_kernel, scale=scale)
        else:
            kernel = functools.partial(
                lambda qr, kr, vr, o, **kw: _kv_resident_kernel(
                    qr, kr, vr, None, o, **kw), scale=scale)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(*args)
    else:
        grid = (b * h, n_t, n_kv)
        in_specs = [
            pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
        ]
        args = [qf, kf, vf]
        if bias is not None:
            in_specs.append(pl.BlockSpec((1, 1, bk), lambda g, i, j: (g, 0, j)))
            args.append(bias_f)
            kernel = functools.partial(_flash_kernel, scale=scale, n_kv=n_kv)
        else:
            kernel = functools.partial(
                lambda qr, kr, vr, o, m, l, a, **kw: _flash_kernel(
                    qr, kr, vr, None, o, m, l, a, **kw),
                scale=scale, n_kv=n_kv)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(*args)

    out = out.reshape(b, h, t_pad, d)[:, :, :t]
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def use_flash(q_shape, k_shape) -> bool:
    """Dispatch policy: on TPU with a lane-aligned head dim.  Override with
    REGIONE_TPU_FLASH=0/1."""
    flag = os.environ.get("REGIONE_TPU_FLASH", "")
    if flag == "0":
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon") and flag != "1":
        return False
    return q_shape[-1] % 128 == 0
