"""Pallas TPU flash attention for the RegionE attention shapes.

The hot attention in this framework is non-causal with a small-to-medium
query side and a full-sequence KV side:

  * dense steps : q = [txt ‖ noise ‖ cond]  (S_full x S_full)
  * RAGS steps  : q = [txt ‖ edited_cap]    (T_act x S_full)  — the
    mixed edited-query x full-KV shape the reference serves with
    flash-attn v2 (RegionE/Step1XEdit/inplace.py:788-798)

This kernel is a standard online-softmax flash attention tiled for the MXU:
grid (batch*heads, T/BQ, S/BK), fp32 running max/denominator in VMEM
scratch, bf16 matmuls with fp32 accumulation, finalization on the last KV
block.  An optional additive bias row [B, S] masks padded text columns.

The XLA fallback (models.layers.sdpa) materializes the [T, S] logits —
fine at these sizes but wasteful of HBM bandwidth; the kernel never spills
logits.  `use_flash()` gates dispatch: TPU backend + aligned shapes.
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


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, n_kv: int):
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]          # [BQ, D]
    k = k_ref[0]          # [BK, D]
    v = v_ref[0]          # [BK, D]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [BQ, BK]
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)  # [1, BK] bcast

    m_prev = m_ref[:]                                     # [BQ, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                           # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)                       # [BQ, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, -1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(s_idx == n_kv - 1)
    def _final():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pick_block(n: int, target: int) -> int:
    b = math.gcd(n, target)
    while n % b:
        b -= 1
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, block_q: int = 256, block_k: int = 512,
                    interpret: bool = False):
    """q: [B, H, T, D]; k, v: [B, H, S, D]; bias: [B, S] additive or None.
    Returns [B, T, H*D] (same contract as models.layers.sdpa)."""
    b, h, t, d = q.shape
    s = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    bq = _pick_block(t, block_q)
    bk = _pick_block(s, block_k)
    n_kv = s // bk
    grid = (b * h, t // bq, n_kv)

    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
    ]
    args = [qf, kf, vf]
    if bias is not None:
        # [B, S] -> [B*H, 1, S]; block (1, 1, bk) keeps the trailing-two
        # block dims (1, bk) equal-or-tile-aligned to the array dims (TPU
        # lowering requires dim -2 of a block be 8-divisible or full).
        bias_f = jnp.broadcast_to(bias.reshape(b, 1, s), (b, h, s)
                                  ).reshape(b * h, 1, s)
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
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running denom
            pltpu.VMEM((bq, d), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(b, t, h * d)


def use_flash(q_shape, k_shape) -> bool:
    """Dispatch policy: on TPU, head_dim lane-aligned and sequences tileable.

    Default OFF: measured on v5e, XLA's fused attention beats this kernel at
    RegionE's shapes (bench r1: dense 25.4s XLA vs 42.4s flash) — opt in
    with REGIONE_TPU_FLASH=1 while the kernel is being tuned."""
    if os.environ.get("REGIONE_TPU_FLASH", "0") != "1":
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    d = q_shape[-1]
    t, s = q_shape[2], k_shape[2]
    return d % 128 == 0 and t % 8 == 0 and s % 128 == 0
