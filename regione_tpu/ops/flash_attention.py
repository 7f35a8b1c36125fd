"""Pallas TPU attention kernels for the RegionE shapes.

The hot attention here is non-causal with a full-sequence KV side
(S = txt + noise + condition, <= ~10k tokens at 1024^2):

  * dense steps : q = [txt ‖ noise ‖ cond]  (S x S)
  * RAGS steps  : q = [txt ‖ edited_cap]    (T_act x S) — the mixed
    edited-query x full-KV shape the reference serves with flash-attn v2
    (RegionE/Step1XEdit/inplace.py:788-798)

Kernels:

1. `_kv_resident_kernel` (primary): a whole head's K and V stay resident in
   VMEM (bf16 K+V at S=8320, d=128 is ~4.3 MB), grid = (batch*heads,
   T/BQ).  Each q block does one full-row softmax — no online rescaling,
   no K/V re-reads (Pallas skips the DMA when a block index is unchanged
   across grid steps).  HBM traffic per layer drops from the XLA path's
   materialized [T, S] fp32 logits (~6.6 GB at dense 8320^2 x 24 heads) to
   just Q/K/V/O — the difference is the dense-step bottleneck on v5e.

2. `_kv_resident_q8_kernel`: same, but K/V arrive as int8 with per-(row,
   head) f32 scales (the int8 KV cache, ops.quant) and are dequantized
   into VMEM scratch ONCE per (batch, head) — HBM reads stay int8, half
   the cache bandwidth.

3. `_rows2_resident_kernel`: two-part KV for double-block RAGS steps —
   fresh bf16 txt rows (txt re-embeds every step) + the cached image rows
   (bf16 or int8), one softmax across both.  Avoids materializing a
   [txt ‖ cache] concatenation (a full cache copy per block).

4. `_flash_kernel` (fallback for very long S): classic online-softmax
   flash attention with fp32 running max/denominator, used when the
   resident logits row would not fit VMEM.

The KV cache is stored head-major [B, H, S, dh] (models.mmdit.init_cache)
so every kernel reads it as contiguous per-head slices — no transposes or
strided DMA on the hot path.

All kernels accept an additive key-column bias row [B, S] (padded-text
masking — also used internally to mask padding added for tile alignment).
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _softmax_rows(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _kv_resident_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]                                   # [BQ, D]
    k = k_ref[0]                                   # [S, D]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [BQ, S]
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    p = _softmax_rows(logits)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _unpack4_f32(packed):
    """Nibble-packed int4 rows -> (lo, hi) f32 halves (ops.quant.pack_int4
    split-halves convention; for the KV cache the halves are row ranges
    [:S/2] / [S/2:].  int8 -> int32 sign extension makes the arithmetic
    right shift return signed nibbles)."""
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _dequant_into(dst_ref, load, load_scale, packed: bool):
    """Chunked int8/int4 -> bf16 dequant into the VMEM scratch.

    Chunked because a whole-S dequant holds an [S, D] f32 intermediate in
    scoped VMEM — measured 21.16M vs the 16M v5e limit at the Qwen
    native-resolution geometry (S=8192, D=128), failing the compile.
    (The int8 path survives whole-S because astype×scale×store streams
    elementwise without materializing.)  Chunking bounds the live
    intermediate to one chunk; same arithmetic, bit-identical output.

    dst_ref: [S, D] bf16 scratch.  load(sl): packed rows (int4: S/2 rows,
    each byte holding row s in the low nibble and row s + S/2 in the
    high — ops.quant S-halves packing) or int8 rows; load_scale(sl):
    scale rows (always S-indexed)."""
    s = dst_ref.shape[0]
    rows = s // 2 if packed else s
    chunk = next(c for c in (1024, 512, 256, 128, 64, 32, 16, 8, 1)
                 if rows % c == 0)

    def body(j, carry):
        sl = pl.ds(j * chunk, chunk)
        if packed:
            half = s // 2
            sl_hi = pl.ds(half + j * chunk, chunk)
            lo, hi = _unpack4_f32(load(sl))
            dst_ref[sl] = (lo * load_scale(sl).astype(jnp.float32)[:, None]
                           ).astype(jnp.bfloat16)
            dst_ref[sl_hi] = (hi * load_scale(sl_hi).astype(
                jnp.float32)[:, None]).astype(jnp.bfloat16)
        else:
            r = load(sl).astype(jnp.float32)
            sc = load_scale(sl).astype(jnp.float32)
            dst_ref[sl] = (r * sc[:, None]).astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, rows // chunk, body, 0, unroll=False)


def _kv_resident_q8_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref,
                           o_ref, kd_ref, vd_ref, *, scale: float,
                           packed: bool = False):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _dequant():                                # once per (batch, head)
        _dequant_into(kd_ref, lambda sl: k_ref[0, sl],
                      lambda sl: ks_ref[0, 0, sl], packed)
        _dequant_into(vd_ref, lambda sl: v_ref[0, sl],
                      lambda sl: vs_ref[0, 0, sl], packed)

    q = q_ref[0]
    logits = jax.lax.dot_general(
        q, kd_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    p = _softmax_rows(logits)
    o_ref[0] = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vd_ref[:], (((1,), (0,)), ((), ())),
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


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, bias=None, block_q: int = 128, block_k: int = 512,
                    interpret: bool = False, k_scale=None, v_scale=None):
    """q: [B, H, T, D]; k, v: [B, H, S, D]; bias: [B, S] additive or None.
    Returns [B, T, H*D] (same contract as models.layers.sdpa).
    Pads T/S internally to tile multiples; padded keys are bias-masked.

    k_scale/v_scale: [B, H, S] f32 — when given, k/v are int8 rows scaled
    per (row, head) — or nibble-packed int4 of S/2 rows (ops.quant
    quantize_kv_heads4 S-halves packing), detected by the row count vs
    the scales'; the resident kernel dequantizes into VMEM scratch once
    per (batch, head), so HBM reads stay int8/int4."""
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    quant = k_scale is not None
    packed = quant and k.shape[2] * 2 == k_scale.shape[2]
    s = k_scale.shape[2] if quant else k.shape[2]

    resident = 4 * block_q * _round_up(s, 128) <= _RESIDENT_LOGITS_BUDGET
    if quant and (not resident or (packed and s % 256 != 0)):
        # rare (very long S, or a packed row count the resident kernel's
        # half-row indexing can't tile): dequantize up front, bf16 path
        if packed:
            from regione_tpu.ops.quant import dequantize_kv_heads4
            k = dequantize_kv_heads4(k, k_scale, q.dtype)
            v = dequantize_kv_heads4(v, v_scale, q.dtype)
        else:
            k = (k.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
            v = (v.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
        quant = packed = False
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
        if quant:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, s_pad - s)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, s_pad - s)))

    n_t = t_pad // bq
    n_kv = s_pad // bk
    dk = k.shape[-1]
    rows_kv = k.shape[2]             # s_pad, or s/2 when nibble-packed
    qf = q.reshape(b * h, t_pad, d)
    kf = k.reshape(b * h, rows_kv, dk)
    vf = v.reshape(b * h, rows_kv, dk)

    if bias is not None:
        bias_f = jnp.broadcast_to(bias.reshape(b, 1, s_pad), (b, h, s_pad)
                                  ).reshape(b * h, 1, s_pad)

    if resident and quant:
        ks_f = k_scale.reshape(b * h, 1, s_pad)
        vs_f = v_scale.reshape(b * h, 1, s_pad)
        grid = (b * h, n_t)
        row = pl.BlockSpec((1, 1, s_pad), lambda g, i: (g, 0, 0))
        in_specs = [
            pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, rows_kv, dk), lambda g, i: (g, 0, 0)),
            row,
            pl.BlockSpec((1, rows_kv, dk), lambda g, i: (g, 0, 0)),
            row,
        ]
        args = [qf, kf, ks_f, vf, vs_f]
        scratch = [pltpu.VMEM((s_pad, d), jnp.bfloat16),
                   pltpu.VMEM((s_pad, d), jnp.bfloat16)]
        if bias is not None:
            in_specs.append(row)
            args.append(bias_f)
            kernel = functools.partial(_kv_resident_q8_kernel, scale=scale,
                                       packed=packed)
        else:
            kernel = functools.partial(
                lambda qr, kr, ksr, vr, vsr, o, kd, vd, **kw:
                _kv_resident_q8_kernel(qr, kr, ksr, vr, vsr, None, o,
                                       kd, vd, **kw), scale=scale,
                packed=packed)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(*args)
    elif resident:
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


# ---------------------------------------------------------------------------
# two-part KV: fresh txt rows + cached image rows (double-block RAGS)
# ---------------------------------------------------------------------------


def _rows2_resident_kernel(q_ref, kt_ref, vt_ref, k_ref, v_ref, ks_ref,
                           vs_ref, bias_ref, o_ref, kd_ref, vd_ref,
                           *, scale: float, t1: int, packed: bool = False):
    """One softmax over [txt ‖ cache] without materializing the concat."""
    if ks_ref is not None:
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _dequant():
            _dequant_into(kd_ref, lambda sl: k_ref[0, 0, sl],
                          lambda sl: ks_ref[0, 0, sl], packed)
            _dequant_into(vd_ref, lambda sl: v_ref[0, 0, sl],
                          lambda sl: vs_ref[0, 0, sl], packed)
        k = kd_ref[:]
        v = vd_ref[:]
    else:
        k = k_ref[0, 0]
        v = v_ref[0, 0]
    q = q_ref[0, 0]
    kt = kt_ref[0, 0]                              # [T1, D]
    vt = vt_ref[0, 0]
    lt = jax.lax.dot_general(
        q, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [BQ, T1]
    li = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [BQ, S]
    logits = jnp.concatenate([lt, li], axis=1)
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    p = _softmax_rows(logits)
    pt = p[:, :t1]
    pi = p[:, t1:]
    o = jax.lax.dot_general(
        pt.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + jax.lax.dot_general(
        pi.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


# Per-core VMEM by TPU generation (bytes).  The budget leaves ~1/4 of
# physical VMEM for Mosaic's own scratch/pipelining overhead — 12 MiB of
# v5e's 16 MB was validated on hardware (scripts/validate_tpu.sh); other
# generations scale by the same 3/4 rule.
_VMEM_BYTES = {
    "v4": 16 * 2**20, "v5 lite": 16 * 2**20, "v5e": 16 * 2**20,
    "v5": 32 * 2**20, "v5p": 32 * 2**20, "v6e": 32 * 2**20,
    "v6 lite": 32 * 2**20,
}


@functools.cache
def _vmem_budget() -> int:
    """Scoped-VMEM budget for the rows2 working set, derived from the
    detected device generation (ADVICE r2: a fixed 12 MiB would admit
    too much on <16 MB parts and needlessly force the XLA fallback on
    32 MB parts).  Unknown/CPU devices get the conservative v5e figure."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    phys = next((v for k, v in _VMEM_BYTES.items() if k in kind),
                16 * 2**20)
    return phys * 3 // 4


def rows2_fits_vmem(t1: int, s: int, d: int, quant: bool,
                    packed: bool = False) -> bool:
    """Whether the rows2 kernel's per-instance working set fits scoped
    VMEM.  The resident tenants: double-buffered windowed fresh-K/V
    blocks (bf16), double-buffered cache K/V blocks (int4/int8/bf16),
    and — for the quantized cache — the bf16 dequant scratch.
    Measured failure: everything-edited at the 1024^2 dev grid (t1=4224
    fresh rows over an 8192-row int8 cache) exceeds the v5e limit by
    ~60 KB; callers must fall back to the XLA path (sdpa_cached does)."""
    t1_pad = _round_up(t1, 128)
    fresh = 2 * 2 * t1_pad * d * 2                       # k+v, dbl-buffered
    row_bytes = (d // 2) if packed else d * (1 if quant else 2)
    cache = 2 * 2 * s * row_bytes
    scratch = 2 * s * d * 2 if quant else 0
    return fresh + cache + scratch <= _vmem_budget()


@functools.partial(jax.jit,
                   static_argnames=("block_q", "interpret"))
def flash_attention_rows2(q, k_txt, v_txt, k_cache, v_cache,
                          bias=None, k_scale=None, v_scale=None,
                          block_q: int = 128, interpret: bool = False):
    """Double-block RAGS attention: q over [txt ‖ cached image rows].

    q: [B, H, T, D]; k_txt/v_txt: [B, H, T1, D] fresh bf16 (txt re-embeds
    every step); k_cache/v_cache: [B, H, S, D] head-major cache (bf16, or
    int8 with k_scale/v_scale [B, H, S], or nibble-packed int4 of S/2
    rows, ops.quant S-halves packing — detected by the row count vs the
    scales').  bias: [B, T1+S] or None.
    The cache is read in place; no concat or transpose hits HBM.
    Requires S % 128 == 0 (% 256 packed; all production geometries)."""
    b, h, t, d = q.shape
    t1 = k_txt.shape[2]
    quant = k_scale is not None
    packed = quant and k_cache.shape[2] * 2 == k_scale.shape[2]
    s = k_scale.shape[2] if quant else k_cache.shape[2]
    assert s % (256 if packed else 128) == 0, (s, packed)
    scale = 1.0 / math.sqrt(d)
    dp = k_cache.shape[-1]
    rows_kv = k_cache.shape[2]       # s, or s/2 when nibble-packed

    t1_pad = _round_up(t1, 128)
    if t1_pad != t1:
        # pad the (tiny) txt rows; mask the padded columns via bias
        k_txt = jnp.pad(k_txt, ((0, 0), (0, 0), (0, t1_pad - t1), (0, 0)))
        v_txt = jnp.pad(v_txt, ((0, 0), (0, 0), (0, t1_pad - t1), (0, 0)))
        if bias is None:
            bias = jnp.zeros((b, t1 + s), jnp.float32)
        bias = jnp.concatenate(
            [bias[:, :t1],
             jnp.full((b, t1_pad - t1), _NEG_INF, jnp.float32),
             bias[:, t1:]], axis=1)
    bq = min(block_q, _round_up(t, 8))
    t_pad = _round_up(t, bq)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    n_t = t_pad // bq

    grid = (b, h, n_t)
    q_spec = pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0))
    txt_spec = pl.BlockSpec((1, 1, t1_pad, d),
                            lambda bb, hh, i: (bb, hh, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, rows_kv, dp),
                           lambda bb, hh, i: (bb, hh, 0, 0))
    # scales flattened to [B*H, 1, S]: a (1, 1, s) block in a (.., 1, S)
    # array satisfies Mosaic's last-two-dims rule (blocking H directly
    # would put a size-1 block in a size-H dim — illegal)
    sc_spec = pl.BlockSpec((1, 1, s), lambda bb, hh, i: (bb * h + hh, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, t1_pad + s), lambda bb, hh, i: (bb, 0, 0))
    out_spec = pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0))
    out_shape = jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype)

    args = [q, k_txt, v_txt]
    in_specs = [q_spec, txt_spec, txt_spec]
    if quant:
        args += [k_cache, k_scale.reshape(b * h, 1, s),
                 v_cache, v_scale.reshape(b * h, 1, s)]
        in_specs += [kv_spec, sc_spec, kv_spec, sc_spec]
        scratch = [pltpu.VMEM((s, d), jnp.bfloat16),
                   pltpu.VMEM((s, d), jnp.bfloat16)]

        def kernel(qr, ktr, vtr, kr, ksr, vr, vsr, *rest, **kw):
            if bias is not None:
                br, o, kd, vd = rest
            else:
                (o, kd, vd), br = rest, None
            _rows2_resident_kernel(qr, ktr, vtr, kr, vr, ksr, vsr, br, o,
                                   kd, vd, **kw)
    else:
        args += [k_cache, v_cache]
        in_specs += [kv_spec, kv_spec]
        scratch = []

        def kernel(qr, ktr, vtr, kr, vr, *rest, **kw):
            br, o = rest if bias is not None else (None, rest[0])
            _rows2_resident_kernel(qr, ktr, vtr, kr, vr, None, None, br, o,
                                   None, None, **kw)
    if bias is not None:
        args.append(bias[:, None, :])   # [B, 1, cols] (Mosaic block rule)
        in_specs.append(bias_spec)

    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, t1=t1_pad, packed=packed),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)

    out = out[:, :, :t]
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
