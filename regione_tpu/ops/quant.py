"""Weight-only int8 quantization for the DiT linear layers.

The 20B Qwen-Image backbone does not fit a single 16 GB v5e chip in bf16
(SURVEY.md §7.3.8).  Weight-only per-output-channel symmetric int8 halves
weight HBM (and HBM bandwidth per matmul, which dominates the small-batch
RAGS steps) at negligible quality cost; combined with tensor parallelism
(regione_tpu.parallel) it brings the big backbones onto small slices.

Format: a quantized linear is {"w_q": int8 [in, out], "scale": f32 [out],
"b": [out]} — models.layers.linear dispatches on the presence of "w_q" and
dequantizes inline (XLA fuses the int8->bf16 convert + scale into the
matmul's operand load).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# param-dict keys whose weights should stay full precision (small, or
# numerically sensitive embeds/modulations)
_SKIP_SUBSTRINGS = ("norm", "mod", "time_in", "vector_in", "guidance_in",
                    "final_mod")


def quantize_linear(p: dict, axis: int = 0) -> dict:
    """{"w": [in, out], "b"} -> {"w_q": int8, "scale": f32 [out], "b"}.
    Symmetric per-output-channel over the reduction (in) axis."""
    w = jnp.asarray(p["w"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = (amax / 127.0) + 1e-12
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.astype(jnp.float32),
            "b": jnp.asarray(p["b"])}


def dequantize_weight(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["scale"]).astype(dtype)


# ---------------------------------------------------------------------------
# int4 weights (nibble-packed)
# ---------------------------------------------------------------------------
# The FULL 20B Qwen backbone (60 double blocks) does not fit one 16 GB v5e
# even at int8 (~20 GB weights); int4 halves it again (~10.8 GB with group
# scales) and brings the whole model single-chip.  XLA's S4 dtype cannot
# cross this host<->device tunnel (S4 transfer recurses into jit), so two
# int4 values are packed per int8 byte instead:
#
#   packed[i, :] = (w4[i + in/2, :] << 4) | (w4[i, :] & 0xF)
#
# i.e. the LOW nibble holds reduction-row i and the HIGH nibble holds row
# i + in/2 ("split halves", NOT adjacent pairs): the matmul then runs as
#   dot(x[:, :in/2], unpack_lo) + dot(x[:, in/2:], unpack_hi)
# — two dots whose operands are sign-extend shifts XLA fuses into the
# operand load, with no interleave/stack copy of the unpacked weight.
# Scales are symmetric per (reduction-group, out-channel), group size 128
# (GPTQ/AWQ-style), values clipped to [-7, 7].  Format:
#   {"w_qp": int8 [in/2, out], "scale4": f32 [G, out], "b": [out]}
# (stacked linears carry a leading layer axis on every leaf).

_INT4_GROUP = 128


def _int4_group_size(half: int) -> int:
    """Reduction-group size per PACKED half (groups must tile each half)."""
    return _INT4_GROUP if half % _INT4_GROUP == 0 else half


def pack_int4(w4_lo: jnp.ndarray, w4_hi: jnp.ndarray) -> jnp.ndarray:
    """Two int8 arrays of int4-range values -> one packed int8 array."""
    return jnp.left_shift(w4_hi, 4) | (w4_lo & jnp.int8(0x0F))


def unpack_int4(packed: jnp.ndarray):
    """packed int8 -> (lo, hi) int8 arrays of sign-extended int4 values."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return lo, hi


def quantize_linear4(p: dict) -> dict:
    """{"w": [..., in, out], "b"} -> nibble-packed int4 with group scales.
    Requires even `in` with each half tiled by the group size."""
    w = jnp.asarray(p["w"], jnp.float32)
    *lead, d_in, d_out = w.shape
    assert d_in % 2 == 0, d_in
    half = d_in // 2
    gs = _int4_group_size(half)
    g = d_in // gs
    wg = w.reshape(*lead, g, gs, d_out)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = amax / 7.0 + 1e-12                        # [..., g, 1, out]
    w4 = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    w4 = w4.reshape(*lead, d_in, d_out)
    lo, hi = w4[..., :half, :], w4[..., half:, :]
    return {"w_qp": pack_int4(lo, hi),
            "scale4": scale.reshape(*lead, g, d_out).astype(jnp.float32),
            "b": jnp.asarray(p["b"])}


def dequantize_weight4(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Packed int4 linear -> full [..., in, out] weight (tests/oracles)."""
    lo, hi = unpack_int4(p["w_qp"])
    w4 = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    *lead, d_in, d_out = w4.shape
    g = p["scale4"].shape[-2]
    wg = w4.reshape(*lead, g, d_in // g, d_out)
    w = wg * p["scale4"][..., :, None, :]
    return w.reshape(*lead, d_in, d_out).astype(dtype)


# int4 is reserved for the big, well-conditioned projections: modulation
# projections stay int8 (they feed every AdaLN gate) and narrow-reduction
# linears (img/txt embedders, in < _INT4_MIN_IN) gain little memory while
# losing the averaging that keeps group-int4 error small.
_INT4_MIN_IN = 512


def quantize_params(params, skip_substrings=_SKIP_SUBSTRINGS,
                    quantize_mods: bool = False, bits: int = 8,
                    int4_mods: bool = False):
    """Walk a model pytree; replace every eligible linear {"w","b"} dict
    with its int8 form.  Stacked [L, in, out] weights quantize per (layer,
    out-channel).

    quantize_mods=True also quantizes the per-block modulation projections
    (h -> 6h/3h) — the largest bf16 leaves left after default quantization
    (~2.1 GiB on the 12B Step1X) — while keeping the final output
    modulation full precision.  Needed to fit the big backbones on a
    single 16 GB chip; PSNR impact is validated on hardware.

    bits=4 packs the big projections to nibble-packed int4 with group-128
    scales (quantize_linear4); modulation projections and narrow-reduction
    linears stay int8.  This is the only single-chip format for the FULL
    60-block 20B Qwen backbone (~10.8 GB weights on a 16 GB v5e).

    int4_mods=True (with bits=4 and quantize_mods) packs the per-block
    modulation projections to int4 as well — on Qwen the img/txt mod
    stacks are ~6.8B params (a third of the model), so int8 mods alone
    exceed the 60-block single-chip budget.  final_mod always stays full
    precision."""
    assert bits in (4, 8), bits
    if quantize_mods:
        skip_substrings = tuple(
            s for s in skip_substrings if s != "mod")
        if "final_mod" not in skip_substrings:
            skip_substrings += ("final_mod",)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "w" in tree and "b" in tree and tree["w"].ndim in (2, 3):
                if any(s in path for s in skip_substrings):
                    return tree
                d_in = tree["w"].shape[-2]
                if (bits == 4 and ("mod" not in path or int4_mods)
                        and d_in >= _INT4_MIN_IN and d_in % 2 == 0):
                    return quantize_linear4(tree)
                axis = tree["w"].ndim - 2  # reduction (in) axis
                return quantize_linear(tree, axis=axis)
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return tree

    return walk(params)


def quantized_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def _gen_like(tree, k, path=""):
    """Random values matching a quantized-tree shape spec (see
    init_quantized): per-out-channel scales from the U(-lim, lim) init
    distribution, uniform int8 weights, ones for norm scales."""
    if isinstance(tree, dict):
        if "w_qp" in tree:
            d_in = 2 * tree["w_qp"].shape[-2]
            lim = 1.0 / (d_in ** 0.5)
            klo, khi = jax.random.split(k)
            lo = jax.random.randint(klo, tree["w_qp"].shape, -7, 8, jnp.int8)
            hi = jax.random.randint(khi, tree["w_qp"].shape, -7, 8, jnp.int8)
            return {
                "w_qp": pack_int4(lo, hi),
                "scale4": jnp.full(tree["scale4"].shape, lim / 7.0,
                                   jnp.float32),
                "b": jnp.zeros(tree["b"].shape, tree["b"].dtype),
            }
        if "w_q" in tree:
            d_in = tree["w_q"].shape[-2]
            lim = 1.0 / (d_in ** 0.5)
            return {
                "w_q": jax.random.randint(
                    k, tree["w_q"].shape, -127, 128, jnp.int8),
                "scale": jnp.full(tree["scale"].shape, lim / 127.0,
                                  jnp.float32),
                "b": jnp.zeros(tree["b"].shape, tree["b"].dtype),
            }
        if "w" in tree and "b" in tree:
            d_in = tree["w"].shape[-2]
            lim = 1.0 / (d_in ** 0.5)
            return {
                "w": jax.random.uniform(k, tree["w"].shape,
                                        tree["w"].dtype, -lim, lim),
                "b": jnp.zeros(tree["b"].shape, tree["b"].dtype),
            }
        return {name: _gen_like(sub, jax.random.fold_in(k, i),
                                f"{path}/{name}")
                for i, (name, sub) in enumerate(sorted(tree.items()))}
    # bare leaves: norm scales (ones) / stray biases (zeros)
    if path.rsplit("/", 1)[-1] == "scale":
        return jnp.ones(tree.shape, tree.dtype)
    return jnp.zeros(tree.shape, tree.dtype)


def init_quantized(key, cfg, quantize_mods: bool = True, bits: int = 8,
                   int4_mods: bool = False):
    """Random-init the int8-quantized MMDiT parameter tree DIRECTLY, never
    materializing the bf16 weights (the 12B Step1X bf16 init is ~24 GiB —
    larger than a v5e's whole HBM, so init-then-quantize cannot run
    on-device at full scale).

    Matches the distribution `quantize_params(init_mmdit(key, cfg))` would
    produce: `models.layers.init_linear` draws U(-lim, lim) with
    lim = 1/sqrt(d_in), so per-channel amax -> lim, scale -> lim/127 and
    w_q -> U{-127..127}.  Norm scales init to ones, biases to zeros, exactly
    as `init_mmdit` does.  Used by benchmarks only; real checkpoints go
    through weights.convert + quantize_params.

    Generation is chunked into one device program per LINEAR GROUP (the
    {w_q, scale, b} / {w, b} dicts): a single ~11.5 GiB-output program has
    been observed to wedge the remote TPU runtime when launched while a
    previous process's buffers are still being torn down, and on the CPU
    backend one program per top-level subtree allocates every leaf's
    randint temps in one arena (~226 GB for the 60-block Qwen "double"
    subtree — OOM on a 125 GB host).  The key folding matches _gen_like's
    dict recursion exactly, so the generated values are bit-identical to
    the coarser chunking.
    """
    from regione_tpu.models.mmdit import init_mmdit

    shapes = jax.eval_shape(
        lambda k: quantize_params(init_mmdit(k, cfg),
                                  quantize_mods=quantize_mods, bits=bits,
                                  int4_mods=int4_mods),
        key)

    def gen(tree, k, path=""):
        if isinstance(tree, dict) and "w_q" not in tree \
                and "w_qp" not in tree and not (
                "w" in tree and "b" in tree):
            return {name: gen(sub, jax.random.fold_in(k, i),
                              f"{path}/{name}")
                    for i, (name, sub) in enumerate(sorted(tree.items()))}
        chunk = jax.jit(functools.partial(_gen_like, tree, path=path))(k=k)
        jax.block_until_ready(chunk)
        return chunk

    return gen(shapes, key)


# ---------------------------------------------------------------------------
# int8 KV cache (per-row, per-head symmetric)
# ---------------------------------------------------------------------------
# The Region-Instruction KV cache is the largest HBM tenant of the RegionE
# path (11.2 GiB bf16 at full Step1X scale — more than the int8 weights)
# and is re-read in full by every RAGS step.  Storing K/V as int8 with a
# per-(row, head) scale halves both the residency and the per-step read
# bandwidth.  K rows are RMS-normed + rotated (bounded, well-conditioned)
# and V rows are plain projections, so per-head amax scaling keeps the
# quantization error ~0.4% — PSNR impact validated on hardware.


def quantize_kv_rows(rows: jnp.ndarray, heads: int):
    """rows [..., S, H*dh] -> (int8 rows [..., S, H*dh], scales f32
    [..., S, H])."""
    *lead, s, p = rows.shape
    dh = p // heads
    r = rows.astype(jnp.float32).reshape(*lead, s, heads, dh)
    amax = jnp.max(jnp.abs(r), axis=-1)                       # [..., S, H]
    scale = amax / 127.0 + 1e-12
    q = jnp.clip(jnp.round(r / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(*lead, s, p), scale


def dequantize_kv_rows(rows_q: jnp.ndarray, scales: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """(int8 [..., S, H*dh], f32 [..., S, H]) -> [..., S, H*dh] dtype."""
    *lead, s, p = rows_q.shape
    heads = scales.shape[-1]
    r = rows_q.astype(jnp.float32).reshape(*lead, s, heads, p // heads)
    return (r * scales[..., None]).reshape(*lead, s, p).astype(dtype)


def quantize_kv_heads(x: jnp.ndarray):
    """Head-major K/V [..., S, dh] -> (int8 same shape, f32 scales
    [..., S]); symmetric per row.  This is the form the head-major cache
    (models.mmdit.init_cache) stores — no reshapes or transposes."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0 + 1e-12
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv_heads(rows_q: jnp.ndarray, scales: jnp.ndarray,
                        dtype=jnp.bfloat16) -> jnp.ndarray:
    return (rows_q.astype(jnp.float32) * scales[..., None]).astype(dtype)


# ---------------------------------------------------------------------------
# int4 KV cache (nibble-packed along S in split halves, per-row scales)
# ---------------------------------------------------------------------------
# The unlock for the FULL 20B Qwen at the reference's native 1024^2 area
# (RegionE/QwenImageEdit/inplace.py calculate_dimensions) on ONE 16 GB
# v5e: utils.memplan puts the grid-64 int8 cache at 5.8 GiB beside
# 10.2 GiB of int4 weights (16.7 GiB total — over budget); an int4 cache
# is 2.9 GiB (13.9 GiB total — fits).  Same per-(row, head) symmetric
# scaling as the int8 form, values clipped to [-7, 7], two values per
# stored byte.
#
# PACKING AXIS MATTERS ON TPU: packing along head_dim leaves a 64-wide
# minor axis that T(8,128) tiling pads 2x, so XLA layout-compresses the
# stacked cache carry in the RAGS while-loop and re-materializes padded
# copies at every pallas boundary — measured +6.0 GiB of pure layout
# copies at the Qwen 1024^2 geometry ([60,2,24,8192,64] s8: two 2.81 GiB
# uncompressed copies + a 1.41 GiB compressed one), OOMing the chip.
# Packing along S in split halves (low nibble = row s, high nibble = row
# s + S/2) keeps the minor axis at the full, lane-exact head_dim, the
# default layout padding-free, and the carry copy-free — same bytes,
# same per-row scales, and the kernels' once-per-(batch, head) VMEM
# dequant writes each unpacked chunk to its two row halves.


def quantize_kv_heads4(x: jnp.ndarray):
    """Head-major K/V [..., S, dh] -> (packed int8 [..., S/2, dh] with
    low nibble = rows[..., :S/2, :] and high nibble = rows[..., S/2:, :],
    f32 scales [..., S]).  Requires S even (all production geometries:
    S = grid^2 image rows x CFG concat)."""
    s = x.shape[-2]
    assert s % 2 == 0, f"int4 KV packing needs an even row count, got {s}"
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 7.0 + 1e-12
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7).astype(jnp.int8)
    half = s // 2
    return pack_int4(q[..., :half, :], q[..., half:, :]), scale


def dequantize_kv_heads4(rows_qp: jnp.ndarray, scales: jnp.ndarray,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """(packed int8 [..., S/2, dh], f32 [..., S]) -> [..., S, dh] dtype."""
    lo, hi = unpack_int4(rows_qp)
    rows = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    return (rows * scales[..., None]).astype(dtype)
