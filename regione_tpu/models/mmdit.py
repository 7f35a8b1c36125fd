"""Generic multi-modal DiT (MMDiT) backbone with Region-Instruction KV cache.

One implementation covers the transformer structure of all five reference
backends (the reference instead duplicates ~800 lines x10 files; SURVEY.md §1):

  * Step1X-Edit / FLUX.1 Kontext : double-stream blocks + single-stream
    (txt-concat) blocks, AdaLN-zero modulation, qk-RMSNorm, 3-axis RoPE.
  * Qwen-Image-Edit (+Plus)      : joint double-stream blocks only
    (depth_single = 0).

Three statically-selected cache modes mirror the reference attention
processor's phase switch (RegionE/Step1XEdit/inplace.py:723-757):

  mode="dense" : plain attention, no cache traffic (STS / SMS steps).
  mode="write" : dense attention AND store the image-stream K/V
                 (partition / refresh steps).
  mode="rags"  : the hidden stream holds only the gathered edited tokens;
                 their K/V rows are recomputed and scattered into the cache
                 (the TPU-native equivalent of the reference's in-place
                 Triton indexed matmul, fused_kernels.py:9-101), then the
                 gathered queries attend over the FULL cached K/V.

TPU-native design choices (vs. the reference):
  * Block parameters are stacked on a leading layer axis and the depth runs
    under `lax.scan` — one trace for 19 (or 60) blocks.
  * The cache stores *attention-ready* K (qk-norm + RoPE already applied)
    and raw V. Unedited rows' norm/RoPE results never change between
    refreshes, so re-applying them every step (as the reference does,
    inplace.py:784-786) is wasted bandwidth; we pay norm+RoPE only for the
    recomputed rows.
  * Padded (out-of-capacity) edited slots carry garbage by design: their
    cache writes are dropped (`mode='drop'` scatter) and their outputs are
    dropped at the sampler's final scatter. They never contaminate real rows.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from regione_tpu.models.layers import (
    apply_rope,
    concat_rope,
    init_linear,
    init_mlp_embed,
    layernorm,
    linear,
    mlp_embed,
    rmsnorm,
    sdpa,
    split_heads,
    timestep_embedding,
)

MODE_DENSE = "dense"
MODE_WRITE = "write"
MODE_RAGS = "rags"


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 64
    out_channels: int = 64
    hidden: int = 3072
    heads: int = 24
    head_dim: int = 128
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    txt_in_dim: int = 4096
    pooled_dim: int = 768          # 0 -> no pooled-vector embed (Qwen)
    guidance_embed: bool = False   # True for FLUX.1 (distilled guidance)
    axes_dims: tuple = (16, 56, 56)
    rope_theta: float = 10000.0
    time_embed_dim: int = 256
    txt_norm: bool = False         # RMSNorm on raw text features before
                                   # txt_in (Qwen-Image, reference
                                   # QwenImageEdit/inplace.py:519-520)
    connector: Any = None          # ConnectorConfig for Step1X's timestep-
                                   # conditioned text refiner (reference
                                   # inplace.py:514-520); None = disabled
    cache_int8: bool = False       # store KV cache as int8 with per-(row,
                                   # head) scales (ops.quant): halves the
                                   # largest HBM tenant of the RegionE path
                                   # and the per-RAGS-step cache read
                                   # bandwidth; opt-in (PSNR validated on
                                   # hardware before enabling by default)
    cache_int4: bool = False       # store KV cache nibble-packed int4
                                   # (ops.quant.quantize_kv_heads4):
                                   # quarter of the bf16 bytes — the
                                   # single-chip unlock for the FULL 20B
                                   # Qwen at its native 1024^2 area.
                                   # Mutually exclusive with cache_int8
    act_int8: bool = False         # W8A8: dynamically quantize activations
                                   # per row so int8-weight linears run
                                   # s8 x s8 on the MXU (~1.4x the bf16
                                   # matmul rate on v5e; models.layers
                                   # act_int8 context).  Requires int8
                                   # weights (ops.quant); no-op otherwise
    dtype: Any = jnp.bfloat16

    @property
    def inner(self) -> int:
        return self.heads * self.head_dim

    @property
    def cache_quant(self) -> bool:
        """Quantized-cache structure: (rows, scales) tuples / "_s" leaves."""
        assert not (self.cache_int8 and self.cache_int4), \
            "cache_int8 and cache_int4 are mutually exclusive"
        return self.cache_int8 or self.cache_int4

    def _quantize_kv(self, x):
        from regione_tpu.ops.quant import (quantize_kv_heads,
                                           quantize_kv_heads4)
        return (quantize_kv_heads4 if self.cache_int4
                else quantize_kv_heads)(x)

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden * self.mlp_ratio)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _attn_qkv(p, x, rope, heads):
    """Project one stream to q,k,v heads with qk-RMSNorm and RoPE applied.
    The three projections share one input (and, under W8A8, one quantized
    copy of it — layers.row_projector)."""
    from regione_tpu.models.layers import row_projector
    carry, proj = row_projector(x, p["q"])
    q = split_heads(proj(p["q"], carry), heads)
    k = split_heads(proj(p["k"], carry), heads)
    v = split_heads(proj(p["v"], carry), heads)
    q = rmsnorm(q, p["norm_q"]["scale"])
    k = rmsnorm(k, p["norm_k"]["scale"])
    q = apply_rope(q, rope)
    k = apply_rope(k, rope)
    return q, k, v


def _modulation(p, temb_act, n):
    mods = linear(p, temb_act)
    return jnp.split(mods[:, None, :], n, axis=-1)


def double_block(p, cfg: MMDiTConfig, img, txt, temb_act, rope_img, rope_txt,
                 mode, cache_k, cache_v, txt_bias=None):
    """MMDiT double-stream block (separate img/txt projections, joint
    attention with txt rows first — reference inplace.py:780-782).

    img: [B, T_img, H]  (T_img = full S_kv in dense/write; K_cap in rags)
    cache_k/v: head-major [B, H, S_kv, dh] attention-ready K / raw V
      (or (int8 rows, scales) tuples when cfg.cache_int8); READ-ONLY in
      rags mode (stale rows are bias-masked — see mmdit_forward), rebuilt
      and returned in write mode, None in dense mode.
    txt_bias: dense/write: [B,1,1,t_txt+S_kv] key bias; rags: the combined
      [B,1,1,t_txt+cap+S_kv] fresh+cache bias.
    """
    heads = cfg.heads
    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = _modulation(
        p["img_mod"], temb_act, 6)
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = _modulation(
        p["txt_mod"], temb_act, 6)

    img_n = layernorm(img) * (1 + i_scale1) + i_shift1
    txt_n = layernorm(txt) * (1 + t_scale1) + t_shift1

    q_i, k_i, v_i = _attn_qkv(p["img_attn"], img_n, rope_img, heads)
    q_t, k_t, v_t = _attn_qkv(p["txt_attn"], txt_n, rope_txt, heads)
    q = jnp.concatenate([q_t, q_i], axis=2)

    new_cache = None
    if mode == MODE_RAGS:
        from regione_tpu.models.layers import sdpa_cached
        k_fresh = jnp.concatenate([k_t, k_i], axis=2)
        v_fresh = jnp.concatenate([v_t, v_i], axis=2)
        attn = sdpa_cached(q, (k_fresh, v_fresh), cache_k, cache_v,
                           bias=txt_bias)
    else:
        if mode == MODE_WRITE:
            # head-major cache == the projection output; store as-is
            if cfg.cache_quant:
                new_cache = (cfg._quantize_kv(k_i), cfg._quantize_kv(v_i))
            else:
                new_cache = (k_i, v_i)
        k = jnp.concatenate([k_t, k_i], axis=2)
        v = jnp.concatenate([v_t, v_i], axis=2)
        attn = sdpa(q, k, v, bias=txt_bias)

    t_len = txt.shape[1]
    attn_txt, attn_img = attn[:, :t_len], attn[:, t_len:]

    img = img + i_gate1 * linear(p["img_attn"]["out"], attn_img)
    txt = txt + t_gate1 * linear(p["txt_attn"]["out"], attn_txt)

    img_n2 = layernorm(img) * (1 + i_scale2) + i_shift2
    img = img + i_gate2 * linear(
        p["img_mlp"]["out"], jax.nn.gelu(linear(p["img_mlp"]["in"], img_n2),
                                         approximate=True))
    txt_n2 = layernorm(txt) * (1 + t_scale2) + t_shift2
    txt = txt + t_gate2 * linear(
        p["txt_mlp"]["out"], jax.nn.gelu(linear(p["txt_mlp"]["in"], txt_n2),
                                         approximate=True))
    return img, txt, new_cache


def _slice_out(p, a, b):
    """Slice a (possibly quantized) linear's OUTPUT channels [a:b]."""
    if "w_qp" in p:
        return {"w_qp": p["w_qp"][:, a:b], "scale4": p["scale4"][:, a:b],
                "b": p["b"][a:b]}
    if "w_q" in p:
        return {"w_q": p["w_q"][:, a:b], "scale": p["scale"][:, a:b],
                "b": p["b"][a:b]}
    return {"w": p["w"][:, a:b], "b": p["b"][a:b]}


def single_block(p, cfg: MMDiTConfig, x, temb_act, rope, mode,
                 cache_k, cache_v, txt_bias=None, t_txt: int = 0):
    """Flux-style single-stream block: fused qkv+mlp projection, parallel
    attention and MLP, one output projection.  The stream is [txt ‖ img]
    (txt rows re-embed each step; in rags mode ALL active rows — txt and
    edited — attend as FRESH keys while their stale cache slots are
    bias-masked; reference inplace.py:736 instead rewrites them in place).

    x: [B, T_act, H]; cache head-major over [B, H, S_kv_img, dh] (image
    rows only; t_txt = number of leading txt rows in the stream, which are
    never cached).
    """
    heads = cfg.heads
    shift, scale, gate = _modulation(p["mod"], temb_act, 3)
    x_n = layernorm(x) * (1 + scale) + shift

    # Split the fused projection: qkv now, the MLP half AFTER attention
    # (ordering pinned by an optimization barrier below).  Keeping the
    # fused linear1's MLP half ([B, S, mlp_hidden], ~196 MB at 12B dense
    # seq) live across attention makes XLA's HLO remat pass re-run the
    # whole fused projection after attention whenever the surrounding
    # program carries the KV cache (write steps, and even plain dense
    # steps inside the sampler's jitted segments: trace showed remat ×190
    # for the 5 warm steps × 38 blocks, +~5.6 ms/block on v5e at 12B).
    # Deferring the MLP half keeps only x_n (~49 MB) live.  Same FLOPs,
    # bit-identical output (tests/test_sampler_tiny.py oracle).
    #
    # W8A8: both linear1 halves share x_n, so row_projector quantizes it
    # ONCE and the int8 copy (+row scales) is what crosses the barrier —
    # half the live bytes across attention vs the bf16 deferral (the
    # margin that kept W8A8 FLUX-1024px from compiling), and one quant
    # pass instead of two.
    from regione_tpu.models.layers import row_projector
    carry1, proj1 = row_projector(x_n, p["linear1"])
    qkv = proj1(_slice_out(p["linear1"], 0, 3 * cfg.inner), carry1)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = rmsnorm(split_heads(q, heads), p["norm_q"]["scale"])
    k = rmsnorm(split_heads(k, heads), p["norm_k"]["scale"])
    v = split_heads(v, heads)
    q = apply_rope(q, rope)
    k = apply_rope(k, rope)

    new_cache = None
    if mode == MODE_RAGS:
        from regione_tpu.models.layers import sdpa_cached
        attn = sdpa_cached(q, (k, v), cache_k, cache_v, bias=txt_bias)
    else:
        if mode == MODE_WRITE:
            # cache the IMAGE rows only (txt rows re-embed every step)
            k_img, v_img = k[:, :, t_txt:], v[:, :, t_txt:]
            if cfg.cache_quant:
                new_cache = (cfg._quantize_kv(k_img),
                             cfg._quantize_kv(v_img))
            else:
                new_cache = (k_img, v_img)
        attn = sdpa(q, k, v, bias=txt_bias)
    # deferred MLP half of linear1 (see the comment at the qkv projection):
    # the barrier pins the shared carry (int8 copy + scales under W8A8,
    # the bf16 x_n otherwise) and the ordering after attention
    carry1b, attn = jax.lax.optimization_barrier((carry1, attn))
    mlp_h = proj1(_slice_out(p["linear1"], 3 * cfg.inner, None), carry1b)
    out = linear(p["linear2"],
                 jnp.concatenate([attn, jax.nn.gelu(mlp_h, approximate=True)], -1))
    return x + gate * out, new_cache


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_cache(cfg: MMDiTConfig, batch: int, s_kv_img: int, t_txt: int,
               dtype=None):
    """Zero-initialized Region-Instruction KV cache pytree.

    Both block families cache only the IMAGE rows ([noise ‖ condition]):
    txt rows re-embed every step (fresh keys in rags mode), so caching
    them — as the reference's single-block processors do, inplace.py:736 —
    would store rows that are permanently stale/masked.  (`t_txt` is kept
    in the signature for call-site symmetry but no longer affects shapes.)

    Layout is [L, B, H, S, dh] — per-head rows CONTIGUOUS.  The reference
    stores merged [S, H*dh] rows (a torch convention); on TPU that layout
    forces either a transposed full-cache copy per block (~20 GB HBM
    traffic per RAGS step at dev scale) or half-bandwidth strided reads in
    the attention kernel.  Head-major layout makes the kernel's per-head
    K/V block a plain contiguous slice, and write mode stores the
    projection output (already head-split) without any transpose.

    With cfg.cache_int8 the K/V arrays are int8 plus per-(row, head) f32
    scale leaves ("dk_s", ...) of shape [L, B, H, S]; with cfg.cache_int4
    the rows are nibble-packed int8 of S/2 rows x full dh width (ops.quant
    quantize_kv_heads4 S-halves convention — packing along head_dim would
    leave a tile-padded 64-wide minor axis whose XLA layout copies OOM the
    1024^2 single-chip config) with the same scale leaves."""
    del t_txt
    dtype = dtype or (jnp.int8 if cfg.cache_quant else cfg.dtype)
    h, dh = cfg.heads, cfg.head_dim
    s_rows = s_kv_img
    if cfg.cache_int4:
        assert s_kv_img % 2 == 0, s_kv_img
        s_rows //= 2  # two int4 values per stored byte, packed along S
    cache = {
        "dk": jnp.zeros((cfg.depth_double, batch, h, s_rows, dh), dtype),
        "dv": jnp.zeros((cfg.depth_double, batch, h, s_rows, dh), dtype),
    }
    if cfg.depth_single:
        cache["sk"] = jnp.zeros(
            (cfg.depth_single, batch, h, s_rows, dh), dtype)
        cache["sv"] = jnp.zeros(
            (cfg.depth_single, batch, h, s_rows, dh), dtype)
    if cfg.cache_quant:
        # NB: each scale leaf must be a DISTINCT array — aliasing one
        # buffer into two pytree slots breaks donation (donating the same
        # buffer for two parameters is an InvalidArgument on TPU)
        def scales(depth):
            return jnp.full((depth, batch, h, s_kv_img), 1e-12, jnp.float32)
        cache["dk_s"] = scales(cfg.depth_double)
        cache["dv_s"] = scales(cfg.depth_double)
        if cfg.depth_single:
            cache["sk_s"] = scales(cfg.depth_single)
            cache["sv_s"] = scales(cfg.depth_single)
    return cache


def mmdit_forward(
    params,
    cfg: MMDiTConfig,
    img: jnp.ndarray,            # [B, T_img, in_channels]
    txt: jnp.ndarray,            # [B, T_txt, txt_in_dim]
    t: jnp.ndarray,              # [B] in [0, 1] (sigma)
    rope_img,                    # (cos, sin) over the T_img rows' positions
    rope_txt,                    # (cos, sin) over txt rows
    pooled: jnp.ndarray | None = None,   # [B, pooled_dim]
    guidance: jnp.ndarray | None = None,  # [B]
    *,
    mode: str = MODE_DENSE,
    cache=None,
    sel_img_ids: jnp.ndarray | None = None,  # [K_cap] padded ids into S_kv
    txt_bias=None,
):
    """Run the backbone in one of the three cache modes.

    Returns (v_pred [B, T_img, out_channels], new_cache).
    In rags mode T_img == K_cap and `sel_img_ids` maps rows into the cache.
    """
    from regione_tpu.models.layers import act_int8 as _act_int8_ctx
    with _act_int8_ctx(cfg.act_int8):
        return _mmdit_forward_body(
            params, cfg, img, txt, t, rope_img, rope_txt, pooled, guidance,
            mode=mode, cache=cache, sel_img_ids=sel_img_ids,
            txt_bias=txt_bias)


def _mmdit_forward_body(
    params, cfg, img, txt, t, rope_img, rope_txt, pooled=None, guidance=None,
    *, mode=MODE_DENSE, cache=None, sel_img_ids=None, txt_bias=None,
):
    if mode == MODE_WRITE and cache is None:
        # write mode fills the cache from scratch; auto-init (img covers the
        # full KV sequence in write mode)
        cache = init_cache(cfg, img.shape[0], img.shape[1], txt.shape[1])
    x = linear(params["x_embedder"], img.astype(cfg.dtype))
    temb = mlp_embed(params["time_in"],
                     timestep_embedding(t, cfg.time_embed_dim).astype(cfg.dtype))
    if cfg.pooled_dim and pooled is not None and cfg.connector is None:
        temb = temb + mlp_embed(params["vector_in"], pooled.astype(cfg.dtype))
    if cfg.guidance_embed and guidance is not None:
        temb = temb + mlp_embed(
            params["guidance_in"],
            timestep_embedding(guidance, cfg.time_embed_dim).astype(cfg.dtype))
    txt_in = txt.astype(cfg.dtype)
    if cfg.connector is not None:
        # Step1X: refine text features per timestep and derive the pooled
        # vector y from the connector (inplace.py:514-520)
        from regione_tpu.models.connector import connector_apply
        txt_mask = None
        if txt_bias is not None:
            txt_mask = txt_bias[:, 0, 0, :txt.shape[1]] > -1.0
        txt_in, y = connector_apply(params["connector"], cfg.connector,
                                    txt_in, t, txt_mask)
        if cfg.pooled_dim:
            temb = temb + mlp_embed(params["vector_in"], y.astype(cfg.dtype))
    temb_act = jax.nn.silu(temb)
    if cfg.txt_norm:
        txt_in = rmsnorm(txt_in, params["txt_norm"]["scale"])
    txt_h = linear(params["txt_in"], txt_in)

    t_txt = txt_h.shape[1]

    # ---- RAGS frozen-cache biases -----------------------------------------
    # RAGS attends [fresh rows ‖ cached rows] with the STALE cache rows
    # masked out: the edited rows' fresh K/V ride along with the queries
    # (they are computed every step anyway) and the cache is READ-ONLY
    # between refreshes.  Same key set as the reference's in-place row
    # scatter (fresh replaces stale), but with zero cache writes — no
    # scatter, no carry mutation, no double-buffered cache copies.
    dbl_bias = sgl_bias = None
    if mode == MODE_RAGS:
        b = x.shape[0]
        cap = sel_img_ids.shape[0]
        # full cached row count: the int4 rows leaf holds S/2 packed rows
        # (S-halves packing), so read S off the per-row scales instead
        s_kv = (cache["dk_s"] if cfg.cache_quant else cache["dk"]).shape[3]
        if txt_bias is not None:
            base_txt = txt_bias[:, 0, 0, :t_txt].astype(jnp.float32)
            base_img = txt_bias[:, 0, 0, t_txt:].astype(jnp.float32)
        else:
            base_txt = jnp.zeros((b, t_txt), jnp.float32)
            base_img = jnp.zeros((b, s_kv), jnp.float32)
        # fresh edited rows: padded slots (id == s_kv sentinel) masked
        fresh_edit = jnp.where(sel_img_ids < s_kv, 0.0, -1e30)
        fresh_edit = jnp.broadcast_to(fresh_edit[None], (b, cap))
        # cached image rows: stale (edited) positions masked
        stale_img = jnp.zeros((b, s_kv), jnp.float32).at[
            :, sel_img_ids].set(-1e30, mode="drop", unique_indices=True)
        dbl_bias = jnp.concatenate(
            [base_txt, fresh_edit, base_img + stale_img], axis=-1
        )[:, None, None, :]
        # single blocks see the same [fresh(txt+edited) ‖ cached img] key
        # layout: their cache stores image rows only (txt rows would be
        # permanently stale/masked, so they are not cached at all)
        sgl_bias = dbl_bias

    # ---- double-stream depth under scan ----
    if mode == MODE_DENSE:
        def dbody(carry, pl):
            xc, tc = carry
            xc, tc, _ = double_block(
                pl, cfg, xc, tc, temb_act, rope_img, rope_txt, mode,
                None, None, txt_bias)
            return (xc, tc), None

        (x, txt_h), _ = jax.lax.scan(dbody, (x, txt_h), params["double"])
        new_cache = None
    elif mode == MODE_RAGS:
        # read-only cache -> thread it as scan xs (per-layer slices)
        def _xs(prefix):
            if cfg.cache_quant:
                return (cache[prefix], cache[prefix + "_s"])
            return (cache[prefix],)

        def dbody(carry, xs):
            xc, tc = carry
            pl = xs[0]
            if cfg.cache_quant:
                ck, cv = (xs[1], xs[2]), (xs[3], xs[4])
            else:
                ck, cv = xs[1], xs[2]
            xc, tc, _ = double_block(
                pl, cfg, xc, tc, temb_act, rope_img, rope_txt, mode,
                ck, cv, dbl_bias)
            return (xc, tc), None

        (x, txt_h), _ = jax.lax.scan(
            dbody, (x, txt_h),
            (params["double"],) + _xs("dk") + _xs("dv"))
        new_cache = cache   # frozen
    else:  # MODE_WRITE: the cache is (re)built layer by layer, in place
        _upd = jax.lax.dynamic_update_index_in_dim

        def _store(stack, new, i):
            if cfg.cache_quant:
                return (_upd(stack[0], new[0], i, 0),
                        _upd(stack[1], new[1], i, 0))
            return _upd(stack, new, i, 0)

        def _pack(prefix):
            if cfg.cache_quant:
                return (cache[prefix], cache[prefix + "_s"])
            return cache[prefix]

        def dbody(carry, pl):
            xc, tc, dk, dv, i = carry
            xc, tc, (nk, nv) = double_block(
                pl, cfg, xc, tc, temb_act, rope_img, rope_txt, mode,
                None, None, txt_bias)
            return (xc, tc, _store(dk, nk, i), _store(dv, nv, i),
                    i + 1), None

        (x, txt_h, new_dk, new_dv, _), _ = jax.lax.scan(
            dbody, (x, txt_h, _pack("dk"), _pack("dv"), jnp.int32(0)),
            params["double"])
        if cfg.cache_quant:
            new_cache = {"dk": new_dk[0], "dk_s": new_dk[1],
                         "dv": new_dv[0], "dv_s": new_dv[1]}
        else:
            new_cache = {"dk": new_dk, "dv": new_dv}

    # ---- single-stream depth ----
    if cfg.depth_single:
        stream = jnp.concatenate([txt_h, x], axis=1)
        rope_stream = concat_rope(rope_txt, rope_img)

        if mode == MODE_DENSE:
            def sbody(sc, pl):
                sc, _ = single_block(pl, cfg, sc, temb_act, rope_stream,
                                     mode, None, None, txt_bias)
                return sc, None

            stream, _ = jax.lax.scan(sbody, stream, params["single"])
        elif mode == MODE_RAGS:
            def sbody(sc, xs):
                pl = xs[0]
                if cfg.cache_quant:
                    ck, cv = (xs[1], xs[2]), (xs[3], xs[4])
                else:
                    ck, cv = xs[1], xs[2]
                sc, _ = single_block(pl, cfg, sc, temb_act, rope_stream,
                                     mode, ck, cv, sgl_bias)
                return sc, None

            stream, _ = jax.lax.scan(
                sbody, stream, (params["single"],) + _xs("sk") + _xs("sv"))
        else:
            def sbody(carry, pl):
                sc, sk, sv, i = carry
                sc, (nk, nv) = single_block(
                    pl, cfg, sc, temb_act, rope_stream, mode,
                    None, None, txt_bias, t_txt=t_txt)
                return (sc, _store(sk, nk, i), _store(sv, nv, i),
                        i + 1), None

            (stream, new_sk, new_sv, _), _ = jax.lax.scan(
                sbody, (stream, _pack("sk"), _pack("sv"), jnp.int32(0)),
                params["single"])
            if cfg.cache_quant:
                new_cache.update(sk=new_sk[0], sk_s=new_sk[1],
                                 sv=new_sv[0], sv_s=new_sv[1])
            else:
                new_cache.update(sk=new_sk, sv=new_sv)
        x = stream[:, t_txt:]

    # ---- final AdaLN + projection ----
    shift, scale = _modulation(params["final_mod"], temb_act, 2)
    x = layernorm(x) * (1 + scale) + shift
    out = linear(params["final_proj"], x)
    return out, new_cache


# ---------------------------------------------------------------------------
# random init (tests, benchmarks, and scaled dev configs)
# ---------------------------------------------------------------------------

def init_mmdit(key: jax.Array, cfg: MMDiTConfig):
    """Random-init parameter pytree; block params stacked on layer axis 0."""
    dt = cfg.dtype
    h, inner, mh = cfg.hidden, cfg.inner, cfg.mlp_hidden
    keys = jax.random.split(key, 8)

    def init_norm():
        return {"scale": jnp.ones((cfg.head_dim,), dt)}

    def init_attn(k, d_model):
        ks = jax.random.split(k, 4)
        return {
            "q": init_linear(ks[0], d_model, inner, dt),
            "k": init_linear(ks[1], d_model, inner, dt),
            "v": init_linear(ks[2], d_model, inner, dt),
            "out": init_linear(ks[3], inner, d_model, dt),
            "norm_q": init_norm(),
            "norm_k": init_norm(),
        }

    def init_double(k):
        ks = jax.random.split(k, 8)
        return {
            "img_mod": init_linear(ks[0], h, 6 * h, dt),
            "txt_mod": init_linear(ks[1], h, 6 * h, dt),
            "img_attn": init_attn(ks[2], h),
            "txt_attn": init_attn(ks[3], h),
            "img_mlp": {"in": init_linear(ks[4], h, mh, dt),
                        "out": init_linear(ks[5], mh, h, dt)},
            "txt_mlp": {"in": init_linear(ks[6], h, mh, dt),
                        "out": init_linear(ks[7], mh, h, dt)},
        }

    def init_single(k):
        ks = jax.random.split(k, 3)
        return {
            "mod": init_linear(ks[0], h, 3 * h, dt),
            "linear1": init_linear(ks[1], h, 3 * inner + mh, dt),
            "linear2": init_linear(ks[2], inner + mh, h, dt),
            "norm_q": init_norm(),
            "norm_k": init_norm(),
        }

    params = {
        "x_embedder": init_linear(keys[0], cfg.in_channels, h, dt),
        "time_in": init_mlp_embed(keys[1], cfg.time_embed_dim, h, dt),
        "txt_in": init_linear(keys[2], cfg.txt_in_dim, h, dt),
        "final_mod": init_linear(keys[3], h, 2 * h, dt),
        "final_proj": init_linear(keys[4], h, cfg.out_channels, dt),
        "double": jax.vmap(init_double)(
            jax.random.split(keys[5], cfg.depth_double)),
    }
    if cfg.pooled_dim:
        params["vector_in"] = init_mlp_embed(keys[6], cfg.pooled_dim, h, dt)
    if cfg.txt_norm:
        params["txt_norm"] = {"scale": jnp.ones((cfg.txt_in_dim,), dt)}
    if cfg.connector is not None:
        from regione_tpu.models.connector import init_connector
        params["connector"] = init_connector(jax.random.fold_in(key, 7),
                                             cfg.connector)
    if cfg.guidance_embed:
        params["guidance_in"] = init_mlp_embed(keys[7], cfg.time_embed_dim, h, dt)
    if cfg.depth_single:
        params["single"] = jax.vmap(init_single)(
            jax.random.split(jax.random.fold_in(key, 99), cfg.depth_single))
    return params


def param_count(params) -> int:
    """Model parameter count; nibble-packed int4 leaves ("w_qp",
    ops.quant) hold two weights per stored byte."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        n = int(leaf.size)
        if str(getattr(path[-1], "key", path[-1])) == "w_qp":
            n *= 2
        total += n
    return total


# One fused device program for the whole init — eager per-layer init issues
# dozens of tiny dispatches, which is painfully slow on remote-attached TPUs.
init_mmdit_jit = jax.jit(init_mmdit, static_argnums=(1,))
