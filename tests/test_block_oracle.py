"""Torch-oracle forward parity for the MMDiT block math.

The converter roundtrip (tests/test_convert.py) proves the NAME mapping;
these tests prove the SEMANTICS: an independent torch transcription of the
diffusers transformer forward the reference inherits — AdaLN modulation
order, qk-RMSNorm placement, RoPE application, joint-attention layout
([txt ‖ img], reference RegionE/Step1XEdit/inplace.py:780-790 and
RegionE/QwenImageEdit/inplace.py:858-862), single-block txt-in-stream
concat, final AdaLayerNormContinuous [scale, shift] order — fed from the
converter's inverse state dict, compared against the JAX forward.

A name-correct converter feeding an architecturally-divergent forward
would produce garbage only discoverable at real-weight bring-up; this is
the CPU-only guard against that.

Torch transcription sources (NOT the repo's own oracle):
  * FluxTransformerBlock / FluxSingleTransformerBlock math as invoked by
    the reference's patched forward (RegionE/Step1XEdit/inplace.py:460-580,
    attention processor :699-830);
  * QwenImageTransformerBlock math + complex-rope application
    (RegionE/QwenImageEdit/inplace.py:462-571, processor :722-905,
    apply_rotary_emb_qwen use_real=False);
  * diffusers AutoencoderKL UNetMidBlock2D (resnet -> 1-head attention ->
    resnet) for the VAE decoder mid-block.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from regione_tpu.core.config import RegionEParams
from regione_tpu.models.mmdit import MODE_DENSE, init_mmdit, mmdit_forward
from regione_tpu.models.presets import get_config
from regione_tpu.weights.convert import convert_flux_transformer
from tests.test_convert import synth_state_from_params

TOL = dict(rtol=5e-4, atol=5e-4)


def _randomized_params(cfg, seed):
    """Random pytree with every leaf (incl. norm scales and biases, which
    init as ones/zeros) drawn fresh, so each mapping rule is exercised."""
    params = init_mmdit(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape) * 0.2, jnp.float32),
        params)


def _sd(state):
    return {k: torch.tensor(np.asarray(v, np.float32)) for k, v in state.items()}


def _lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _rms_t(x, w, eps=1e-6):
    """diffusers RMSNorm (fp32 variance)."""
    v = x.float().pow(2).mean(-1, keepdim=True)
    return x.float() * torch.rsqrt(v + eps) * w.float()


def _ln_t(x, dim):
    return F.layer_norm(x, (dim,), eps=1e-6)


def _gelu_t(x):
    return F.gelu(x, approximate="tanh")


def _timestep_emb_t(t, dim, max_period=10000.0):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0) over t*1000 (the reference forward embeds
    `timestep * 1000`, inplace.py:521)."""
    t = t.float() * 1000.0
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _mlp_embed_t(sd, prefix, x):
    return _lin(sd, f"{prefix}.linear_2", F.silu(_lin(sd, f"{prefix}.linear_1", x)))


# --- rope transcriptions -----------------------------------------------------

def _rope_real_t(ids, axes_dims, theta):
    """diffusers FluxPosEmbed: per-axis get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=True) -> (cos, sin) [S, head_dim]."""
    cos_l, sin_l = [], []
    for a, d in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=torch.float32)[: d // 2] / d))
        angles = torch.outer(ids[:, a].float(), freqs)
        cos_l.append(angles.cos().repeat_interleave(2, dim=-1))
        sin_l.append(angles.sin().repeat_interleave(2, dim=-1))
    return torch.cat(cos_l, -1), torch.cat(sin_l, -1)


def _apply_rope_real_t(x, cos, sin):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1);
    x: [B, H, S, D], cos/sin: [S, D]."""
    xr = x.float().reshape(*x.shape[:-1], -1, 2)
    x_rot = torch.stack([-xr[..., 1], xr[..., 0]], dim=-1).reshape(x.shape)
    return x.float() * cos + x_rot * sin


def _rope_complex_t(ids, axes_dims, theta):
    """diffusers QwenEmbedRope.rope_params per axis -> [S, head_dim/2]
    complex freqs_cis."""
    parts = []
    for a, d in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (torch.arange(0, d, 2, dtype=torch.float32)[: d // 2] / d))
        angles = torch.outer(ids[:, a].float(), freqs)
        parts.append(torch.polar(torch.ones_like(angles), angles))
    return torch.cat(parts, -1)


def _apply_rope_complex_t(x, freqs_cis):
    """apply_rotary_emb_qwen(use_real=False); x: [B, H, S, D],
    freqs_cis: [S, D/2] complex."""
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    out = torch.view_as_real(xc * freqs_cis[None, None])  # [B,H,S,D/2,2]
    return out.reshape(x.shape)


def _heads_t(x, heads):
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(1, 2)


def _merge_t(x):
    b, h, s, d = x.shape
    return x.transpose(1, 2).reshape(b, s, h * d)


# --- torch transcription of the full forward ---------------------------------

def _double_block_t(sd, p, img, txt, temb_silu, heads, rope_apply):
    """FluxTransformerBlock / QwenImageTransformerBlock math: identical
    modulation layout ([shift1, scale1, gate1, shift2, scale2, gate2]; Flux
    AdaLayerNormZero and Qwen's chunk(2)->_modulate both resolve to it),
    joint attention with txt rows FIRST.

    rope_apply(q_or_k, is_txt_rows) applies the family's rotary scheme to
    a [B, H, S, D] tensor holding [txt ‖ img] rows."""
    h = img.shape[-1]
    i_mod = _lin(sd, f"{p}.norm1.linear", temb_silu)
    t_mod = _lin(sd, f"{p}.norm1_context.linear", temb_silu)
    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = i_mod.chunk(6, -1)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = t_mod.chunk(6, -1)

    img_n = _ln_t(img, h) * (1 + i_sc1[:, None]) + i_sh1[:, None]
    txt_n = _ln_t(txt, h) * (1 + t_sc1[:, None]) + t_sh1[:, None]

    q_i = _heads_t(_lin(sd, f"{p}.attn.to_q", img_n), heads)
    k_i = _heads_t(_lin(sd, f"{p}.attn.to_k", img_n), heads)
    v_i = _heads_t(_lin(sd, f"{p}.attn.to_v", img_n), heads)
    q_i = _rms_t(q_i, sd[f"{p}.attn.norm_q.weight"])
    k_i = _rms_t(k_i, sd[f"{p}.attn.norm_k.weight"])
    q_t = _heads_t(_lin(sd, f"{p}.attn.add_q_proj", txt_n), heads)
    k_t = _heads_t(_lin(sd, f"{p}.attn.add_k_proj", txt_n), heads)
    v_t = _heads_t(_lin(sd, f"{p}.attn.add_v_proj", txt_n), heads)
    q_t = _rms_t(q_t, sd[f"{p}.attn.norm_added_q.weight"])
    k_t = _rms_t(k_t, sd[f"{p}.attn.norm_added_k.weight"])

    # joint attention, txt first (inplace.py:780-782 / :858-862)
    q = rope_apply(torch.cat([q_t, q_i], dim=2))
    k = rope_apply(torch.cat([k_t, k_i], dim=2))
    v = torch.cat([v_t, v_i], dim=2)
    attn = F.scaled_dot_product_attention(q, k, v.float())
    attn = _merge_t(attn)
    t_len = txt.shape[1]
    a_txt, a_img = attn[:, :t_len], attn[:, t_len:]

    img = img + i_g1[:, None] * _lin(sd, f"{p}.attn.to_out.0", a_img)
    txt = txt + t_g1[:, None] * _lin(sd, f"{p}.attn.to_add_out", a_txt)

    img_n2 = _ln_t(img, h) * (1 + i_sc2[:, None]) + i_sh2[:, None]
    img = img + i_g2[:, None] * _lin(
        sd, f"{p}.ff.net.2", _gelu_t(_lin(sd, f"{p}.ff.net.0.proj", img_n2)))
    txt_n2 = _ln_t(txt, h) * (1 + t_sc2[:, None]) + t_sh2[:, None]
    txt = txt + t_g2[:, None] * _lin(
        sd, f"{p}.ff_context.net.2",
        _gelu_t(_lin(sd, f"{p}.ff_context.net.0.proj", txt_n2)))
    return img, txt


def _single_block_t(sd, p, x, temb_silu, heads, rope_apply):
    """FluxSingleTransformerBlock: stream = [txt ‖ img], AdaLayerNormZero-
    Single chunk(3) = (shift, scale, gate), parallel attn + MLP, one
    proj_out over [attn ‖ gelu(mlp)]."""
    h = x.shape[-1]
    sh, sc, g = _lin(sd, f"{p}.norm.linear", temb_silu).chunk(3, -1)
    x_n = _ln_t(x, h) * (1 + sc[:, None]) + sh[:, None]
    mlp = _gelu_t(_lin(sd, f"{p}.proj_mlp", x_n))
    q = _rms_t(_heads_t(_lin(sd, f"{p}.attn.to_q", x_n), heads),
               sd[f"{p}.attn.norm_q.weight"])
    k = _rms_t(_heads_t(_lin(sd, f"{p}.attn.to_k", x_n), heads),
               sd[f"{p}.attn.norm_k.weight"])
    v = _heads_t(_lin(sd, f"{p}.attn.to_v", x_n), heads)
    attn = F.scaled_dot_product_attention(rope_apply(q), rope_apply(k),
                                          v.float())
    out = _lin(sd, f"{p}.proj_out", torch.cat([_merge_t(attn), mlp], -1))
    return x + g[:, None] * out


def _final_t(sd, x, temb_silu):
    """AdaLayerNormContinuous: linear(silu(temb)) -> [scale, shift]
    (REVERSED vs block modulation) -> LN*(1+scale)+shift -> proj_out."""
    emb = _lin(sd, "norm_out.linear", temb_silu)
    scale, shift = emb.chunk(2, -1)
    x = _ln_t(x, x.shape[-1]) * (1 + scale[:, None]) + shift[:, None]
    return _lin(sd, "proj_out", x)


# --- tests --------------------------------------------------------------------

def test_flux_family_forward_matches_torch_oracle():
    """tiny-flux (2 double + 2 single, pooled CLIP vec, guidance embed) —
    full dense forward vs the torch transcription, weights fed through the
    converter's inverse state dict."""
    from regione_tpu.pipelines.flux_kontext import FluxKontextPipeline

    cfg = get_config("tiny-flux")
    params = _randomized_params(cfg, 11)
    state = synth_state_from_params(params, cfg)
    back = jax.tree.map(jnp.asarray, convert_flux_transformer(dict(state), cfg))

    rng = np.random.default_rng(12)
    b, grid, t_txt = 2, 4, 6
    s_img = 2 * grid * grid  # noise + condition rows
    img = rng.standard_normal((b, s_img, cfg.in_channels)).astype(np.float32)
    txt = rng.standard_normal((b, t_txt, cfg.txt_in_dim)).astype(np.float32)
    pooled = rng.standard_normal((b, cfg.pooled_dim)).astype(np.float32)
    t = np.asarray([0.7, 0.2], np.float32)
    gs = np.asarray([3.5, 3.5], np.float32)

    pipe = FluxKontextPipeline(cfg, back, RegionEParams())
    ids_img, ids_txt = pipe.rope_position_ids(grid, grid, t_txt)
    rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)

    got, _ = mmdit_forward(back, cfg, jnp.asarray(img), jnp.asarray(txt),
                           jnp.asarray(t), rope_img, rope_txt,
                           pooled=jnp.asarray(pooled),
                           guidance=jnp.asarray(gs), mode=MODE_DENSE)

    # ---- torch oracle -----------------------------------------------------
    sd = _sd(state)
    xt = _lin(sd, "x_embedder", torch.tensor(img))
    temb = _mlp_embed_t(sd, "time_text_embed.timestep_embedder",
                        _timestep_emb_t(torch.tensor(t), cfg.time_embed_dim))
    temb = temb + _mlp_embed_t(sd, "time_text_embed.text_embedder",
                               torch.tensor(pooled))
    temb = temb + _mlp_embed_t(
        sd, "time_text_embed.guidance_embedder",
        _timestep_emb_t(torch.tensor(gs), cfg.time_embed_dim))
    temb_silu = F.silu(temb)
    txt_h = _lin(sd, "context_embedder", torch.tensor(txt))

    ids = torch.tensor(np.concatenate([ids_txt, ids_img], 0))
    cos, sin = _rope_real_t(ids, cfg.axes_dims, cfg.rope_theta)
    rope_all = lambda x: _apply_rope_real_t(x, cos, sin)

    for i in range(cfg.depth_double):
        xt, txt_h = _double_block_t(sd, f"transformer_blocks.{i}", xt, txt_h,
                                    temb_silu, cfg.heads, rope_all)
    stream = torch.cat([txt_h, xt], dim=1)
    for i in range(cfg.depth_single):
        stream = _single_block_t(sd, f"single_transformer_blocks.{i}", stream,
                                 temb_silu, cfg.heads, rope_all)
    xt = stream[:, t_txt:]
    want = _final_t(sd, xt, temb_silu).numpy()

    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_qwen_family_forward_matches_torch_oracle():
    """tiny-qwen (3 joint double blocks, txt RMSNorm, no pooled) — full
    dense forward vs the torch transcription, with the Qwen centered rope
    ids applied via the reference's COMPLEX rotary path
    (apply_rotary_emb_qwen use_real=False, inplace.py:850-856)."""
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline

    cfg = get_config("tiny-qwen")
    params = _randomized_params(cfg, 21)
    state = synth_state_from_params(params, cfg)
    back = jax.tree.map(jnp.asarray, convert_flux_transformer(dict(state), cfg))

    rng = np.random.default_rng(22)
    b, grid, t_txt = 2, 4, 5
    s_img = 2 * grid * grid
    img = rng.standard_normal((b, s_img, cfg.in_channels)).astype(np.float32)
    txt = rng.standard_normal((b, t_txt, cfg.txt_in_dim)).astype(np.float32)
    t = np.asarray([0.9, 0.35], np.float32)

    pipe = QwenImageEditPipeline(cfg, back, RegionEParams())
    ids_img, ids_txt = pipe.rope_position_ids(grid, grid, t_txt)
    rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)

    got, _ = mmdit_forward(back, cfg, jnp.asarray(img), jnp.asarray(txt),
                           jnp.asarray(t), rope_img, rope_txt,
                           mode=MODE_DENSE)

    # ---- torch oracle -----------------------------------------------------
    sd = _sd(state)
    xt = _lin(sd, "x_embedder", torch.tensor(img))
    temb = _mlp_embed_t(sd, "time_text_embed.timestep_embedder",
                        _timestep_emb_t(torch.tensor(t), cfg.time_embed_dim))
    temb_silu = F.silu(temb)
    # Qwen: RMSNorm on the raw text features before txt_in
    # (QwenImageEdit/inplace.py:519-520)
    txt_n = _rms_t(torch.tensor(txt), sd["txt_norm.weight"])
    txt_h = _lin(sd, "context_embedder", txt_n)

    fc_img = _rope_complex_t(torch.tensor(ids_img), cfg.axes_dims,
                             cfg.rope_theta)
    fc_txt = _rope_complex_t(torch.tensor(ids_txt), cfg.axes_dims,
                             cfg.rope_theta)
    fc_all = torch.cat([fc_txt, fc_img], dim=0)
    rope_all = lambda x: _apply_rope_complex_t(x, fc_all)

    for i in range(cfg.depth_double):
        xt, txt_h = _double_block_t(sd, f"transformer_blocks.{i}", xt, txt_h,
                                    temb_silu, cfg.heads, rope_all)
    want = _final_t(sd, xt, temb_silu).numpy()

    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_vae_decoder_midblock_matches_torch_oracle():
    """VAE decoder mid-block (resnet -> 1-head spatial attention -> resnet)
    vs a torch transcription of diffusers UNetMidBlock2D, fed from the
    converter's inverse state dict."""
    from regione_tpu.models import vae as V
    from regione_tpu.weights.convert import TrackingState, convert_vae
    from tests.test_convert import synth_vae_state

    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    params = V.init_vae(jax.random.PRNGKey(5), vae_cfg)
    rng = np.random.default_rng(5)
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape) * 0.2, jnp.float32),
        params)
    state = synth_vae_state(params)
    back = convert_vae(TrackingState(state), vae_cfg)
    mid = jax.tree.map(jnp.asarray, back["decoder"]["mid"])

    c = vae_cfg.block_out_channels[-1]
    g = vae_cfg.norm_num_groups
    x = rng.standard_normal((1, 6, 6, c)).astype(np.float32)

    h = V.resnet_block(mid["res1"], jnp.asarray(x), g)
    h = V.attn_block(mid["attn"], h, g)
    got = np.asarray(V.resnet_block(mid["res2"], h, g))

    # ---- torch oracle (NCHW) ----------------------------------------------
    sd = _sd(state)
    pre = "decoder.mid_block"

    def resnet_t(p, x):
        h = F.group_norm(x, g, sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"],
                         eps=1e-6)
        h = F.conv2d(F.silu(h), sd[f"{p}.conv1.weight"],
                     sd[f"{p}.conv1.bias"], padding=1)
        h = F.group_norm(h, g, sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"],
                         eps=1e-6)
        h = F.conv2d(F.silu(h), sd[f"{p}.conv2.weight"],
                     sd[f"{p}.conv2.bias"], padding=1)
        return x + h

    def attn_t(p, x):
        b, ch, hh, ww = x.shape
        y = F.group_norm(x, g, sd[f"{p}.group_norm.weight"],
                         sd[f"{p}.group_norm.bias"], eps=1e-6)
        y = y.reshape(b, ch, hh * ww).transpose(1, 2)  # [B, HW, C]
        q, k, v = (_lin(sd, f"{p}.to_q", y), _lin(sd, f"{p}.to_k", y),
                   _lin(sd, f"{p}.to_v", y))
        # 1-head attention, scale 1/sqrt(C) (diffusers Attention heads=1)
        a = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None]
                                           )[:, 0]
        o = _lin(sd, f"{p}.to_out.0", a)
        return x + o.transpose(1, 2).reshape(b, ch, hh, ww)

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    ht = resnet_t(f"{pre}.resnets.0", xt)
    ht = attn_t(f"{pre}.attentions.0", ht)
    want = resnet_t(f"{pre}.resnets.1", ht).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(got, want, **TOL)
