"""Reference-style dynamic-shape oracle of the RegionE algorithm.

This is an *independent second implementation* used only by tests: it
mirrors the torch reference's semantics literally — dynamic-size gathers,
Python-side stage bookkeeping, per-layer Python loops, and a KV cache that
stores RAW (pre-qk-norm, pre-RoPE) projections with norm/RoPE re-applied on
the full sequence each step, exactly as the reference attention processor
does (RegionE/Step1XEdit/inplace.py:723-798).  The production sampler uses a
very different formulation (static plan, fixed-capacity padding, attention-
ready cache, lax.scan) — agreement between the two validates the whole
algorithm: stage timeline, split-steps, KV freezing, AVD cache.

It shares only the low-level math primitives (linear/norms/rope/sdpa) with
the production code, so orchestration bugs cannot cancel out.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.core.schedule import build_sigmas, calculate_shift
from regione_tpu.models.layers import (
    apply_rope,
    layernorm,
    linear,
    mlp_embed,
    rmsnorm,
    rope_table,
    sdpa,
    split_heads,
    timestep_embedding,
)


def _tree_layer(params, i):
    return jax.tree.map(lambda x: x[i], params)


def _mods(p, temb_act, n):
    m = linear(p, temb_act)
    return jnp.split(m[:, None, :], n, axis=-1)


def _np_conv2d_same(img, kernel):
    h, w = img.shape
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(img.astype(np.float64), ((ph, ph), (pw, pw)))
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(h):
        for j in range(w):
            out[i, j] = (padded[i:i + kh, j:j + kw] * kernel).sum()
    return out


def oracle_token_selector(x0, cond, thr, grid_h, grid_w, erosion_dilation):
    """numpy transcription of reference utils.py:262-334 (cosine only)."""
    a = np.asarray(x0, np.float64)[0]
    b = np.asarray(cond, np.float64)[0]
    an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    bn = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    sim = (an * bn).sum(-1)
    mask = sim <= thr
    if erosion_dilation:
        m2 = mask.reshape(grid_h, grid_w).astype(np.float64)
        cross = np.zeros((3, 3)); cross[1, :] = 1; cross[:, 1] = 1
        sq = np.ones((5, 5))
        eroded = (_np_conv2d_same(m2, cross) == cross.sum())
        mask = (_np_conv2d_same(eroded.astype(np.float64), sq) > 0).reshape(-1)
    edited = np.nonzero(mask)[0]
    unedited = np.nonzero(~mask)[0]
    return edited, unedited


class OracleModel:
    """Dynamic-shape MMDiT forward with reference-style raw KV cache."""

    def __init__(self, params, cfg, t_txt, s_kv, batch):
        self.p = params
        self.cfg = cfg
        self.t_txt = t_txt
        self.s_kv = s_kv
        inner = cfg.inner
        self.dkv = [
            {"k": np.zeros((batch, s_kv, inner), np.float32),
             "v": np.zeros((batch, s_kv, inner), np.float32)}
            for _ in range(cfg.depth_double)]
        self.skv = [
            {"k": np.zeros((batch, t_txt + s_kv, inner), np.float32),
             "v": np.zeros((batch, t_txt + s_kv, inner), np.float32)}
            for _ in range(cfg.depth_single)]

    def rope_for(self, ids_float):
        return rope_table(jnp.asarray(ids_float), self.cfg.axes_dims,
                          self.cfg.rope_theta)

    def __call__(self, img, txt, sigma, img_pos, full_img_pos, txt_pos,
                 phase, sel_img, pooled=None, guidance=None):
        """img: [B, T, Cin]; phase in normal/write/rags; sel_img: np ids of
        the img rows within the cache (rags)."""
        cfg = self.cfg
        heads = cfg.heads
        b = img.shape[0]
        x = linear(self.p["x_embedder"], jnp.asarray(img, cfg.dtype))
        t = jnp.full((b,), sigma, cfg.dtype)
        temb = mlp_embed(self.p["time_in"],
                         timestep_embedding(t, cfg.time_embed_dim).astype(cfg.dtype))
        if cfg.pooled_dim and pooled is not None:
            temb = temb + mlp_embed(self.p["vector_in"], jnp.asarray(pooled, cfg.dtype))
        if cfg.guidance_embed and guidance is not None:
            temb = temb + mlp_embed(
                self.p["guidance_in"],
                timestep_embedding(jnp.asarray(guidance), cfg.time_embed_dim
                                   ).astype(cfg.dtype))
        temb_act = jax.nn.silu(temb)
        txt_feat = jnp.asarray(txt, cfg.dtype)
        if cfg.txt_norm:
            txt_feat = rmsnorm(txt_feat, self.p["txt_norm"]["scale"])
        txt_h = linear(self.p["txt_in"], txt_feat)

        rope_q_img = self.rope_for(img_pos)
        rope_k_img = self.rope_for(full_img_pos)
        rope_txt = self.rope_for(txt_pos)

        # ---- double blocks (python loop, raw cache) ----
        for l in range(cfg.depth_double):
            pl = _tree_layer(self.p["double"], l)
            st = self.dkv[l]
            (i_s1, i_c1, i_g1, i_s2, i_c2, i_g2) = _mods(pl["img_mod"], temb_act, 6)
            (t_s1, t_c1, t_g1, t_s2, t_c2, t_g2) = _mods(pl["txt_mod"], temb_act, 6)
            img_n = layernorm(x) * (1 + i_c1) + i_s1
            txt_n = layernorm(txt_h) * (1 + t_c1) + t_s1

            q_i = split_heads(linear(pl["img_attn"]["q"], img_n), heads)
            k_raw = np.array(linear(pl["img_attn"]["k"], img_n), np.float32)
            v_raw = np.array(linear(pl["img_attn"]["v"], img_n), np.float32)
            if phase == "write":
                st["k"], st["v"] = k_raw, v_raw
                k_full_raw, v_full_raw = k_raw, v_raw
                rope_k = rope_q_img
            elif phase == "normal":
                k_full_raw, v_full_raw = k_raw, v_raw
                rope_k = rope_q_img
            else:  # rags: in-place row update of the raw cache
                st["k"][:, sel_img] = k_raw
                st["v"][:, sel_img] = v_raw
                k_full_raw, v_full_raw = st["k"], st["v"]
                rope_k = rope_k_img
            k_full = rmsnorm(split_heads(jnp.asarray(k_full_raw), heads),
                             pl["img_attn"]["norm_k"]["scale"])
            k_full = apply_rope(k_full, rope_k)
            v_full = split_heads(jnp.asarray(v_full_raw), heads)
            q_i = apply_rope(rmsnorm(q_i, pl["img_attn"]["norm_q"]["scale"]),
                             rope_q_img)

            q_t = split_heads(linear(pl["txt_attn"]["q"], txt_n), heads)
            k_t = split_heads(linear(pl["txt_attn"]["k"], txt_n), heads)
            v_t = split_heads(linear(pl["txt_attn"]["v"], txt_n), heads)
            q_t = apply_rope(rmsnorm(q_t, pl["txt_attn"]["norm_q"]["scale"]), rope_txt)
            k_t = apply_rope(rmsnorm(k_t, pl["txt_attn"]["norm_k"]["scale"]), rope_txt)

            attn = sdpa(jnp.concatenate([q_t, q_i], 2),
                        jnp.concatenate([k_t, k_full], 2),
                        jnp.concatenate([v_t, v_full], 2))
            a_t, a_i = attn[:, :self.t_txt], attn[:, self.t_txt:]
            x = x + i_g1 * linear(pl["img_attn"]["out"], a_i)
            txt_h = txt_h + t_g1 * linear(pl["txt_attn"]["out"], a_t)
            x = x + i_g2 * linear(pl["img_mlp"]["out"], jax.nn.gelu(
                linear(pl["img_mlp"]["in"], layernorm(x) * (1 + i_c2) + i_s2),
                approximate=True))
            txt_h = txt_h + t_g2 * linear(pl["txt_mlp"]["out"], jax.nn.gelu(
                linear(pl["txt_mlp"]["in"], layernorm(txt_h) * (1 + t_c2) + t_s2),
                approximate=True))

        # ---- single blocks (txt ‖ img stream) ----
        if cfg.depth_single:
            stream = jnp.concatenate([txt_h, x], 1)
            s_pos = np.concatenate([txt_pos, img_pos], 0)
            s_full_pos = np.concatenate([txt_pos, full_img_pos], 0)
            rope_q_s = self.rope_for(s_pos)
            rope_k_s = self.rope_for(s_full_pos)
            if phase == "rags":
                sel_s = np.concatenate([np.arange(self.t_txt),
                                        np.asarray(sel_img) + self.t_txt])
            for l in range(cfg.depth_single):
                pl = _tree_layer(self.p["single"], l)
                st = self.skv[l]
                shift, scale, gate = _mods(pl["mod"], temb_act, 3)
                s_n = layernorm(stream) * (1 + scale) + shift
                fused = linear(pl["linear1"], s_n)
                qkv, mlp_h = jnp.split(fused, [3 * cfg.inner], -1)
                q, k, v = jnp.split(qkv, 3, -1)
                k_raw = np.array(k, np.float32)
                v_raw = np.array(v, np.float32)
                if phase == "write":
                    st["k"], st["v"] = k_raw, v_raw
                    k_full_raw, v_full_raw, rope_k = k_raw, v_raw, rope_q_s
                elif phase == "normal":
                    k_full_raw, v_full_raw, rope_k = k_raw, v_raw, rope_q_s
                else:
                    st["k"][:, sel_s] = k_raw
                    st["v"][:, sel_s] = v_raw
                    k_full_raw, v_full_raw, rope_k = st["k"], st["v"], rope_k_s
                q = apply_rope(rmsnorm(split_heads(q, heads),
                                       pl["norm_q"]["scale"]), rope_q_s)
                k_full = apply_rope(rmsnorm(split_heads(jnp.asarray(k_full_raw), heads),
                                            pl["norm_k"]["scale"]), rope_k)
                v_full = split_heads(jnp.asarray(v_full_raw), heads)
                attn = sdpa(q, k_full, v_full)
                out = linear(pl["linear2"], jnp.concatenate(
                    [attn, jax.nn.gelu(mlp_h, approximate=True)], -1))
                stream = stream + gate * out
            x = stream[:, self.t_txt:]

        shift, scale = _mods(self.p["final_mod"], temb_act, 2)
        x = layernorm(x) * (1 + scale) + shift
        return np.asarray(linear(self.p["final_proj"], x), np.float32)


def oracle_edit(params, cfg, re, gamma, lat0, cond_latent, txt,
                grid_h, grid_w, pooled=None, cfg_combine=None, neg_txt=None,
                cfg_scale=1.0, img_pos_ids=None, txt_pos_ids=None,
                guidance=None):
    """Full reference-style RegionE loop (dynamic shapes, host control flow).

    Replays: AVD (inplace.py:342-366), cond-concat gate (:377-378), the
    scheduler partition/refresh split-steps (:635-682), and Manager.step
    layout transitions (utils.py:384-415).  Returns final latents [1,S,C].
    """
    steps = re.num_inference_steps
    warmup, post = re.warmup_step, re.post_step
    s_noise = grid_h * grid_w
    mu = calculate_shift(s_noise)
    sigmas = build_sigmas(steps, mu=mu).astype(np.float64)
    timesteps = sigmas[:steps] * 1000.0

    do_cfg = cfg_combine is not None and cfg_scale > 1.0
    batch = 2 if do_cfg else 1

    # rope position ids (default: pipelines.base.latent_grid_ids layout;
    # override for backends with their own rope convention, e.g. Qwen)
    t_txt = txt.shape[1]
    if img_pos_ids is None:
        ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
        noise_pos = np.stack([np.zeros_like(ys), ys, xs], -1
                             ).reshape(-1, 3).astype(np.float32)
        cond_pos = noise_pos.copy(); cond_pos[:, 0] = 1.0
        full_img_pos = np.concatenate([noise_pos, cond_pos], 0)
    else:
        full_img_pos = np.asarray(img_pos_ids, np.float32)
        noise_pos = full_img_pos[:s_noise]
    txt_pos = (np.zeros((t_txt, 3), np.float32) if txt_pos_ids is None
               else np.asarray(txt_pos_ids, np.float32))

    model = OracleModel(params, cfg, t_txt, 2 * s_noise, batch)

    if do_cfg:
        txt_in = np.concatenate([txt, neg_txt], 0)
        pooled_in = np.concatenate([pooled, pooled], 0) if pooled is not None else None
    else:
        txt_in, pooled_in = txt, pooled

    lat = np.asarray(lat0, np.float32)
    cond = np.asarray(cond_latent, np.float32)
    refresh_rt = [r - 1 for r in re.refresh_with_sentinel]
    prev_refresh = None
    next_refresh = None
    edited = unedited = None
    unedited_latent = None
    avd_cache = None
    accumulate = 1.0

    def run_model(lat_in, i, phase, dense):
        if dense:
            img = np.concatenate([lat_in, cond], 1)
            img_pos = full_img_pos
            sel = None
        else:
            img = lat_in
            img_pos = noise_pos[edited]
            sel = edited
        if do_cfg:
            img = np.concatenate([img, img], 0)
        v = model(img, txt_in, float(sigmas[i]), img_pos, full_img_pos,
                  txt_pos, phase, sel, pooled=pooled_in,
                  guidance=(np.full((img.shape[0],), guidance, np.float32)
                            if guidance is not None else None))
        v = v[:, :lat_in.shape[1]]
        if do_cfg:
            v_pos, v_neg = v[:1], v[1:]
            v = cfg_combine(v_pos, v_neg, float(sigmas[i]))
        return v.astype(np.float32)

    for i in range(steps):
        # ---- AVD decision ----
        forced = (i <= warmup or i > steps - post - 1
                  or (prev_refresh is not None and i == prev_refresh))
        should_cache, ratio = False, 1.0
        if not forced:
            r = float(gamma[i - 1]) * (1 + (timesteps[i] - timesteps[i - 1]) / 1000)
            if r >= 1:
                accumulate = 1.0
            else:
                acc = accumulate * r
                if 1 - acc > re.cache_threshold:
                    accumulate = 1.0
                else:
                    should_cache, ratio, accumulate = True, r, acc
        else:
            accumulate = 1.0

        if should_cache:
            if avd_cache.shape[1] != lat.shape[1]:
                avd_cache = avd_cache[:, edited]
            v = avd_cache * ratio
        else:
            dense = (i <= warmup - 1 or i > steps - post - 1
                     or (prev_refresh is not None and i == prev_refresh))
            if i < warmup - 1 or i > steps - post - 1:
                phase = "normal"
            elif i == warmup - 1 or (prev_refresh is not None and i == prev_refresh):
                phase = "write"
            else:
                phase = "rags"
            v = run_model(lat, i, phase, dense)
            avd_cache = v

        # ---- scheduler ----
        sigma, dt = float(sigmas[i]), float(sigmas[i + 1] - sigmas[i])
        if i == warmup - 1:
            prev_refresh = refresh_rt.pop(0)
            dt_jump = float(sigmas[prev_refresh] - sigma)
            dt_final = float(sigmas[-1] - sigma)
            x0 = lat + dt_final * v
            edited, unedited = oracle_token_selector(
                x0, cond, re.threshold, grid_h, grid_w, re.erosion_dilation)
            new = np.zeros_like(lat)
            new[:, edited] = lat[:, edited] + dt * v[:, edited]
            new[:, unedited] = lat[:, unedited] + dt_jump * v[:, unedited]
            lat = new
        elif prev_refresh is not None and i == prev_refresh and refresh_rt:
            next_refresh = refresh_rt.pop(0)
            dt_jump = float(sigmas[next_refresh] - sigma)
            new = np.zeros_like(lat)
            new[:, edited] = lat[:, edited] + dt * v[:, edited]
            new[:, unedited] = lat[:, unedited] + dt_jump * v[:, unedited]
            lat = new
        else:
            lat = lat + dt * v

        # ---- manager.step ----
        nxt = i + 1
        if nxt == warmup:
            unedited_latent = lat[:, unedited]
            lat = lat[:, edited]
        elif nxt == steps - post:
            full = np.zeros((1, s_noise, lat.shape[-1]), np.float32)
            full[:, edited] = lat
            full[:, unedited] = unedited_latent
            lat = full
            prev_refresh = None
        elif prev_refresh is not None and nxt == prev_refresh:
            full = np.zeros((1, s_noise, lat.shape[-1]), np.float32)
            full[:, edited] = lat
            full[:, unedited] = unedited_latent
            lat = full
        elif prev_refresh is not None and nxt == prev_refresh + 1:
            unedited_latent = lat[:, unedited]
            lat = lat[:, edited]
            prev_refresh = next_refresh

    return lat, edited
