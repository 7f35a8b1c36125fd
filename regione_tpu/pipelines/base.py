"""Backend-generic editing pipeline: wires an MMDiT backbone to the RegionE
sampler.

Responsibilities mirrored from the reference's per-model `__call__`
reimplementations (RegionE/Step1XEdit/inplace.py:73-457 and twins), factored
once instead of five times:

  * latent token geometry and 3-axis RoPE id construction (noise tokens get
    axis0=0, condition tokens axis0=1 — FLUX-Kontext convention);
  * condition-latent concatenation on dense steps only
    (reference inplace.py:377-378);
  * classifier-free guidance assembly.  Step1X concatenates cond/uncond on
    the batch axis (inplace.py:381-385); Qwen runs two tagged forwards
    sequentially (QwenImageEdit/inplace.py:371-399) — on TPU we batch the
    two passes instead (mathematically identical: attention never mixes
    batch rows, and each batch row owns its own KV-cache slice, which
    subsumes the reference's per-tag cache pairs k_cache_even/odd);
  * per-backend guidance combine rules (plain / norm-processed /
    norm-preserving) via `combine_cfg`.

Subclasses: Step1XEditPipeline, FluxKontextPipeline, QwenImageEditPipeline...
"""

from __future__ import annotations

import dataclasses

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from regione_tpu.core.config import RegionEParams
from regione_tpu.core.gamma import gamma_for
from regione_tpu.core.sampler import RegionESampler, SampleStats
from regione_tpu.core.schedule import build_sigmas, build_stage_plan, calculate_shift
from regione_tpu.models.layers import gather_rope, rope_table
from regione_tpu.models.mmdit import (
    MMDiTConfig,
    MODE_DENSE,
    MODE_RAGS,
    MODE_WRITE,
    init_cache,
    mmdit_forward,
)


def latent_grid_ids(grid_h: int, grid_w: int, axis0: int = 0) -> np.ndarray:
    """[S, 3] (axis0, y, x) rotary position ids for a token grid."""
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    ids = np.stack([np.full_like(ys, axis0), ys, xs], axis=-1)
    return ids.reshape(-1, 3).astype(np.float32)


def txt_ids(t_txt: int) -> np.ndarray:
    """Text rotary ids: zeros (FLUX/Step1X convention)."""
    return np.zeros((t_txt, 3), np.float32)


@dataclasses.dataclass
class EditInputs:
    """Per-image prepared inputs (the `ctx` pytree threaded through jit)."""
    txt: jnp.ndarray               # [Bc, T_txt, txt_in_dim] (Bc=2 if batch CFG)
    cond_latent: jnp.ndarray       # [1, S_cond, C]
    rope_img: Any                  # (cos, sin) over S_kv = S_noise + S_cond rows
    rope_txt: Any                  # (cos, sin) over T_txt rows
    pooled: jnp.ndarray | None = None    # [Bc, pooled_dim]
    guidance: jnp.ndarray | None = None  # [Bc]
    txt_bias: jnp.ndarray | None = None  # additive attention bias for padded txt
    extra: dict = dataclasses.field(default_factory=dict)


jax.tree_util.register_dataclass(
    EditInputs,
    data_fields=["txt", "cond_latent", "rope_img", "rope_txt", "pooled",
                 "guidance", "txt_bias", "extra"],
    meta_fields=[],
)


class EditPipelineBase:
    """Shared machinery; subclasses set `backend`, CFG policy and encoders."""

    backend: str = "generic"
    uses_batch_cfg: bool = False   # duplicate inputs on batch axis for CFG
    cond_axis0: int = 1            # rope axis-0 tag for condition tokens
    # uncond text when the caller passes none.  Step1X's reference __call__
    # resolves to "" when an image is present (inplace.py:230); the Qwen
    # family drivers pass " " — a single space — explicitly
    # (src/Qwen-Image/main.py:59, src/Qwen-Image-Edit-2509/main.py:60)
    default_negative_prompt: str = ""

    def __init__(
        self,
        model_cfg: MMDiTConfig,
        params,
        re_params: RegionEParams | None = None,
        gamma: np.ndarray | None = None,
        true_cfg_scale: float = 1.0,
    ):
        self.cfg = model_cfg
        self.params = params
        self.re = (re_params or RegionEParams()).validate()
        self.gamma = gamma if gamma is not None else gamma_for(self.backend)
        self.true_cfg_scale = true_cfg_scale
        self._samplers: dict[tuple, RegionESampler] = {}

    # -- backend hooks ------------------------------------------------------

    def combine_cfg(self, v_pos, v_neg, sigma):
        """Default: plain true-CFG combine."""
        return v_neg + self.true_cfg_scale * (v_pos - v_neg)

    @property
    def do_cfg(self) -> bool:
        return self.uses_batch_cfg and self.true_cfg_scale > 1.0

    # -- rope / geometry ----------------------------------------------------

    def build_rope(self, grid_h: int, grid_w: int, t_txt: int,
                   cond_grids: list[tuple[int, int]] | None = None):
        """Rotary tables for [noise ‖ condition] image rows and txt rows.

        cond_grids: token-grid shapes of the condition image(s); each gets
        a distinct axis-0 tag (1, 2, ...) so multi-reference conditioning
        (Qwen-Image-Edit-2509) keeps references positionally separable —
        the TPU-native analogue of the reference's per-image img_shapes
        entries (RegionE/QwenImageEditPlus/inplace.py:293-300)."""
        kv_ids, t_ids = self.rope_position_ids(grid_h, grid_w, t_txt,
                                               cond_grids)
        rope_img = rope_table(jnp.asarray(kv_ids), self.cfg.axes_dims,
                              self.cfg.rope_theta)
        rope_t = rope_table(jnp.asarray(t_ids), self.cfg.axes_dims,
                            self.cfg.rope_theta)
        return rope_img, rope_t

    def rope_position_ids(self, grid_h: int, grid_w: int, t_txt: int,
                          cond_grids=None):
        """Raw [S, 3] rotary position ids for [noise ‖ conds] and txt."""
        cond_grids = cond_grids or [(grid_h, grid_w)]
        parts = [latent_grid_ids(grid_h, grid_w, axis0=0)]
        for i, (ch, cw) in enumerate(cond_grids):
            parts.append(latent_grid_ids(ch, cw, axis0=self.cond_axis0 + i))
        return np.concatenate(parts, 0), txt_ids(t_txt)

    # -- model forward hooks passed to the sampler --------------------------

    def _expand_cfg(self, x):
        """Duplicate the latent stream on the batch axis for batch CFG."""
        if self.do_cfg:
            return jnp.concatenate([x, x], axis=0)
        return x

    def _combine(self, v, sigma):
        v = v.astype(jnp.float32)
        if self.do_cfg:
            v_pos, v_neg = jnp.split(v, 2, axis=0)
            return self.combine_cfg(v_pos, v_neg, sigma)
        return v

    def _params(self, ctx: EditInputs):
        """Model params travel inside the ctx pytree (a jit argument) so the
        weights are NOT captured as compile-time constants — closing over
        self.params would embed gigabytes into the HLO."""
        return ctx.extra.get("params", self.params)

    def dense_forward(self, lat, sigma, cache, ctx: EditInputs, write: bool):
        """Full-sequence forward: [noise ‖ condition] image stream."""
        s_noise = lat.shape[1]
        img_in = jnp.concatenate(
            [lat.astype(self.cfg.dtype),
             jnp.broadcast_to(ctx.cond_latent.astype(self.cfg.dtype),
                              (lat.shape[0],) + ctx.cond_latent.shape[1:])],
            axis=1)
        img_in = self._expand_cfg(img_in)
        b = img_in.shape[0]
        t = jnp.full((b,), sigma, self.cfg.dtype)
        v, cache = mmdit_forward(
            self._params(ctx), self.cfg, img_in, ctx.txt, t,
            ctx.rope_img, ctx.rope_txt,
            pooled=ctx.pooled, guidance=ctx.guidance,
            mode=MODE_WRITE if write else MODE_DENSE, cache=cache,
            txt_bias=ctx.txt_bias)
        v = v[:, :s_noise]
        return self._combine(v, sigma), cache

    def rags_forward(self, lat_act, sigma, cache, ids, ctx: EditInputs):
        """Gathered edited-token forward against the frozen KV cache."""
        img_in = self._expand_cfg(lat_act.astype(self.cfg.dtype))
        b = img_in.shape[0]
        t = jnp.full((b,), sigma, self.cfg.dtype)
        # The sampler pads ids with sentinel S_noise (invalid for latents but
        # a REAL row — the first condition token — in the S_kv=2*S_noise KV
        # cache).  Remap invalid slots to S_kv (one past the cache): the
        # frozen-cache bias treats id==S_kv as a masked fresh column and its
        # stale-row scatter drops it, so pads never touch real rows.
        s_noise = ctx.extra.get("s_noise", ctx.cond_latent.shape[1])
        s_kv = s_noise + ctx.cond_latent.shape[1]
        ids_cache = jnp.where(ids < s_noise, ids, s_kv)
        rope_act = gather_rope(ctx.rope_img, ids_cache)
        v, cache = mmdit_forward(
            self._params(ctx), self.cfg, img_in, ctx.txt, t,
            rope_act, ctx.rope_txt,
            pooled=ctx.pooled, guidance=ctx.guidance,
            mode=MODE_RAGS, cache=cache, sel_img_ids=ids_cache,
            txt_bias=ctx.txt_bias)
        return self._combine(v, sigma), cache

    # -- sampler construction ------------------------------------------------

    def sampler_for(self, grid_h: int, grid_w: int, t_txt: int,
                    batch_cache: int, s_cond: int | None = None
                    ) -> RegionESampler:
        s_noise = grid_h * grid_w
        s_cond = s_noise if s_cond is None else s_cond
        key = (grid_h, grid_w, t_txt, batch_cache, s_cond)
        if key in self._samplers:
            return self._samplers[key]
        steps = self.re.num_inference_steps
        mu = calculate_shift(s_noise)
        sigmas = build_sigmas(steps, mu=mu)
        plan = build_stage_plan(self.re, sigmas, self.gamma)
        s_kv = s_noise + s_cond  # noise + condition rows

        def make_cache():
            return init_cache(self.cfg, batch_cache, s_kv, t_txt)

        sampler = RegionESampler(
            plan, self.re,
            grid_h=grid_h, grid_w=grid_w,
            dense_forward=self.dense_forward,
            rags_forward=self.rags_forward,
            init_cache=make_cache,
            progress_cb=getattr(self, "progress_cb", None),
            dense_chunk=getattr(self, "dense_chunk", None),
        )
        self._samplers[key] = sampler
        return sampler

    # -- image-level API ------------------------------------------------------

    def attach_vae(self, vae_cfg, vae_params) -> "EditPipelineBase":
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        return self

    def attach_text_encoder(self, encoder) -> "EditPipelineBase":
        self.text_encoder = encoder
        return self

    @property
    def token_factor(self) -> int:
        """Pixels per latent token edge: VAE spatial factor x patch 2."""
        vc = getattr(self, "vae_cfg", None)
        return (vc.spatial_factor * 2) if vc is not None else 16

    def target_resolution(self, width: int, height: int) -> tuple[int, int]:
        """Default: scale to ~1024^2 area, multiples of the token factor
        (patch 2 x vae 8 = 16 for the production VAEs).  Backends override
        (Kontext preferred-resolution snap, Qwen /32)."""
        area = 1024 * 1024
        ratio = width / height
        f = self.token_factor
        w = int(round((area * ratio) ** 0.5 / f) * f)
        h = int(round((w / ratio) / f) * f)
        return max(f, w), max(f, h)

    def _to_array(self, image) -> np.ndarray:
        """PIL / uint8 / float image -> float32 [H, W, 3] in [-1, 1]."""
        arr = np.asarray(image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        if arr.max() > 1.5:  # 0..255 floats
            arr = arr / 255.0
        return arr * 2.0 - 1.0

    def _resize(self, arr: np.ndarray, w: int, h: int) -> np.ndarray:
        return np.asarray(jax.image.resize(
            jnp.asarray(arr), (h, w, arr.shape[-1]), "bilinear"))

    def _to_uint8(self, image) -> np.ndarray:
        """PIL / float / uint8 image -> uint8 [H, W, 3] (processor input)."""
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        if arr.dtype != np.uint8:
            arr = arr.astype(np.float32)
            if arr.max() <= 1.5:  # 0..1 floats
                arr = arr * 255.0
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        return arr

    def _resize_uint8(self, image, w: int, h: int) -> np.ndarray:
        arr = self._to_uint8(image).astype(np.float32)
        arr = self._resize(arr, w, h)
        return np.clip(np.round(arr), 0, 255).astype(np.uint8)

    # -- prompt-encoder conditioning hooks -------------------------------------

    def encoder_images(self, images: list, width: int, height: int):
        """Image(s) handed to `text_encoder.encode` so the prompt embeddings
        are conditioned on the reference image — required by every reference
        backend except FLUX: Step1X passes `ref_image=` into encode_prompt
        for BOTH CFG halves (RegionE/Step1XEdit/inplace.py:235-256), Qwen
        passes `image=prompt_image` where prompt_image is the input resized
        to the output resolution (RegionE/QwenImageEdit/inplace.py:220-252).

        Default (Step1X / Qwen families): the edit target resized to the
        output (VAE) resolution, as uint8 HWC for the VL processor.
        FluxKontextPipeline overrides to None (T5/CLIP are text-only);
        QwenImageEditPlusPipeline overrides with the 384^2-area condition
        recipe over ALL references."""
        return [self._resize_uint8(images[0], width, height)]

    def ref_vae_size(self, ref_w: int, ref_h: int, width: int, height: int
                     ) -> tuple[int, int]:
        """VAE resolution for an EXTRA reference image (multi-reference
        conditioning).  Default: aspect-preserving resize to the edit
        target's area, multiples of the token factor.  Plus overrides with
        the reference's per-image VAE_IMAGE_SIZE recipe
        (RegionE/QwenImageEditPlus/inplace.py:236-244)."""
        f = self.token_factor
        ratio = ref_w / ref_h
        area = width * height
        ew = max(f, int(round((area * ratio) ** 0.5 / f) * f))
        eh = max(f, int(round((ew / ratio) / f) * f))
        return ew, eh

    def encode_image(self, image, width: int, height: int) -> jnp.ndarray:
        """reference encode_image (inplace.py:188-194): VAE-encode the
        reference image into condition latent tokens [1, S, 4*C_lat]."""
        from regione_tpu.models import vae as V
        vm = V.vae_module(self.vae_cfg)   # AutoencoderKL or Wan family
        arr = self._to_array(image)
        arr = self._resize(arr, width, height)
        z = vm.encode(self.vae_params["encoder"], self.vae_cfg, arr[None])
        z = vm.normalize_latents(self.vae_cfg, z)
        return V.pack_latents(z)

    def prepare_inputs(self, image, prompt: str,
                       negative_prompt: str | None = None,
                       width: int | None = None, height: int | None = None,
                       guidance_scale: float | None = None):
        """Encode image(s) + prompts, build rope tables and the ctx pytree.

        `image` may be a list for multi-reference backends (Plus): the
        first image is the edit target (defines the output grid and the
        partition reference — its latent rows come first in the condition
        sequence); later images are extra references, each on its own
        rope axis-0 tag."""
        if negative_prompt is None:
            negative_prompt = self.default_negative_prompt
        images = list(image) if isinstance(image, (list, tuple)) else [image]
        arr = np.asarray(images[0])
        h0, w0 = arr.shape[:2]
        f = self.token_factor
        if width is None or height is None:
            # no explicit size: backend policy (area normalize / snap list)
            width, height = self.target_resolution(width or w0, height or h0)
        width, height = max(f, (width // f) * f), max(f, (height // f) * f)
        grid_h, grid_w = height // f, width // f

        cond_parts = [self.encode_image(images[0], width, height)]
        cond_grids = [(grid_h, grid_w)]
        for extra_img in images[1:]:
            ea = np.asarray(extra_img)
            ew, eh = self.ref_vae_size(ea.shape[1], ea.shape[0],
                                       width, height)
            cond_parts.append(self.encode_image(extra_img, ew, eh))
            cond_grids.append((eh // f, ew // f))
        cond = jnp.concatenate(cond_parts, axis=1)
        # Image-conditioned prompt embeddings: the SAME encoder image(s) go
        # into BOTH CFG halves (reference Step1XEdit/inplace.py:235-256
        # `ref_image=`, QwenImageEdit/inplace.py:239-252 `image=prompt_image`,
        # QwenImageEditPlus/inplace.py:260-278 `image=condition_images`).
        enc_imgs = self.encoder_images(images, width, height)
        emb_p, pooled_p, mask_p = self.text_encoder.encode(prompt,
                                                           image=enc_imgs)
        if self.do_cfg:
            emb_n, pooled_n, mask_n = self.text_encoder.encode(
                negative_prompt, image=enc_imgs)
            # cond/uncond may re-pad to different lengths (the drop-and-repad
            # recipe trims to each batch's max): pad to the common max so the
            # two halves stack on the batch axis, masking the padding.
            t_max = max(emb_p.shape[1], emb_n.shape[1])

            def pad_t(a, fill=0):
                if a is None or a.shape[1] == t_max:
                    return a
                widths = [(0, 0), (0, t_max - a.shape[1])] + \
                         [(0, 0)] * (a.ndim - 2)
                return np.pad(a, widths, constant_values=fill)

            emb_p, emb_n = pad_t(emb_p), pad_t(emb_n)
            mask_p, mask_n = pad_t(mask_p), pad_t(mask_n)
            txt = jnp.asarray(np.concatenate([emb_p, emb_n], 0), self.cfg.dtype)
            mask = np.concatenate([mask_p, mask_n], 0)
            # negative half uses the NEGATIVE pooled embedding (reference
            # FluxKontext/inplace.py:198-204,356 negative_pooled_prompt_embeds)
            pooled = (jnp.asarray(np.concatenate([pooled_p, pooled_n], 0),
                                  self.cfg.dtype)
                      if pooled_p is not None else None)
        else:
            txt = jnp.asarray(emb_p, self.cfg.dtype)
            mask = mask_p
            pooled = (jnp.asarray(pooled_p, self.cfg.dtype)
                      if pooled_p is not None else None)

        t_txt = txt.shape[1]
        s_kv = grid_h * grid_w + int(cond.shape[1])
        bias = np.zeros((mask.shape[0], 1, 1, t_txt + s_kv), np.float32)
        bias[..., :t_txt] = np.where(mask, 0.0, -1e9)[:, None, None, :]
        rope_img, rope_txt = self.build_rope(grid_h, grid_w, t_txt,
                                             cond_grids=cond_grids)

        guidance = None
        if self.cfg.guidance_embed:
            gs = guidance_scale if guidance_scale is not None else getattr(
                self, "guidance_scale", 3.5)
            b = txt.shape[0]
            guidance = jnp.full((b,), gs, jnp.float32)

        ctx = EditInputs(txt=txt, cond_latent=cond, rope_img=rope_img,
                         rope_txt=rope_txt, pooled=pooled, guidance=guidance,
                         txt_bias=jnp.asarray(bias))
        # (w0, h0) is the caller's ORIGINAL geometry (the reference's
        # img_info, Step1XEdit/inplace.py:188) — __call__ restores it
        return ctx, (width, height, grid_h, grid_w, (w0, h0))

    def __call__(self, image, prompt: str, negative_prompt: str | None = None,
                 width: int | None = None, height: int | None = None,
                 seed: int = 0, guidance_scale: float | None = None,
                 output_type: str = "np", resize_to_input: bool = True):
        """Full instruction edit: encode -> (accelerated) denoise -> decode.

        Mirrors the reference pipeline __call__ (inplace.py:73-457) minus
        diffusers plumbing.  Requires attach_vae + attach_text_encoder.

        resize_to_input: return the edit at the CALLER's original image
        geometry, like the reference plugin's `_output_process_image(image,
        img_info)` post-pass (RegionE/Step1XEdit/inplace.py:188,449).
        Pass False for the reference *experimental* behavior — its src
        mains keep the processed resolution (src/Step1X-Edit/utils.py:449
        comments the post-pass out: "dont change the resolution").
        No-op when an explicit width/height was requested."""
        from regione_tpu.models import vae as V
        if not hasattr(self, "vae_params") or not hasattr(self, "text_encoder"):
            raise RuntimeError(
                "attach_vae(...) and attach_text_encoder(...) first (or use "
                "edit_latents for latent-space operation)")
        explicit_size = width is not None and height is not None
        ctx, (width, height, grid_h, grid_w, (in_w, in_h)) = \
            self.prepare_inputs(image, prompt, negative_prompt, width,
                                height, guidance_scale)
        key = jax.random.PRNGKey(seed)
        lat0 = jax.random.normal(
            key, (1, grid_h * grid_w, self.cfg.in_channels), jnp.float32)
        lat, stats = self.edit_latents(lat0, ctx, grid_h, grid_w)
        vm = V.vae_module(self.vae_cfg)
        z = V.unpack_latents(lat.astype(jnp.float32), grid_h, grid_w)
        z = vm.denormalize_latents(self.vae_cfg, z)
        img = vm.decode(self.vae_params["decoder"], self.vae_cfg, z)
        img = np.asarray(jnp.clip(img * 0.5 + 0.5, 0.0, 1.0))[0]
        if (resize_to_input and not explicit_size
                and (in_w, in_h) != (width, height)):
            img = np.clip(self._resize(img, in_w, in_h), 0.0, 1.0)
        if output_type == "uint8":
            img = (img * 255).round().astype(np.uint8)
        return img, stats

    # -- batched latent-space edit ---------------------------------------------

    def edit_latents_batch(self, latents_list, ctx_list, grid_h: int,
                           grid_w: int, forced_masks=None, mesh=None):
        """Edit B same-geometry images in ONE vmapped device program
        (throughput serving; see core.sampler.sample_batch).  All images
        share the model params, rope tables, and one capacity bucket.

        mesh: a jax Mesh with a "dp" axis — the stacked request axis is
        placed on P("dp") so GSPMD spreads the per-image KV-cache sets
        across chips (one chip cannot hold 2 cache sets at dev scale,
        pipelines/serve.py memory note).  Params stay replicated (or
        TP-sharded if the caller pre-sharded them).

        Returns (list of [1, S, C] latents, list of per-image stats)."""
        assert len(latents_list) == len(ctx_list) >= 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            dp_sharding = NamedSharding(mesh, PartitionSpec("dp"))
        else:
            dp_sharding = None
        c0 = ctx_list[0]
        # the whole group rides c0's rope tables — equal-length condition
        # sequences with different grid decompositions (Plus multi-ref)
        # would silently denoise with wrong positional ids otherwise
        ref_rope = jax.tree_util.tree_leaves((c0.rope_img, c0.rope_txt))
        for c in ctx_list[1:]:
            leaves = jax.tree_util.tree_leaves((c.rope_img, c.rope_txt))
            if len(leaves) != len(ref_rope) or not all(
                    np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(leaves, ref_rope)):
                raise ValueError(
                    "edit_latents_batch: requests with differing rope "
                    "tables (condition grid decomposition / tags) cannot "
                    "share a batch — group them by rope content first "
                    "(EditService.run_batched does)")
        extra = dict(c0.extra)
        extra.setdefault("params", self.params)
        extra.setdefault("s_noise", latents_list[0].shape[1])

        def stack_field(name):
            vals = [getattr(c, name) for c in ctx_list]
            if vals[0] is None:
                return None, None
            out = jnp.stack([jnp.asarray(v) for v in vals])
            if dp_sharding is not None:
                out = jax.device_put(out, dp_sharding)
            return out, 0

        txt, _ = stack_field("txt")
        cond, _ = stack_field("cond_latent")
        pooled, pooled_ax = stack_field("pooled")
        guidance, guid_ax = stack_field("guidance")
        bias, bias_ax = stack_field("txt_bias")
        ctx_b = EditInputs(txt=txt, cond_latent=cond, rope_img=c0.rope_img,
                           rope_txt=c0.rope_txt, pooled=pooled,
                           guidance=guidance, txt_bias=bias, extra=extra)
        ctx_axes = EditInputs(
            txt=0, cond_latent=0, rope_img=None, rope_txt=None,
            pooled=pooled_ax, guidance=guid_ax, txt_bias=bias_ax,
            extra=None)

        t_txt = txt.shape[-2]
        batch_cache = 2 if self.do_cfg else 1
        sampler = self.sampler_for(grid_h, grid_w, t_txt, batch_cache,
                                   s_cond=cond.shape[-2])
        lat_b = jnp.stack([jnp.asarray(l) for l in latents_list])
        if dp_sharding is not None:
            lat_b = jax.device_put(lat_b, dp_sharding)
        s_noise = lat_b.shape[2]
        cond_part = cond[:, :, :s_noise]
        fm = None
        if forced_masks is not None:
            fm = jnp.stack([jnp.asarray(m) for m in forced_masks])
            if dp_sharding is not None:
                fm = jax.device_put(fm, dp_sharding)
        out_b, stats = sampler.sample_batch(lat_b, cond_part, ctx_b, ctx_axes,
                                            forced_masks=fm)
        return [out_b[i] for i in range(out_b.shape[0])], stats

    # -- top-level latent-space edit -----------------------------------------

    def edit_latents(
        self,
        latents0: jnp.ndarray,      # [1, S_noise, C] initial noise
        ctx: EditInputs,
        grid_h: int,
        grid_w: int,
        dense_only: bool = False,
        forced_mask=None,
        timed: bool = False,
    ) -> tuple[jnp.ndarray, SampleStats | None]:
        t_txt = ctx.txt.shape[1]
        batch_cache = 2 if self.do_cfg else 1
        sampler = self.sampler_for(grid_h, grid_w, t_txt, batch_cache,
                                   s_cond=ctx.cond_latent.shape[1])
        extra = dict(ctx.extra)
        extra.setdefault("params", self.params)
        extra.setdefault("s_noise", latents0.shape[1])
        ctx = dataclasses.replace(ctx, extra=extra)
        if dense_only or not getattr(self, "_regione_enabled", True):
            return sampler.sample_dense(latents0, ctx), None
        s_noise = latents0.shape[1]
        return sampler.sample(latents0, ctx.cond_latent[:, :s_noise], ctx,
                              forced_mask=forced_mask, timed=timed)
