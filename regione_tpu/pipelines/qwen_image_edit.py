"""Qwen-Image-Edit (and -2509 "Plus") pipeline adapters.

Reference behavior (RegionE/QwenImageEdit/inplace.py:70-459):
  * true CFG via TWO sequential tagged forwards with per-tag KV cache pairs
    k_cache_even/odd (inplace.py:371-399, 731-734, 756-817).  TPU-native
    equivalent: one batch-2 forward — attention never mixes batch rows and
    each batch row owns its own cache slice, so the per-tag pairs are
    exactly the cache's batch dimension.  This also doubles MXU occupancy.
  * norm-preserving CFG combine: rescale the combined velocity back to the
    conditional branch's per-token norm (inplace.py:401-405).
  * joint double-stream blocks only (no single blocks, depth_single=0);
    joint attention order [text, image].
  * variable text lengths between cond/uncond handled by padding + additive
    attention bias (the reference instead runs two differently-shaped
    passes).
  * Plus (2509): multi-reference conditioning — each reference image is
    resized to CONDITION_IMAGE_SIZE (384^2 area) for the vision path and
    VAE_IMAGE_SIZE (1024^2) for the VAE path, with per-image entries in
    img_shapes (reference RegionE/QwenImageEditPlus/inplace.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from regione_tpu.models.layers import rope_table
from regione_tpu.pipelines.base import EditPipelineBase

# reference RegionE/QwenImageEditPlus constants
CONDITION_IMAGE_AREA = 384 * 384
VAE_IMAGE_AREA = 1024 * 1024


def calculate_dimensions(target_area: int, ratio: float, multiple: int = 32
                         ) -> tuple[int, int]:
    """Resize to ~target_area preserving aspect, rounded to `multiple`
    (reference QwenImageEdit calculate_dimensions)."""
    width = round((target_area * ratio) ** 0.5)
    height = round(width / ratio)
    width = max(multiple, round(width / multiple) * multiple)
    height = max(multiple, round(height / multiple) * multiple)
    return width, height


class QwenImageEditPipeline(EditPipelineBase):
    backend = "qwen-image-edit"
    uses_batch_cfg = True
    # the reference Qwen drivers pass a single-space uncond explicitly
    # (src/Qwen-Image/main.py:59, src/Qwen-Image-Edit-2509/main.py:60)
    default_negative_prompt = " "

    def __init__(self, model_cfg, params, re_params=None, gamma=None,
                 true_cfg_scale: float = 4.0):
        super().__init__(model_cfg, params, re_params, gamma,
                         true_cfg_scale=true_cfg_scale)

    def combine_cfg(self, v_pos, v_neg, sigma):
        comb = v_neg + self.true_cfg_scale * (v_pos - v_neg)
        cond_norm = jnp.linalg.norm(v_pos, axis=-1, keepdims=True)
        noise_norm = jnp.linalg.norm(comb, axis=-1, keepdims=True)
        return comb * (cond_norm / jnp.maximum(noise_norm, 1e-12))

    def target_resolution(self, width: int, height: int) -> tuple[int, int]:
        return calculate_dimensions(VAE_IMAGE_AREA, width / height, 32)

    def build_rope(self, grid_h: int, grid_w: int, t_txt: int,
                   cond_grids=None):
        """Qwen rotary convention (diffusers QwenEmbedRope semantics, used
        by the reference's patched forward at
        RegionE/QwenImageEdit/inplace.py:530-531):

          * per-image (frame, h, w) ids where the frame coordinate is the
            image index (noise=0, references=1..) and h/w coordinates are
            CENTERED: arange(n) - (n - n//2), i.e. [-(n-n//2), n//2);
          * text rows get diagonal ids (p+off, p+off, p+off) offset by
            max(h//2, w//2) over all images (scale_rope layout).

        Structurally equivalent to the generic grid rope for random
        weights; exact for converted checkpoints."""
        kv_ids, txt_ids3 = self.rope_position_ids(grid_h, grid_w, t_txt,
                                                  cond_grids)
        rope_img = rope_table(jnp.asarray(kv_ids), self.cfg.axes_dims,
                              self.cfg.rope_theta)
        rope_txt = rope_table(jnp.asarray(txt_ids3), self.cfg.axes_dims,
                              self.cfg.rope_theta)
        return rope_img, rope_txt

    def rope_position_ids(self, grid_h: int, grid_w: int, t_txt: int,
                          cond_grids=None):
        cond_grids = cond_grids or [(grid_h, grid_w)]

        def centered(n):
            return np.arange(n, dtype=np.float32) - (n - n // 2)

        parts = []
        for idx, (h, w) in enumerate([(grid_h, grid_w)] + list(cond_grids)):
            ys, xs = np.meshgrid(centered(h), centered(w), indexing="ij")
            ids = np.stack([np.full_like(ys, float(idx)), ys, xs], -1)
            parts.append(ids.reshape(-1, 3))
        kv_ids = np.concatenate(parts, 0).astype(np.float32)

        max_vid = max(max(h // 2, w // 2)
                      for (h, w) in [(grid_h, grid_w)] + list(cond_grids))
        tpos = (np.arange(t_txt, dtype=np.float32) + max_vid)[:, None]
        txt_ids3 = np.repeat(tpos, 3, axis=1).astype(np.float32)
        return kv_ids, txt_ids3


class QwenImageEditPlusPipeline(QwenImageEditPipeline):
    """Qwen-Image-Edit-2509 ("Plus"): multi-reference conditioning.

    Reference deltas vs the base Qwen-Image-Edit pipeline
    (RegionE/QwenImageEditPlus/inplace.py):
      * DUAL-SIZE condition recipe (inplace.py:53-54, 236-244): every
        reference image is resized TWICE — to CONDITION_IMAGE_SIZE
        (384^2 area, /32) for the Qwen2.5-VL prompt encoder, and to
        VAE_IMAGE_SIZE (1024^2 area, /32) for the VAE condition latents.
      * ALL condition images go to the prompt encoder for BOTH CFG halves
        (inplace.py:260-278 `image=condition_images`), under the
        multi-image "Picture i:" chat template
        (models/text_encoders.py QWEN_EDIT_PLUS_TEMPLATE).
      * per-image rope frame tags: each reference gets its own axis-0
        (frame) coordinate in img_shapes (inplace.py:293-300) — carried
        here by `rope_position_ids` via cond_grids (frame idx 1..N)."""

    backend = "qwen-image-edit-plus"
    # reference constants (inplace.py:53-54); instance attrs so tiny-scale
    # tests can shrink them while production keeps the reference values
    condition_image_area: int = CONDITION_IMAGE_AREA
    vae_image_area: int = VAE_IMAGE_AREA

    def encoder_images(self, images, width, height):
        """Reference recipe: condition_images[i] = resize(img_i to 384^2
        area, /32) (RegionE/QwenImageEditPlus/inplace.py:53,236-242)."""
        out = []
        for img in images:
            arr = self._to_uint8(img)
            cw, ch = calculate_dimensions(
                self.condition_image_area, arr.shape[1] / arr.shape[0], 32)
            out.append(self._resize_uint8(arr, cw, ch))
        return out

    def ref_vae_size(self, ref_w: int, ref_h: int, width: int, height: int
                     ) -> tuple[int, int]:
        """Reference recipe: vae_image_sizes[i] = calculate_dimensions(
        VAE_IMAGE_SIZE, img_i aspect) — per-image 1024^2-area resize
        (RegionE/QwenImageEditPlus/inplace.py:54,239-243), NOT the edit
        target's area."""
        f = self.token_factor
        w, h = calculate_dimensions(self.vae_image_area, ref_w / ref_h, 32)
        # keep VAE grids aligned to the token factor even when a test
        # shrinks vae_image_area below 32-multiples of f
        return max(f, (w // f) * f), max(f, (h // f) * f)
