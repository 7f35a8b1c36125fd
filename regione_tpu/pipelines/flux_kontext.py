"""FLUX.1 Kontext pipeline adapter.

Reference behavior (RegionE/FluxKontext/inplace.py:76-410):
  * guidance-distilled: the guidance scale enters through the guidance
    embedding (transformer guidance_embeds), single forward per step;
  * optional true CFG as a second forward (inplace.py:349-364) — here run
    as batch-axis concat (mathematically identical, better MXU utilization);
  * input resolution snapped to the preferred Kontext resolution list
    (reference RegionE/FluxKontext/utils.py:18-36), max area 1024^2.
"""

from __future__ import annotations

from regione_tpu.pipelines.base import EditPipelineBase

# reference RegionE/FluxKontext/utils.py:18-36
PREFERRED_KONTEXT_RESOLUTIONS = [
    (672, 1568), (688, 1504), (720, 1456), (752, 1392), (800, 1328),
    (832, 1248), (880, 1184), (944, 1104), (1024, 1024), (1104, 944),
    (1184, 880), (1248, 832), (1328, 800), (1392, 752), (1456, 720),
    (1504, 688), (1568, 672),
]


def snap_kontext_resolution(width: int, height: int) -> tuple[int, int]:
    """Pick the preferred (w, h) whose aspect ratio is closest to the
    input's (the reference's multiple-of-16 snap to the fixed list)."""
    aspect = width / height
    _, w, h = min(
        (abs(aspect - pw / ph), pw, ph) for ph, pw in PREFERRED_KONTEXT_RESOLUTIONS
    )
    return w, h


class FluxKontextPipeline(EditPipelineBase):
    backend = "flux-kontext"
    uses_batch_cfg = False  # guidance-embedding path by default

    def __init__(self, model_cfg, params, re_params=None, gamma=None,
                 guidance_scale: float = 2.5, true_cfg_scale: float = 1.0):
        super().__init__(model_cfg, params, re_params, gamma,
                         true_cfg_scale=true_cfg_scale)
        self.guidance_scale = guidance_scale
        # true CFG requested -> switch to batch-concat mode
        if true_cfg_scale > 1.0:
            self.uses_batch_cfg = True

    def combine_cfg(self, v_pos, v_neg, sigma):
        return v_neg + self.true_cfg_scale * (v_pos - v_neg)

    def target_resolution(self, width: int, height: int) -> tuple[int, int]:
        return snap_kontext_resolution(width, height)

    def encoder_images(self, images, width, height):
        """FLUX prompts are text-only: T5/CLIP never see the reference image
        (reference FluxKontext/inplace.py:183-205 encode_prompt takes no
        image argument; conditioning is latent-space only)."""
        return None
