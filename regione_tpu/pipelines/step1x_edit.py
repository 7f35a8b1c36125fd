"""Step1X-Edit v1.1 pipeline adapter.

Reference behavior being matched (RegionE/Step1XEdit/inplace.py:73-457):
  * true CFG via batch-axis concat of [cond, uncond] (inplace.py:381-385) —
    batch 2 through the transformer, KV cache batch 2;
  * norm-processed guidance: when the (reference-unit) timestep exceeds
    ``timesteps_truncate`` the CFG diff is divided by a processed norm
    (inplace.py:401-410).  NOTE the reference quirk: its timesteps are in
    sigma*1000 units while timesteps_truncate defaults to 0.93, so the
    norm-processed branch is active at effectively every step; we replicate
    that faithfully (``sigma * 1000 > truncate``).
  * process_diff_norm semantics from the public Step1X-Edit release:
    ``where(n > 1, n**k, 1)`` with k = process_norm_power = 0.4
    (defaults at inplace.py:81,103-104: true_cfg_scale 6.0, truncate 0.93).
"""

from __future__ import annotations

import jax.numpy as jnp

from regione_tpu.pipelines.base import EditPipelineBase


def process_diff_norm(diff_norm: jnp.ndarray, k: float) -> jnp.ndarray:
    return jnp.where(diff_norm > 1.0, jnp.power(diff_norm, k),
                     jnp.ones_like(diff_norm))


class Step1XEditPipeline(EditPipelineBase):
    backend = "step1x-edit"
    uses_batch_cfg = True

    def __init__(self, model_cfg, params, re_params=None, gamma=None,
                 true_cfg_scale: float = 6.0,
                 timesteps_truncate: float = 0.93,
                 process_norm_power: float = 0.4):
        super().__init__(model_cfg, params, re_params, gamma,
                         true_cfg_scale=true_cfg_scale)
        self.timesteps_truncate = timesteps_truncate
        self.process_norm_power = process_norm_power

    def combine_cfg(self, v_pos, v_neg, sigma):
        diff = v_pos - v_neg
        scaled = self.true_cfg_scale * diff
        # reference-unit timestep = sigma * 1000 (inplace.py:401)
        use_norm = sigma * 1000.0 > self.timesteps_truncate
        diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        normed = scaled / process_diff_norm(diff_norm, self.process_norm_power)
        return v_neg + jnp.where(use_norm, normed, scaled)


class Step1XEditV1P2Pipeline(Step1XEditPipeline):
    """Step1X-Edit v1.2: same transformer/CFG plumbing as v1.1 with its own
    fitted gamma table; the optional thinker/reflection outer loop
    (reference RegionE/Step1XEditV1P2/inplace.py:195-212,470-543) is a
    Python-level orchestration wrapper (regione_tpu.pipelines.thinker), not
    part of the jitted sampler.  Distinct cond/neg text lengths
    (inplace.py:833-886) are handled by padding + txt attention bias."""
    backend = "step1x-edit-v1p2"
