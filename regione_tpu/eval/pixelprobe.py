"""Pixel-space PSNR probe for the benchmark rows (VERDICT r4 item 4).

The reference measures PSNR on DECODED images (`evaluation/
metric_all_task.py:12-143` computes skimage PSNR over PNG pairs), while
the repo's bench rows historically reported latent-space PSNR only.
This module decodes both the dense and the RegionE latents through the
family-matched VAE decoder (production topology, seeded random weights —
the same random-weights regime every bench number lives in) and reports
PSNR over the clipped [0, 1] pixel buffers, peak 1.0 (the skimage
`data_range` convention for float images).

Why this is dimensionally honest even with a random decoder: the decoder
is a deep nonlinear map shared by both inputs, so pixel PSNR measures how
the RegionE-vs-dense latent error propagates through convs / norms /
upsampling — exactly the amplification question the latent number cannot
answer.  Absolute fidelity vs the reference's published 30.5-32.1 dB
still requires real weights (RUNBOOK_REAL_WEIGHTS.md).

Memory note: full-size bench rows run with ~14 GiB of model+cache
resident; callers must drop the DiT params/pipeline references before
probing (the decoders here are ~0.1-0.4 GiB of weights plus a few GiB of
bf16 activations at 1024 px).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _psnr01(a: np.ndarray, b: np.ndarray) -> float:
    from regione_tpu.eval.metrics import psnr

    return psnr(np.asarray(a), np.asarray(b), data_range=1.0)


def _ssim01(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM over a batch of [B, H, W, C] float images in [0, 1]
    (eval.metrics.ssim is skimage-faithful per image)."""
    from regione_tpu.eval.metrics import ssim

    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.mean([ssim(x, y, data_range=1.0)
                          for x, y in zip(a, b)]))


def decoder_for_family(family: str, seed: int = 0):
    """(cfg, params, module) for the production decoder of a model family.

    family: "flux" (AutoencoderKL — Step1X-Edit / FLUX.1-Kontext,
    models/vae.py) or "wan" (Wan 2.1 — Qwen-Image family,
    models/vae_wan.py).  Weights are seeded random at the production
    topology; bf16 so 1024 px activations stay small.
    """
    import jax
    import jax.numpy as jnp

    if family == "wan":
        from regione_tpu.models import vae_wan as vm
        cfg = vm.WanVAEConfig(dtype=jnp.bfloat16)
        init = vm.init_wan_vae
    else:
        from regione_tpu.models import vae as vm
        cfg = vm.VAEConfig(dtype=jnp.bfloat16)
        init = vm.init_vae
    # init on HOST and ship only the decoder subtree: the probe runs right
    # after the 20B rows where HBM headroom is <2 GiB, and the encoder
    # weights (unused here) must never touch the device
    try:
        host = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        host = jax.devices()[0]
    with jax.default_device(host):
        params = init(jax.random.PRNGKey(seed + 7), cfg)
    dec = params["decoder"] if "decoder" in params else params
    dec = jax.device_put(dec, jax.devices()[0])
    return cfg, dec, vm


def family_for_preset(preset: str) -> str:
    return "wan" if preset.startswith("qwen") else "flux"


def pixel_psnr_vs_dense(out_dense, out_re, grid_h: int, grid_w: int,
                        family: str = "flux", seed: int = 0
                        ) -> dict[str, Any]:
    """Decode both latents ([1, S, 4*C_lat] tokens) and PSNR the pixels.

    Returns {"psnr_pixel_vs_dense": float, "ssim_pixel_vs_dense": float,
    "pixel_decoder": str}; raises on decode failure (callers guard so the
    timing artifact survives).  SSIM mirrors the reference's second pixel
    metric (evaluation/metric_all_task.py skimage SSIM over PNG pairs).
    """
    import jax.numpy as jnp

    from regione_tpu.models import vae as V

    cfg, dec_params, vm = decoder_for_family(family, seed)

    def dec(tokens):
        z = V.unpack_latents(jnp.asarray(tokens, jnp.float32),
                             grid_h, grid_w)
        z = vm.denormalize_latents(cfg, z)
        img = vm.decode(dec_params, cfg, z)
        return np.asarray(jnp.clip(
            img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0))

    img_d = dec(out_dense)
    img_r = dec(out_re)
    kind = ("wan-2.1" if family == "wan" else "autoencoder-kl")
    return {
        "psnr_pixel_vs_dense": round(_psnr01(img_d, img_r), 2),
        "ssim_pixel_vs_dense": round(_ssim01(img_d, img_r), 4),
        "pixel_decoder": f"{kind} production topology, random weights, "
                         f"bf16, {img_d.shape[1]}x{img_d.shape[2]}px",
    }
