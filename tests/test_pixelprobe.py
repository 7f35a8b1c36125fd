"""Pixel-space PSNR probe (eval.pixelprobe) — the bench rows' decoded-image
fidelity number (reference measures PSNR on decoded PNGs,
evaluation/metric_all_task.py:12-143)."""

import numpy as np
import pytest

from regione_tpu.eval.pixelprobe import (_psnr01, family_for_preset,
                                         pixel_psnr_vs_dense)

GRID = 4  # 4x4 tokens -> 8x8 latent -> 64x64 px (flux) / 64x64 (wan)


def _tokens(seed, c=64):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, GRID * GRID, c)).astype(np.float32)


def test_psnr01_identity_is_inf():
    a = np.random.default_rng(0).random((4, 4))
    assert _psnr01(a, a) == float("inf")


def test_family_mapping():
    assert family_for_preset("qwen-image-edit") == "wan"
    assert family_for_preset("qwen-image-edit-plus") == "wan"
    assert family_for_preset("step1x-edit") == "flux"
    assert family_for_preset("flux-kontext") == "flux"


@pytest.mark.parametrize("family", ["flux", "wan"])
def test_pixel_psnr_decodes_and_orders(family):
    """Identical latents -> inf; a small perturbation scores higher than a
    large one (the decoder is deterministic and shared, so pixel PSNR must
    be monotone in latent error size)."""
    t0 = _tokens(0)
    same = pixel_psnr_vs_dense(t0, t0.copy(), GRID, GRID, family=family)
    assert same["psnr_pixel_vs_dense"] == float("inf")
    assert same["ssim_pixel_vs_dense"] == 1.0
    assert "pixel_decoder" in same

    small = pixel_psnr_vs_dense(t0, t0 + 1e-3 * _tokens(1), GRID, GRID,
                                family=family)
    large = pixel_psnr_vs_dense(t0, t0 + 1e-1 * _tokens(1), GRID, GRID,
                                family=family)
    assert np.isfinite(small["psnr_pixel_vs_dense"])
    assert small["psnr_pixel_vs_dense"] > large["psnr_pixel_vs_dense"]
    # SSIM orders the same way (the reference's second pixel metric)
    assert 0.0 < large["ssim_pixel_vs_dense"] < small["ssim_pixel_vs_dense"] <= 1.0


def test_pixel_psnr_seed_stable():
    """Same seed -> same decoder -> same number (bench reruns comparable)."""
    t0, t1 = _tokens(2), _tokens(3)
    a = pixel_psnr_vs_dense(t0, t1, GRID, GRID, family="flux", seed=0)
    b = pixel_psnr_vs_dense(t0, t1, GRID, GRID, family="flux", seed=0)
    assert a["psnr_pixel_vs_dense"] == b["psnr_pixel_vs_dense"]
