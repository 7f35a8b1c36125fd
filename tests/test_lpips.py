"""Torch-oracle parity for the from-scratch JAX LPIPS(alex).

The oracle below is an independent torch transcription of the lpips
package's forward (lpips/lpips.py + pretrained_networks.alexnet as the
reference invokes it, evaluation/metric_all_task.py:47,100) built directly
on F.conv2d / F.max_pool2d — NOT torchvision and NOT the lpips package —
fed the same random state dicts as the JAX implementation.  This proves
the architecture (stage geometry, tap placement, scaling layer,
unit-normalisation, 1x1 lins, spatial averaging) so that real-weight
bring-up only has to supply the weight bytes (docs/RUNBOOK_REAL_WEIGHTS.md).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from regione_tpu.eval import metrics
from regione_tpu.eval.lpips_jax import (
    _ALEX_STAGES, _TV_IDX, load_lpips_npz, lpips_forward,
    lpips_pair_uint8, lpips_params_from_torch, save_lpips_npz)


def _random_state_dicts(seed=0):
    rng = np.random.default_rng(seed)
    alex, lins = {}, {}
    in_ch = 3
    for i, tv in enumerate(_TV_IDX):
        oc, k, _, _ = _ALEX_STAGES[i]
        alex[f"features.{tv}.weight"] = torch.tensor(
            rng.standard_normal((oc, in_ch, k, k)).astype(np.float32) * 0.1)
        alex[f"features.{tv}.bias"] = torch.tensor(
            rng.standard_normal(oc).astype(np.float32) * 0.1)
        # lpips lins are trained non-negative; keep the oracle faithful
        lins[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.standard_normal((1, oc, 1, 1))).astype(np.float32))
        in_ch = oc
    # full-model torchvision checkpoints carry classifier keys; converter
    # must ignore them
    alex["classifier.1.weight"] = torch.zeros(1)
    return alex, lins


def _torch_lpips(alex, lins, a, b):
    """Independent transcription of LPIPS(alex) forward."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    xs = [(a - shift) / scale, (b - shift) / scale]
    total = torch.zeros(a.shape[0])
    for i, tv in enumerate(_TV_IDX):
        _, _, stride, pad = _ALEX_STAGES[i]
        feats = []
        for j in range(2):
            xs[j] = F.relu(F.conv2d(
                xs[j], alex[f"features.{tv}.weight"],
                alex[f"features.{tv}.bias"], stride=stride, padding=pad))
            n = xs[j].pow(2).sum(1, keepdim=True).sqrt()
            feats.append(xs[j] / (n + 1e-10))
        d = (feats[0] - feats[1]) ** 2
        total = total + F.conv2d(d, lins[f"lin{i}.model.1.weight"]
                                 ).mean(dim=(2, 3))[:, 0]
        if i in (0, 1):
            xs = [F.max_pool2d(x, 3, 2) for x in xs]
    return total


@pytest.mark.parametrize("hw", [(64, 64), (96, 80)])
def test_lpips_matches_torch_oracle(hw):
    alex, lins = _random_state_dicts(0)
    params = lpips_params_from_torch(alex, lins)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 3, *hw)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, *hw)).astype(np.float32)
    want = _torch_lpips(alex, lins, torch.tensor(a), torch.tensor(b)).numpy()
    got = np.asarray(lpips_forward(params, a, b))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_lpips_identity_is_zero():
    alex, lins = _random_state_dicts(2)
    params = lpips_params_from_torch(alex, lins)
    img = np.random.default_rng(3).uniform(-1, 1, (1, 3, 64, 64)
                                           ).astype(np.float32)
    assert float(lpips_forward(params, img, img)[0]) == pytest.approx(0.0,
                                                                      abs=1e-7)


def test_npz_roundtrip_and_metrics_env_hook(tmp_path, monkeypatch):
    alex, lins = _random_state_dicts(4)
    ap, lp = tmp_path / "alex.pth", tmp_path / "lins.pth"
    torch.save(alex, ap)
    torch.save(lins, lp)
    npz = tmp_path / "lpips_alex.npz"
    save_lpips_npz(str(ap), str(lp), str(npz))

    params = load_lpips_npz(str(npz))
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    direct = lpips_pair_uint8(params, a, b)
    assert np.isfinite(direct) and direct > 0

    # metrics.lpips_distance: no lpips package in this container, so the
    # env-var fallback must produce the same value
    monkeypatch.setenv("REGIONE_LPIPS_WEIGHTS", str(npz))
    metrics._LPIPS_JAX_PARAMS = None
    try:
        via_metrics = metrics.lpips_distance(a, b)
    finally:
        metrics._LPIPS_JAX_PARAMS = None
    assert via_metrics == pytest.approx(direct, rel=1e-6)


def test_converter_rejects_bad_lin_shape():
    alex, lins = _random_state_dicts(6)
    lins["lin0.model.1.weight"] = torch.zeros(1, 65, 1, 1)
    with pytest.raises(ValueError, match="lin0"):
        lpips_params_from_torch(alex, lins)
