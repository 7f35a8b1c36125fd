"""From-scratch LPIPS(AlexNet) in JAX — weights-gated, architecture proven.

The reference computes LPIPS with the `lpips` torch package
(`evaluation/metric_all_task.py:4,47,100`: `lpips.LPIPS(net='alex')` on
[-1,1]-scaled NCHW tensors).  That package cannot be installed here and its
pretrained weights cannot be downloaded (no egress), so this module
implements the same computation from scratch:

  * the torchvision-AlexNet `features` trunk (5 conv stages, taps after
    each ReLU),
  * the LPIPS input scaling layer (fixed shift/scale constants),
  * per-tap channel-unit-normalisation, squared difference, the learned
    1x1 "lin" weights (no bias), spatial averaging, and the sum over taps.

Weight bytes are supplied by the user at bring-up time: convert the
torchvision AlexNet checkpoint + the lpips package's linear weights once
with `save_lpips_npz`, then point `$REGIONE_LPIPS_WEIGHTS` at the .npz.
`eval.metrics.lpips_distance` picks it up automatically; without weights
it keeps reporting NaN exactly as before.

Architecture parity is proven CPU-only by `tests/test_lpips.py`: an
independent torch transcription of the LPIPS forward (F.conv2d /
F.max_pool2d, not torchvision, not the lpips package) fed the same random
state dicts must match this module's output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet `features` conv stages: (out_ch, kernel, stride, pad),
# with a 3x3/2 max-pool after stage 0 and stage 1.  Taps are taken after
# each stage's ReLU (lpips pretrained_networks.alexnet slices 1..5).
_ALEX_STAGES = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # max-pool follows these stage indices

# lpips.ScalingLayer constants (lpips/lpips.py): x -> (x - shift) / scale
# on [-1,1]-scaled RGB.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool3x3s2(x):
    # torch MaxPool2d(3, 2) default: no padding, floor output size => VALID.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID")


def lpips_forward(params: dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS(alex) between batched NCHW images already scaled to [-1, 1].

    `params` is the pytree from `lpips_params_from_torch` /
    `load_lpips_npz`.  Returns shape [N] distances.
    """
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    xs = [(a - shift) / scale, (b - shift) / scale]
    total = None
    for i, (_, _, stride, pad) in enumerate(_ALEX_STAGES):
        w, bias = params[f"conv{i}_w"], params[f"conv{i}_b"]
        feats = []
        for j in range(2):
            xs[j] = jax.nn.relu(_conv(xs[j], w, bias, stride, pad))
            # unit-normalise over channels (lpips.normalize_tensor, eps=1e-10)
            norm = jnp.sqrt(jnp.sum(xs[j] ** 2, axis=1, keepdims=True))
            feats.append(xs[j] / (norm + 1e-10))
        d = (feats[0] - feats[1]) ** 2
        # learned 1x1 conv, no bias (lin{i}.model.1.weight), spatial mean
        val = jnp.mean(jnp.sum(d * params[f"lin{i}"][None, :, None, None],
                               axis=1), axis=(1, 2))
        total = val if total is None else total + val
        if i in _POOL_AFTER:
            xs = [_maxpool3x3s2(x) for x in xs]
    return total


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(params, a, b):
    return lpips_forward(params, a, b)


def lpips_pair_uint8(params: dict, a: np.ndarray, b: np.ndarray) -> float:
    """Distance between two HWC uint8 images (the reference's usage:
    `metric_all_task.py:95-100` scales with lpips.im2tensor semantics,
    pixel/127.5 - 1)."""
    ta = jnp.asarray(np.asarray(a, np.float32) / 127.5 - 1.0
                     ).transpose(2, 0, 1)[None]
    tb = jnp.asarray(np.asarray(b, np.float32) / 127.5 - 1.0
                     ).transpose(2, 0, 1)[None]
    return float(_lpips_jit(params, ta, tb)[0])


# ---------------------------------------------------------------- weights

# torchvision AlexNet `features` module indices of the five convs
_TV_IDX = (0, 3, 6, 8, 10)


def lpips_params_from_torch(alexnet_sd: dict, lins_sd: dict) -> dict:
    """Build the params pytree from two torch state dicts:

      * `alexnet_sd`: the torchvision AlexNet checkpoint
        (`features.{0,3,6,8,10}.{weight,bias}`, full-model dicts with
        `classifier.*` keys are fine — extras ignored);
      * `lins_sd`: the lpips package's trained linear weights
        (`lin{i}.model.1.weight`, [1, C, 1, 1]).
    """
    import torch

    def arr(t):
        return np.asarray(t.detach().cpu().to(torch.float32).numpy())

    params = {}
    for i, tv in enumerate(_TV_IDX):
        w = arr(alexnet_sd[f"features.{tv}.weight"])
        b = arr(alexnet_sd[f"features.{tv}.bias"])
        oc, k, s, p = _ALEX_STAGES[i]
        if w.shape != (oc, w.shape[1], k, k):
            raise ValueError(f"conv{i}: unexpected shape {w.shape}")
        params[f"conv{i}_w"] = w
        params[f"conv{i}_b"] = b
        lw = arr(lins_sd[f"lin{i}.model.1.weight"])
        if lw.shape != (1, oc, 1, 1):
            raise ValueError(f"lin{i}: expected (1,{oc},1,1), got {lw.shape}")
        params[f"lin{i}"] = lw[0, :, 0, 0]
    return params


def save_lpips_npz(alexnet_path: str, lins_path: str, out_path: str) -> None:
    """One-time offline conversion: torchvision alexnet .pth + lpips
    alex .pth -> a single torch-free .npz consumed at eval time."""
    import torch

    alex = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lins = torch.load(lins_path, map_location="cpu", weights_only=True)
    np.savez(out_path, **lpips_params_from_torch(alex, lins))


def load_lpips_npz(path: str) -> dict:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}
