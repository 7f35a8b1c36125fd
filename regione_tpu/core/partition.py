"""Adaptive Region Partition: edited/unedited token selection.

Reimplements the reference token selector (RegionE/Step1XEdit/utils.py:262-334)
and the scattered-point morphology cleanup (utils.py:104-217) as pure
jittable JAX ops producing a *static-shape boolean mask* over the noise-token
sequence.  The reference returns dynamically sized index tensors; under XLA
we keep the `[S]` mask on device and convert it to a padded fixed-capacity
index set (see regione_tpu.core.masking) at the single host sync point of
the sampler.

Morphology is two small 2-D convolutions + compares on the token grid
(H/(patch*vae_sf) x W/(patch*vae_sf)) and runs in XLA directly; at these
grid sizes (<= 64x64) it is negligible, so no Pallas fusion is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cross_kernel(size: int) -> np.ndarray:
    """Cross-shaped structuring element (reference utils.py:118-123)."""
    k = np.zeros((size, size), dtype=np.float32)
    mid = size // 2
    k[mid, :] = 1.0
    k[:, mid] = 1.0
    return k


def _square_kernel(size: int) -> np.ndarray:
    return np.ones((size, size), dtype=np.float32)


def _conv2d_same(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """2-D 'same' convolution of a [H, W] map with a small kernel."""
    lhs = img[None, None, :, :].astype(jnp.float32)
    rhs = jnp.asarray(kernel)[None, None, :, :]
    pad = kernel.shape[-1] // 2
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)]
    )
    return out[0, 0]


def morphological_erosion(mask2d: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary erosion: output 1 iff every kernel-covered pixel is 1
    (reference utils.py:130-161)."""
    conv = _conv2d_same(mask2d.astype(jnp.float32), kernel)
    return conv == float(kernel.sum())


def morphological_dilation(mask2d: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary dilation: output 1 iff any kernel-covered pixel is 1
    (reference utils.py:164-192)."""
    conv = _conv2d_same(mask2d.astype(jnp.float32), kernel)
    return conv > 0


def remove_scattered_points(mask2d: jnp.ndarray) -> jnp.ndarray:
    """3x3-cross erosion followed by 5x5-square dilation, removing isolated
    edited pixels then restoring a margin (reference utils.py:195-217)."""
    eroded = morphological_erosion(mask2d, _cross_kernel(3))
    return morphological_dilation(eroded, _square_kernel(5))


def token_similarity(
    x: jnp.ndarray, ref: jnp.ndarray, kind: str = "cosine"
) -> jnp.ndarray:
    """Per-token similarity of two [B, S, D] tensors -> [B, S]
    (reference utils.py:288-310).  All variants in fp32."""
    x = x.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    if kind == "cosine":
        xn = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
        rn = ref * jax.lax.rsqrt(jnp.sum(ref * ref, -1, keepdims=True) + 1e-12)
        return jnp.sum(xn * rn, axis=-1)
    if kind == "dot":
        return jnp.sum(x * ref, axis=-1)
    if kind == "euclidean":
        d = jnp.sqrt(jnp.sum((x - ref) ** 2, axis=-1))
        s = -d
        return (s - s.min()) / (s.max() - s.min() + 1e-12)
    if kind == "mse":
        return -jnp.mean((x - ref) ** 2, axis=-1)
    if kind == "diff_std":
        return jnp.std(x - ref, axis=-1)
    raise ValueError(f"unknown similarity kind {kind!r}")


@functools.partial(
    jax.jit, static_argnames=("grid_h", "grid_w", "erosion_dilation", "similarity_type")
)
def select_edited_mask(
    x0_estimate: jnp.ndarray,
    condition_latent: jnp.ndarray,
    threshold: float,
    *,
    grid_h: int,
    grid_w: int,
    erosion_dilation: bool = True,
    similarity_type: str = "cosine",
) -> jnp.ndarray:
    """Edited-region mask from a one-step x0 estimate vs. the reference-image
    latent (reference utils.py:262-334 with batch-1 semantics at :317-327).

    Args:
      x0_estimate: [B, S, D] one-step denoised latent estimate.
      condition_latent: [B, S, D] reference image latent tokens.
      threshold: tokens with similarity <= threshold are edited.
      grid_h, grid_w: token-grid shape, S == grid_h * grid_w.

    Returns:
      [S] boolean mask, True = edited token.
    """
    from regione_tpu.ops.partition_kernel import (
        fused_partition, use_fused_partition)
    if use_fused_partition(similarity_type):
        return fused_partition(
            x0_estimate[0], condition_latent[0], threshold,
            grid_h, grid_w, erosion_dilation)
    sim = token_similarity(x0_estimate, condition_latent, similarity_type)
    mask = sim[0] <= threshold  # batch-1, as the reference asserts
    if erosion_dilation:
        m2d = mask.reshape(grid_h, grid_w)
        mask = remove_scattered_points(m2d).reshape(-1)
    return mask
