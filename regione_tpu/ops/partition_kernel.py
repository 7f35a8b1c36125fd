"""Fused Pallas partition kernel: one device kernel from latents to mask.

The adaptive region partition (BASELINE.json north star: "threshold +
erosion/dilation morphology becomes a fused Pallas kernel emitting a
static-shape token-selection mask") is computationally tiny but in the XLA
formulation it spans several kernels (normalize, dot, compare, two convs,
compares) with HBM round-trips of the intermediate [S] maps.  Here the
whole chain runs in a single Pallas invocation with everything resident in
VMEM (x0/cond at 4096x64 fp32 are ~1 MB each):

  cosine(x0, cond) -> sim <= threshold -> 3x3-cross erosion ->
  5x5-square dilation -> bool mask [S]

Morphology uses statically-unrolled shifted slices of a zero-padded grid
(zero padding matches `lax.conv` 'same' semantics of core.partition, i.e.
the reference's F.conv2d at utils.py:130-192).  Output is float32 0/1
(TPU-friendly lane type), cast to bool by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(thr_ref, x0_ref, cond_ref, out_ref, *, grid_h: int,
            grid_w: int, erosion_dilation: bool):
    # inputs are pre-reshaped to the token grid [gh, gw, D] by the wrapper
    # (Mosaic cannot shape-cast 2D<->1D inside a kernel)
    x = x0_ref[:].astype(jnp.float32)
    c = cond_ref[:].astype(jnp.float32)
    # normalize-free cosine: dot / sqrt(|x|^2 |c|^2) — avoids materializing
    # the two normalized [gh, gw, D] tensors (VMEM stack pressure)
    dot = jnp.sum(x * c, axis=-1)
    nx = jnp.sum(x * x, axis=-1)
    nc = jnp.sum(c * c, axis=-1)
    sim = dot * jax.lax.rsqrt(nx * nc + 1e-12)  # [gh, gw]
    mask = (sim <= thr_ref[0, 0]).astype(jnp.float32)

    if erosion_dilation:
        # Morphology via wrap-around rolls + validity masking (Mosaic does
        # not lower 2-D pads; rolls are native).  shift(m, dy, dx)[i, j] =
        # m[i-dy, j-dx] with out-of-grid reads as `fill`.
        rows = jax.lax.broadcasted_iota(jnp.int32, (grid_h, grid_w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (grid_h, grid_w), 1)

        def shift(m, dy, dx, fill):
            r = pltpu.roll(m, shift=dy % grid_h, axis=0)
            r = pltpu.roll(r, shift=dx % grid_w, axis=1)
            valid = ((rows - dy >= 0) & (rows - dy < grid_h)
                     & (cols - dx >= 0) & (cols - dx < grid_w))
            return jnp.where(valid, r, fill)

        # 3x3 cross erosion: all 5 cross cells must be 1 (zero padding ->
        # out-of-grid counts as 0, matching lax.conv 'same' semantics)
        er = mask
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            er = jnp.minimum(er, shift(mask, dy, dx, 0.0))
        # 5x5 square dilation: any cell in the window
        di = er
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                if dy == 0 and dx == 0:
                    continue
                di = jnp.maximum(di, shift(er, dy, dx, 0.0))
        mask = di

    out_ref[:] = mask


@functools.partial(
    jax.jit,
    static_argnames=("grid_h", "grid_w", "erosion_dilation", "interpret"))
def fused_partition(x0, cond, threshold, grid_h: int, grid_w: int,
                    erosion_dilation: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """x0, cond: [S, D] (batch already squeezed); threshold may be a traced
    scalar (it enters the kernel as an SMEM operand).  -> bool mask [S]."""
    s, d = x0.shape
    assert s == grid_h * grid_w
    x0g = x0.reshape(grid_h, grid_w, d)
    condg = cond.reshape(grid_h, grid_w, d)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_kernel, grid_h=grid_h, grid_w=grid_w,
                          erosion_dilation=erosion_dilation),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_h, grid_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(thr, x0g, condg)
    return out.reshape(-1) > 0.5


def use_fused_partition(similarity_type: str) -> bool:
    """The fused kernel implements the cosine path (the only similarity the
    reference's defaults use) on TPU backends."""
    import os
    if os.environ.get("REGIONE_TPU_FUSED_PARTITION", "1") == "0":
        return False
    if similarity_type != "cosine":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
