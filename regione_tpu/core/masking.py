"""Static-capacity gather/scatter primitives.

The reference gathers edited tokens into a dynamically sized [B, k, D]
tensor (RegionE/Step1XEdit/utils.py:220-259).  XLA requires static shapes,
so we use a fixed-capacity index formulation:

  * ``mask_to_padded_ids``: boolean mask [S] -> int32 ids [K_cap], where
    invalid slots hold the sentinel ``S`` (one past the end).
  * gathers use ``mode='fill'`` so padded slots read zeros;
  * scatters use ``mode='drop'`` so padded slots write nowhere.

Padded query rows flow through the transformer as garbage and are dropped at
the scatter — they never contaminate real tokens.  This is the TPU-native
replacement for the reference's Triton indexed matmul (fused_kernels.py:9-101):
gather -> dense MXU matmul -> dropped scatter, all fusable by XLA.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np


def mask_to_padded_ids(mask: np.ndarray, capacity: int) -> np.ndarray:
    """Host-side: boolean mask [S] -> sorted int32 ids padded to `capacity`
    with the out-of-range sentinel S.  Truncates (dropping the highest ids)
    if the edited count exceeds capacity — callers should size capacity via
    config.pick_capacity so this never happens in practice."""
    mask = np.asarray(mask, dtype=bool)
    s = mask.shape[0]
    ids = np.nonzero(mask)[0].astype(np.int32)
    if len(ids) > capacity:
        ids = ids[:capacity]
    out = np.full((capacity,), s, dtype=np.int32)
    out[: len(ids)] = ids
    return out


def padded_ids_valid(ids: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """[K] bool validity mask of a padded id vector."""
    return ids < seq_len


def gather_rows(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of [B, S, D] by padded ids [K] -> [B, K, D]; padded slots
    read as zeros (equivalent of reference ids_gather, utils.py:240-259)."""
    return jnp.take(x, ids, axis=1, mode="fill", fill_value=0)


def scatter_rows(dst: jnp.ndarray, ids: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Scatter [B, K, D] rows into [B, S, D] at padded ids [K]; padded slots
    are dropped (equivalent of reference ids_scatter, utils.py:220-237)."""
    return dst.at[:, ids, :].set(vals, mode="drop", unique_indices=True)


def scatter_rows_2d(dst: jnp.ndarray, ids: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Scatter [K, D] rows into [S, D] at padded ids [K] (drop padding)."""
    return dst.at[ids, :].set(vals, mode="drop", unique_indices=True)


def where_rows(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise select: mask [S] broadcast over [B, S, D]."""
    return jnp.where(mask[None, :, None], a, b)
