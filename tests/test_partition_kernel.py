"""Fused Pallas partition kernel vs the XLA reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from regione_tpu.core.partition import select_edited_mask
from regione_tpu.ops.partition_kernel import fused_partition


@pytest.mark.parametrize("erosion_dilation", [False, True])
def test_fused_partition_matches_xla_path(erosion_dilation):
    rng = np.random.default_rng(0)
    gh = gw = 16
    s, d = gh * gw, 64
    x0 = rng.standard_normal((1, s, d)).astype(np.float32)
    cond = x0 + 0.3 * rng.standard_normal((1, s, d)).astype(np.float32)
    # decorrelate a solid block (edited region) so the mask is non-degenerate
    cond[0, : s // 3] = rng.standard_normal((s // 3, d)).astype(np.float32)
    # XLA reference (bypass the fused dispatch by using the raw functions)
    from regione_tpu.core.partition import (
        remove_scattered_points, token_similarity)
    sim = token_similarity(jnp.asarray(x0), jnp.asarray(cond), "cosine")
    want = np.asarray(sim[0] <= 0.9)
    if erosion_dilation:
        want = np.asarray(remove_scattered_points(
            jnp.asarray(want.reshape(gh, gw)))).reshape(-1)
    got = np.asarray(fused_partition(
        jnp.asarray(x0[0]), jnp.asarray(cond[0]), 0.9, gh, gw,
        erosion_dilation, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert 0 < got.sum() < s  # non-degenerate case


def test_select_edited_mask_dispatch_consistent(monkeypatch):
    """With the fused kernel forced on (interpret impossible through the
    dispatcher on CPU, so compare against forced-off instead)."""
    import regione_tpu.ops.partition_kernel as pk
    rng = np.random.default_rng(1)
    gh = gw = 8
    s, d = gh * gw, 16
    x0 = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    monkeypatch.setattr(pk, "use_fused_partition", lambda k: False)
    off = np.asarray(select_edited_mask(
        x0, cond, 0.0, grid_h=gh, grid_w=gw, erosion_dilation=True))
    # fused path in interpret mode directly
    on = np.asarray(fused_partition(x0[0], cond[0], 0.0, gh, gw, True,
                                    interpret=True))
    np.testing.assert_array_equal(on, off)
