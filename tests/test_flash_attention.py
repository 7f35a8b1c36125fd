"""Pallas flash attention vs XLA sdpa equivalence (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regione_tpu.models.layers import sdpa
from regione_tpu.ops.flash_attention import flash_attention


def rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


@pytest.mark.parametrize("t,s", [(128, 256), (8, 384)])
def test_flash_matches_sdpa(t, s):
    b, h, d = 2, 2, 128
    q = rand((b, h, t, d), 0)
    k = rand((b, h, s, d), 1)
    v = rand((b, h, s, d), 2)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_with_bias_masks_columns():
    b, h, t, s, d = 1, 2, 8, 256, 128
    q = rand((b, h, t, d), 3)
    k = rand((b, h, s, d), 4)
    v = rand((b, h, s, d), 5)
    bias = np.zeros((b, s), np.float32)
    bias[:, 200:] = -1e9  # mask tail keys
    want = np.asarray(sdpa(q, k, v, bias=jnp.asarray(bias)[:, None, None, :]))
    got = np.asarray(flash_attention(q, k, v, bias=jnp.asarray(bias),
                                     block_q=8, block_k=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # masked keys truly have no influence
    v2 = v.at[:, :, 200:, :].set(999.0)
    got2 = np.asarray(flash_attention(q, k, v2, bias=jnp.asarray(bias),
                                      block_q=8, block_k=128, interpret=True))
    np.testing.assert_allclose(got2, got, rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    b, h, t, s, d = 1, 2, 128, 512, 128
    q = rand((b, h, t, d), 6, jnp.bfloat16)
    k = rand((b, h, s, d), 7, jnp.bfloat16)
    v = rand((b, h, s, d), 8, jnp.bfloat16)
    want = np.asarray(sdpa(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_online_softmax_fallback_path():
    # large block_q * S exceeds the resident-logits budget -> flash fallback
    b, h, t, s, d = 1, 1, 1024, 2048, 128
    q = rand((b, h, t, d), 9)
    k = rand((b, h, s, d), 10)
    v = rand((b, h, s, d), 11)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=1024, block_k=512,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_unaligned_seq_padding():
    # T and S not tile multiples: wrapper pads + masks
    b, h, t, s, d = 1, 2, 37, 300, 128
    q = rand((b, h, t, d), 12)
    k = rand((b, h, s, d), 13)
    v = rand((b, h, s, d), 14)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rows2_vmem_guard_boundary():
    """The rows2 dispatch guard must reject the geometry that measurably
    exceeded scoped VMEM on v5e (everything-edited at the 1024^2 dev
    grid) and accept every production geometry."""
    from regione_tpu.ops.flash_attention import rows2_fits_vmem

    assert not rows2_fits_vmem(4224, 8192, 128, True)   # measured failure
    assert rows2_fits_vmem(1152, 8192, 128, True)       # dev cap 1024
    assert rows2_fits_vmem(640, 3872, 128, True)        # step1x 704px
    assert rows2_fits_vmem(1536, 8192, 128, True)       # flux 1024px
    assert rows2_fits_vmem(1152, 4608, 128, True)       # qwen 768px
    assert rows2_fits_vmem(1152, 8192, 128, False)      # dev bf16 cache
