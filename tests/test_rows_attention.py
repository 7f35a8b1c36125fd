"""Cache-native attention kernels vs the XLA reference, in Pallas
interpret mode (CPU).  The KV cache is head-major [B, H, S, dh]
(models.mmdit.init_cache) so kernels read it in place; the rows2 kernel
additionally folds the fresh txt rows of double blocks into the same
softmax without materializing a [txt ‖ cache] concatenation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regione_tpu.models.layers import sdpa
from regione_tpu.ops import flash_attention as fa
from regione_tpu.ops.quant import dequantize_kv_heads, quantize_kv_heads

B, H, T, T1, S, D = 1, 2, 48, 40, 256, 128


def _mk(seed, quant=False, with_bias=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((B, H, T1, D)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((B, H, T1, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(rng.random((B, T1 + S)) < 0.1, -1e9, 0.0), jnp.float32)
    if quant:
        kq, ks = quantize_kv_heads(kc)
        vq, vs = quantize_kv_heads(vc)
        return q, kt, vt, (kq, ks), (vq, vs), bias
    return q, kt, vt, kc, vc, bias


def _ref(q, kt, vt, kc, vc, bias, quant):
    if quant:
        kc = dequantize_kv_heads(kc[0], kc[1], q.dtype)
        vc = dequantize_kv_heads(vc[0], vc[1], q.dtype)
    k, v = kc, vc
    if kt is not None:
        k = jnp.concatenate([kt, k], 2)
        v = jnp.concatenate([vt, v], 2)
    b4 = bias[:, None, None, :] if bias is not None else None
    return sdpa(q, k, v, bias=b4)


@pytest.mark.parametrize("with_bias", [False, True])
def test_q8_resident_kernel_matches_dequantized_reference(with_bias):
    """Single-block path: flash_attention with int8 K/V + per-row scales
    (hoisted VMEM dequant)."""
    q, kt, vt, kc, vc, bias = _mk(1, quant=True, with_bias=with_bias)
    b = bias[:, T1:] if bias is not None else None
    ref = _ref(q, None, None, kc, vc, b, True)
    out = fa.flash_attention(q, kc[0], vc[0], b,
                             k_scale=kc[1], v_scale=vc[1], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("with_bias", [False, True])
def test_rows2_kernel_matches_reference(with_bias):
    """Two-part KV (fresh txt + cached image rows), incl. the txt-pad-
    to-128 masking path (T1=40)."""
    q, kt, vt, kc, vc, bias = _mk(2, with_bias=with_bias)
    ref = _ref(q, kt, vt, kc, vc, bias, False)
    out = fa.flash_attention_rows2(q, kt, vt, kc, vc, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_rows2_q8_kernel_matches_dequantized_reference(with_bias):
    q, kt, vt, kc, vc, bias = _mk(3, quant=True, with_bias=with_bias)
    ref = _ref(q, kt, vt, kc, vc, bias, True)
    out = fa.flash_attention_rows2(q, kt, vt, kc[0], vc[0], bias,
                                   k_scale=kc[1], v_scale=vc[1],
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_rows2_unaligned_query_rows():
    """T not a multiple of the q block: padding rows are dropped."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, H, 13, D)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((B, H, T1, D)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((B, H, T1, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    ref = _ref(q, kt, vt, kc, vc, None, False)
    out = fa.flash_attention_rows2(q, kt, vt, kc, vc, interpret=True)
    assert out.shape == (B, 13, H * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kv_heads_quant_roundtrip():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, H, S, D)) *
                    rng.uniform(0.1, 10, (B, H, S, 1)), jnp.float32)
    q8, s = quantize_kv_heads(x)
    assert q8.dtype == jnp.int8 and s.shape == (B, H, S)
    back = dequantize_kv_heads(q8, s, jnp.float32)
    amax = np.abs(np.asarray(x)).max(-1)
    err = np.abs(np.asarray(back) - np.asarray(x))
    assert (err <= amax[..., None] / 254 + 1e-6).all()
