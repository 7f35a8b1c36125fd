"""int8 KV cache: quantization round-trip bounds, q8 kernel equivalence
(interpret mode), and end-to-end sampler parity vs the bf16-cache path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.models.presets import get_config
from regione_tpu.ops.quant import dequantize_kv_rows, quantize_kv_rows


def test_kv_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    heads = 4
    rows = jnp.asarray(rng.standard_normal((2, 16, heads * 8)) *
                       rng.uniform(0.1, 10, (2, 16, 1)), jnp.float32)
    q, s = quantize_kv_rows(rows, heads)
    assert q.dtype == jnp.int8 and s.shape == (2, 16, heads)
    back = dequantize_kv_rows(q, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(rows))
    amax = np.abs(np.asarray(rows)).reshape(2, 16, heads, 8).max(-1)
    # symmetric int8: error <= scale/2 = amax/254 per element
    assert (err.reshape(2, 16, heads, 8) <=
            amax[..., None] / 254 + 1e-6).all()


def test_q8_flash_kernel_matches_dequantized_reference():
    from regione_tpu.models.layers import split_heads
    from regione_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(1)
    b, h, t, s, d = 1, 2, 16, 64, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    kq, ks = quantize_kv_rows(k_rows, h)
    vq, vs = quantize_kv_rows(v_rows, h)

    ref = jax.jit(lambda: _ref(q, kq, ks, vq, vs, h))()

    out = fa.flash_attention(
        q, split_heads(kq, h), split_heads(vq, h), None,
        k_scale=ks.transpose(0, 2, 1), v_scale=vs.transpose(0, 2, 1),
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def _ref(q, kq, ks, vq, vs, heads):
    from regione_tpu.models.layers import sdpa, split_heads
    k = split_heads(dequantize_kv_rows(kq, ks, q.dtype), heads)
    v = split_heads(dequantize_kv_rows(vq, vs, q.dtype), heads)
    return sdpa(q, k, v)


def _psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    peak = max(a.max() - a.min(), 1e-9)
    return 10 * np.log10(peak * peak / mse)


def test_sampler_end_to_end_int8_cache_close_to_bf16():
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.pipelines.base import EditInputs, EditPipelineBase

    cfg = get_config("tiny")
    cfg8 = dataclasses.replace(cfg, cache_int8=True)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       cache_threshold=0.05, capacity_granularity=8)
    rng = np.random.default_rng(7)
    grid, t_txt = 8, 4
    s = grid * grid
    params = init_mmdit(jax.random.PRNGKey(0), cfg)

    outs = {}
    for name, c in (("bf16", cfg), ("int8", cfg8)):
        pipe = EditPipelineBase(c, params, re, gamma=gamma_for("step1x-edit"))
        rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)
        rr = np.random.default_rng(7)
        ctx = EditInputs(
            txt=jnp.asarray(rr.standard_normal((1, t_txt, c.txt_in_dim)),
                            jnp.float32),
            cond_latent=jnp.asarray(
                rr.standard_normal((1, s, c.in_channels)), jnp.float32),
            rope_img=rope_img, rope_txt=rope_txt,
            pooled=jnp.asarray(rr.standard_normal((1, c.pooled_dim)),
                               jnp.float32))
        lat0 = jnp.asarray(rr.standard_normal((1, s, c.in_channels)),
                           jnp.float32)
        outs[name], stats = pipe.edit_latents(lat0, ctx, grid, grid)
        assert bool(jnp.isfinite(outs[name]).all())

    p = _psnr(outs["bf16"], outs["int8"])
    # int8 cache only perturbs the RAGS-phase attention; at fp32 weights
    # the two runs must stay numerically very close
    assert p > 35.0, f"int8-cache output too far from bf16 cache: {p:.1f} dB"
