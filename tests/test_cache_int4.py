"""int4 (nibble-packed) KV cache: quantization round-trip bounds, packed
kernel equivalence in interpret mode (both the q8-resident and the rows2
kernels), and end-to-end sampler parity vs the bf16-cache path.

The int4 cache is the single-chip unlock for the FULL 20B Qwen at the
reference's native 1024^2 area (RegionE/QwenImageEdit/inplace.py
calculate_dimensions): utils.memplan puts the grid-64 int8 cache at
5.8 GiB beside 10.2 GiB int4 weights (over the 16 GB v5e); int4 halves
the cache to 2.9 GiB.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from regione_tpu.models.presets import get_config
from regione_tpu.ops.quant import (dequantize_kv_heads4, pack_int4,
                                   quantize_kv_heads4, unpack_int4)


def test_kv4_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    b, h, s, dh = 2, 3, 16, 8
    rows = jnp.asarray(rng.standard_normal((b, h, s, dh)) *
                       rng.uniform(0.1, 10, (b, h, s, 1)), jnp.float32)
    qp, sc = quantize_kv_heads4(rows)
    # S-halves packing: S/2 rows at full head_dim width (the minor axis
    # stays lane-exact — packing along head_dim tile-pads 2x and XLA's
    # layout copies OOM the 1024^2 single-chip config)
    assert qp.dtype == jnp.int8 and qp.shape == (b, h, s // 2, dh)
    assert sc.shape == (b, h, s)
    back = dequantize_kv_heads4(qp, sc, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(rows))
    amax = np.abs(np.asarray(rows)).max(-1)
    # symmetric int4: error <= scale/2 = amax/14 per element
    assert (err <= amax[..., None] / 14 + 1e-6).all()


def test_pack_unpack_int4_inverse():
    rng = np.random.default_rng(1)
    lo = jnp.asarray(rng.integers(-7, 8, (4, 6)), jnp.int8)
    hi = jnp.asarray(rng.integers(-7, 8, (4, 6)), jnp.int8)
    lo2, hi2 = unpack_int4(pack_int4(lo, hi))
    np.testing.assert_array_equal(np.asarray(lo2), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(hi2), np.asarray(hi))


def _heads_quant4(rows, heads):
    """[B, S, H*dh] -> head-major packed (q [B,H,S,dh/2], s [B,H,S])."""
    from regione_tpu.models.layers import split_heads
    return quantize_kv_heads4(split_heads(rows, heads))


import pytest


@pytest.mark.parametrize("s", [256, 64])
def test_q4_flash_kernel_matches_dequantized_reference(s):
    """Packed int4 path of the KV-resident kernel (txt_kv=None).

    s=256 hits the packed resident kernel itself (S % 256 == 0, the tile
    condition the FULL 20B Qwen @1024^2 rows satisfy at S=8192); s=64
    hits the up-front-dequant fallback (flash_attention's
    `packed and s % 256 != 0` guard).  Both must match the dequantized
    reference."""
    from regione_tpu.models.layers import sdpa
    from regione_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(2)
    b, h, t, d = 1, 2, 16, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    kq, ks = _heads_quant4(k_rows, h)
    vq, vs = _heads_quant4(v_rows, h)

    ref = sdpa(q, dequantize_kv_heads4(kq, ks, q.dtype),
               dequantize_kv_heads4(vq, vs, q.dtype))
    out = fa.flash_attention(q, kq, vq, None, k_scale=ks, v_scale=vs,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_q4_rows2_kernel_matches_dequantized_reference():
    """Packed int4 path of the rows2 (fresh txt ‖ cached image) kernel."""
    from regione_tpu.models.layers import sdpa
    from regione_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(3)
    b, h, t, t1, s, d = 1, 2, 24, 8, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k_txt = jnp.asarray(rng.standard_normal((b, h, t1, d)), jnp.float32)
    v_txt = jnp.asarray(rng.standard_normal((b, h, t1, d)), jnp.float32)
    k_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v_rows = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    kq, ks = _heads_quant4(k_rows, h)
    vq, vs = _heads_quant4(v_rows, h)
    bias = jnp.where(jnp.asarray(rng.random((b, t1 + s))) < 0.1,
                     -1e30, 0.0).astype(jnp.float32)

    k_full = jnp.concatenate(
        [k_txt.astype(q.dtype), dequantize_kv_heads4(kq, ks, q.dtype)], 2)
    v_full = jnp.concatenate(
        [v_txt.astype(q.dtype), dequantize_kv_heads4(vq, vs, q.dtype)], 2)
    ref = sdpa(q, k_full, v_full, bias=bias[:, None, None, :])

    out = fa.flash_attention_rows2(q, k_txt, v_txt, kq, vq, bias,
                                   k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def _psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    peak = max(a.max() - a.min(), 1e-9)
    return 10 * np.log10(peak * peak / mse)


def test_sampler_end_to_end_int4_cache_close_to_bf16():
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.pipelines.base import EditInputs, EditPipelineBase

    cfg = get_config("tiny")
    cfg4 = dataclasses.replace(cfg, cache_int4=True)
    re = RegionEParams(threshold=0.0, erosion_dilation=False,
                       cache_threshold=0.05, capacity_granularity=8)
    grid, t_txt = 8, 4
    s = grid * grid
    params = init_mmdit(jax.random.PRNGKey(0), cfg)

    outs = {}
    for name, c in (("bf16", cfg), ("int4", cfg4)):
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

    p = _psnr(outs["bf16"], outs["int4"])
    # int4 cache only perturbs the RAGS-phase attention; the decayed 28-step
    # loop keeps the two runs close (looser than int8's 35 dB bound)
    assert p > 25.0, f"int4-cache output too far from bf16 cache: {p:.1f} dB"


def test_cache_int8_int4_mutually_exclusive():
    import pytest

    cfg = dataclasses.replace(get_config("tiny"), cache_int8=True,
                              cache_int4=True)
    with pytest.raises(AssertionError):
        _ = cfg.cache_quant
