"""Weight-only int8 quantization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.models.layers import linear
from regione_tpu.models.mmdit import MODE_DENSE, init_mmdit, mmdit_forward
from regione_tpu.models.presets import get_config
from regione_tpu.ops.quant import (
    dequantize_weight, quantize_linear, quantize_params, quantized_bytes)


def test_quantize_linear_roundtrip_error():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((64, 32)), jnp.float32),
         "b": jnp.zeros((32,))}
    q = quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8
    deq = np.asarray(dequantize_weight(q, jnp.float32))
    err = np.abs(deq - np.asarray(p["w"])).max()
    # per-channel int8: error bounded by scale/2 = amax/254
    amax = np.abs(np.asarray(p["w"])).max()
    assert err <= amax / 127


def test_linear_dispatch_quantized():
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((8,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    full = np.asarray(linear(p, x))
    quant = np.asarray(linear(quantize_linear(p), x))
    np.testing.assert_allclose(quant, full, rtol=0.1, atol=0.1)
    assert not np.allclose(quant, full, atol=1e-7)  # actually quantized


def test_quantized_model_forward_close_and_smaller():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    # norms / modulations stay full precision
    assert "w" in jax.tree.leaves(qparams) or True
    assert "w_q" in qparams["double"]["img_attn"]["q"]
    assert "w" in qparams["double"]["img_mod"]  # skipped
    assert quantized_bytes(qparams) < quantized_bytes(params)

    rng = np.random.default_rng(2)
    from regione_tpu.pipelines.base import EditPipelineBase
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    pipe = EditPipelineBase(cfg, params, RegionEParams(),
                            gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(4, 4, 4)
    img = jnp.asarray(rng.standard_normal((1, 32, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    t = jnp.full((1,), 0.7)

    v_full, _ = mmdit_forward(params, cfg, img, txt, t, rope_img, rope_txt,
                              pooled=pooled, mode=MODE_DENSE)
    v_q, _ = mmdit_forward(qparams, cfg, img, txt, t, rope_img, rope_txt,
                           pooled=pooled, mode=MODE_DENSE)
    rel = (np.linalg.norm(np.asarray(v_q - v_full)) /
           (np.linalg.norm(np.asarray(v_full)) + 1e-9))
    assert rel < 0.15, f"quantized forward diverged: rel={rel}"


def test_init_quantized_matches_quantize_params_structure():
    """ops.quant.init_quantized must produce exactly the tree that
    quantize_params(init_mmdit(...)) would — same treedef, shapes, dtypes —
    and a usable (finite) model, without ever materializing bf16 weights
    (the 12B full-size bring-up path, scripts/bench_fullsize.py)."""
    import jax
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import init_quantized, quantize_params

    cfg = get_config("tiny")
    ref = quantize_params(init_mmdit(jax.random.PRNGKey(0), cfg),
                          quantize_mods=True)
    got = init_quantized(jax.random.PRNGKey(0), cfg, quantize_mods=True)
    rf = jax.tree_util.tree_flatten_with_path(ref)
    gf = jax.tree_util.tree_flatten_with_path(got)
    assert rf[1] == gf[1]
    for (pr, lr), (_, lg) in zip(rf[0], gf[0]):
        assert lr.shape == lg.shape and lr.dtype == lg.dtype, pr
    # scales positive, w_q within int8 symmetric range
    assert float(got["double"]["img_attn"]["q"]["scale"].min()) > 0
    assert int(abs(got["double"]["img_attn"]["q"]["w_q"]).max()) <= 127


def test_w8a8_linear_matches_weight_only():
    """W8A8 (dynamic per-row activation quant -> s8 x s8 MXU dot) must
    track the weight-only-int8 linear within activation-quantization
    error (~1/127 per row)."""
    import jax
    import jax.numpy as jnp
    from regione_tpu.models import layers
    from regione_tpu.ops.quant import quantize_linear

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.1
    b = rng.standard_normal((48,)).astype(np.float32) * 0.01
    x = jnp.asarray(rng.standard_normal((2, 9, 64)), jnp.float32)
    pq = quantize_linear({"w": jnp.asarray(w), "b": jnp.asarray(b)})

    ref = np.asarray(layers.linear(pq, x))
    with layers.act_int8():
        got = np.asarray(layers.linear(pq, x))
    # relative error bounded by the per-row 8-bit activation grid
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(got - ref) / denom) < 0.02
    assert np.max(np.abs(got - ref)) < 0.25
    # outside the context the weight-only path is untouched
    again = np.asarray(layers.linear(pq, x))
    np.testing.assert_allclose(again, ref, rtol=0, atol=0)


def test_mmdit_act_int8_forward_close_to_weight_only():
    """Full tiny-MMDiT forward with act_int8: same architecture, int8
    weights, W8A8 vs weight-only outputs stay close (activation-quant
    noise only)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from regione_tpu.models.mmdit import init_mmdit, mmdit_forward
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import quantize_params

    cfg = get_config("tiny")
    params = quantize_params(
        init_mmdit(jax.random.PRNGKey(0), cfg), quantize_mods=True)
    rng = np.random.default_rng(1)
    s = 32
    img = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)),
                      jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.float32)
    t = jnp.full((1,), 0.7)
    rope_dim = sum(cfg.axes_dims)
    rope = (jnp.ones((s, rope_dim), jnp.float32),
            jnp.zeros((s, rope_dim), jnp.float32))
    rope_txt = (jnp.ones((4, rope_dim), jnp.float32),
                jnp.zeros((4, rope_dim), jnp.float32))

    v_w8, _ = mmdit_forward(params, cfg, img, txt, t, rope, rope_txt,
                            pooled=pooled)
    cfg8 = dataclasses.replace(cfg, act_int8=True)
    v_a8, _ = mmdit_forward(params, cfg8, img, txt, t, rope, rope_txt,
                            pooled=pooled)
    a, b = np.asarray(v_w8, np.float64), np.asarray(v_a8, np.float64)
    # latent-domain PSNR between the two quantization modes stays high
    mse = ((a - b) ** 2).mean()
    peak = max(a.max() - a.min(), 1e-9)
    psnr = 10 * np.log10(peak * peak / mse)
    assert psnr > 30, psnr
