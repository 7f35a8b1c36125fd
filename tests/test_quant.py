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


# ---------------------------------------------------------------------------
# int4 (nibble-packed) weights
# ---------------------------------------------------------------------------

def test_pack_unpack_int4_roundtrip_exact():
    from regione_tpu.ops.quant import pack_int4, unpack_int4
    vals = np.arange(-8, 8, dtype=np.int8)
    lo, hi = np.meshgrid(vals, vals)
    lo = jnp.asarray(lo.ravel(), jnp.int8)
    hi = jnp.asarray(hi.ravel(), jnp.int8)
    glo, ghi = unpack_int4(pack_int4(lo, hi))
    np.testing.assert_array_equal(np.asarray(glo), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(ghi), np.asarray(hi))


def test_quantize_linear4_roundtrip_error():
    from regione_tpu.ops.quant import dequantize_weight4, quantize_linear4
    rng = np.random.default_rng(3)
    w = rng.standard_normal((512, 96)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.zeros((96,))}
    q = quantize_linear4(p)
    assert q["w_qp"].dtype == jnp.int8
    assert q["w_qp"].shape == (256, 96)
    assert q["scale4"].shape == (4, 96)  # group size 128 over in=512
    deq = np.asarray(dequantize_weight4(q, jnp.float32))
    # per-(group, channel) int4: |err| <= scale/2 = group amax / 14
    wg = w.reshape(4, 128, 96)
    amax = np.abs(wg).max(axis=1, keepdims=True)
    err = np.abs(deq.reshape(4, 128, 96) - wg)
    assert (err <= amax / 7.0 / 2 + 1e-6).all()


def test_quantize_linear4_stacked():
    from regione_tpu.ops.quant import dequantize_weight4, quantize_linear4
    rng = np.random.default_rng(4)
    w = rng.standard_normal((3, 512, 32)).astype(np.float32)
    q = quantize_linear4({"w": jnp.asarray(w), "b": jnp.zeros((3, 32))})
    assert q["w_qp"].shape == (3, 256, 32)
    assert q["scale4"].shape == (3, 4, 32)
    deq = np.asarray(dequantize_weight4(q, jnp.float32))
    # Gaussian weights, group-128 amax scaling: per-weight RMS noise is
    # ~amax/(7*sqrt(12)) ~ 12% of sigma — int4 buys FIT, not fidelity
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.2, rel


def test_linear_dispatch_int4_matches_dequantized_dot():
    from regione_tpu.ops.quant import dequantize_weight4, quantize_linear4
    rng = np.random.default_rng(5)
    p = {"w": jnp.asarray(rng.standard_normal((512, 64)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 7, 512)), jnp.float32)
    q = quantize_linear4(p)
    got = np.asarray(linear(q, x))
    ref = np.asarray(jnp.dot(x, dequantize_weight4(q, jnp.float32)) + p["b"])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    full = np.asarray(linear(p, x))
    rel = np.linalg.norm(got - full) / np.linalg.norm(full)
    assert rel < 0.2, rel  # ~12% int4 grid noise on Gaussian weights
    # W8A8 context must NOT engage for int4 leaves (bf16 compute path)
    from regione_tpu.models import layers
    with layers.act_int8():
        again = np.asarray(linear(q, x))
    np.testing.assert_allclose(again, got, rtol=0, atol=0)


def test_slice_out_int4():
    from regione_tpu.models.mmdit import _slice_out
    from regione_tpu.ops.quant import dequantize_weight4, quantize_linear4
    rng = np.random.default_rng(6)
    q = quantize_linear4(
        {"w": jnp.asarray(rng.standard_normal((512, 48)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((48,)), jnp.float32)})
    part = _slice_out(q, 16, 40)
    full = np.asarray(dequantize_weight4(q, jnp.float32))
    got = np.asarray(dequantize_weight4(part, jnp.float32))
    np.testing.assert_allclose(got, full[:, 16:40], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(part["b"]), np.asarray(q["b"][16:40]))


def test_quantize_params_bits4_mixed_tree(monkeypatch):
    """bits=4: big linears -> w_qp, modulations stay int8, norms untouched."""
    import regione_tpu.ops.quant as quant
    monkeypatch.setattr(quant, "_INT4_MIN_IN", 0)
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_params(params, quantize_mods=True, bits=4)
    assert "w_qp" in q4["double"]["img_attn"]["q"]
    assert "w_q" in q4["double"]["img_mod"]      # mods stay int8
    assert "scale" in q4["double"]["norm1_q"] if "norm1_q" in q4["double"] else True
    assert quant.quantized_bytes(q4) < quant.quantized_bytes(
        quant.quantize_params(params, quantize_mods=True))


def test_mmdit_int4_forward_close(monkeypatch):
    """Full tiny-MMDiT forward on the int4 tree stays close to bf16."""
    import regione_tpu.ops.quant as quant
    monkeypatch.setattr(quant, "_INT4_MIN_IN", 0)
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_params(params, quantize_mods=True, bits=4)
    rng = np.random.default_rng(7)
    s = 32
    img = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    t = jnp.full((1,), 0.7)
    rope_dim = sum(cfg.axes_dims)
    rope = (jnp.ones((s, rope_dim), jnp.float32),
            jnp.zeros((s, rope_dim), jnp.float32))
    rope_txt = (jnp.ones((4, rope_dim), jnp.float32),
                jnp.zeros((4, rope_dim), jnp.float32))
    v_full, _ = mmdit_forward(params, cfg, img, txt, t, rope, rope_txt,
                              pooled=pooled)
    v_q4, _ = mmdit_forward(q4, cfg, img, txt, t, rope, rope_txt,
                            pooled=pooled)
    rel = (np.linalg.norm(np.asarray(v_q4 - v_full)) /
           (np.linalg.norm(np.asarray(v_full)) + 1e-9))
    assert rel < 0.30, f"int4 forward diverged: rel={rel}"
    assert np.isfinite(np.asarray(v_q4)).all()


def test_init_quantized_bits4_matches_structure(monkeypatch):
    import regione_tpu.ops.quant as quant
    monkeypatch.setattr(quant, "_INT4_MIN_IN", 0)
    cfg = get_config("tiny")
    ref = quant.quantize_params(init_mmdit(jax.random.PRNGKey(0), cfg),
                                quantize_mods=True, bits=4)
    got = quant.init_quantized(jax.random.PRNGKey(0), cfg,
                               quantize_mods=True, bits=4)
    rf = jax.tree_util.tree_flatten_with_path(ref)
    gf = jax.tree_util.tree_flatten_with_path(got)
    assert rf[1] == gf[1]
    for (pr, lr), (_, lg) in zip(rf[0], gf[0]):
        assert lr.shape == lg.shape and lr.dtype == lg.dtype, pr
    # unpacked nibbles stay in the symmetric int4 range
    from regione_tpu.ops.quant import unpack_int4
    lo, hi = unpack_int4(got["double"]["img_attn"]["q"]["w_qp"])
    assert int(abs(lo).max()) <= 7 and int(abs(hi).max()) <= 7
    assert float(got["double"]["img_attn"]["q"]["scale4"].min()) > 0
