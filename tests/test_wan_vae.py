"""Wan-VAE (Qwen-Image) tests: the causal-3D -> 2-D single-frame fold is
proven against a from-scratch causal conv3d oracle, and the converter is
roundtripped on a synthesized diffusers-style AutoencoderKLWan state dict
(full tensor mapping, flattened ModuleList walking, unmapped detection)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regione_tpu.models import vae_wan
from regione_tpu.models.vae_wan import WanVAEConfig
from regione_tpu.weights.convert import (
    TrackingState,
    _fold_causal3d,
    convert_wan_vae,
    is_wan_vae_state,
)


def causal_conv3d_oracle(x, w, b):
    """From-scratch WanCausalConv3d for stride 1: pad time with (kt-1)
    zeros IN FRONT, spatial 'same' padding, then plain valid conv3d.
    x: [B, C_in, T, H, W]; w: [C_out, C_in, kt, kh, kw]."""
    co, ci, kt, kh, kw = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (kt - 1, 0),
                   (kh // 2, kh // 2), (kw // 2, kw // 2)))
    b_, _, t, h, w_sp = x.shape
    to, ho, wo = t - kt + 1, h - kh + 1, w_sp - kw + 1
    out = np.zeros((b_, co, to, ho, wo), np.float64)
    for bt in range(b_):
        for o in range(co):
            for it in range(to):
                for ih in range(ho):
                    for iw in range(wo):
                        out[bt, o, it, ih, iw] = np.sum(
                            x[bt, :, it:it + kt, ih:ih + kh, iw:iw + kw]
                            * w[o]) + b[o]
    return out


def test_causal3d_single_frame_folds_to_last_tap():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 1, 5, 5))          # one frame
    w = rng.standard_normal((4, 3, 3, 3, 3))
    b = rng.standard_normal(4)
    ref = causal_conv3d_oracle(x, w, b)               # [1, 4, 1, 5, 5]
    w2d = _fold_causal3d(w)                           # [3, 3, 3, 4] HWIO
    x_nhwc = jnp.asarray(x[:, :, 0].transpose(0, 2, 3, 1))
    out = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(w2d), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(
        np.asarray(out), ref[:, :, 0].transpose(0, 2, 3, 1), rtol=1e-5)


TINY = WanVAEConfig(base_dim=8, dim_mult=(1, 2), num_res_blocks=1,
                    latent_channels=4,
                    latents_mean=tuple(np.linspace(-1, 1, 4)),
                    latents_std=tuple(np.linspace(0.5, 2, 4)))


def synth_wan_state(cfg: WanVAEConfig, seed=0):
    """diffusers-style AutoencoderKLWan state dict (torch tensor layouts)
    for a tiny config, including the flattened down_blocks/up_blocks
    ModuleList indexing and (ignored) time_conv resample weights."""
    rng = np.random.default_rng(seed)
    st = {}

    def conv3(prefix, cin, cout, k=3):
        st[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin, k, k, k)).astype(np.float32) * 0.05
        st[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def conv2(prefix, cin, cout, k=3):
        st[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        st[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def rms(prefix, c):
        st[f"{prefix}.gamma"] = rng.standard_normal(
            (c, 1, 1, 1)).astype(np.float32)

    def resnet(prefix, cin, cout):
        rms(f"{prefix}.norm1", cin)
        conv3(f"{prefix}.conv1", cin, cout)
        rms(f"{prefix}.norm2", cout)
        conv3(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv3(f"{prefix}.conv_shortcut", cin, cout, k=1)

    def attnb(prefix, c):
        rms(f"{prefix}.norm", c)
        conv2(f"{prefix}.to_qkv", c, 3 * c, k=1)
        conv2(f"{prefix}.proj", c, c, k=1)

    def mid(prefix, c):
        resnet(f"{prefix}.resnets.0", c, c)
        attnb(f"{prefix}.attentions.0", c)
        resnet(f"{prefix}.resnets.1", c, c)

    edims = cfg.encoder_dims          # [8, 8, 16]
    z = cfg.latent_channels
    conv3("encoder.conv_in", cfg.in_channels, edims[0])
    idx = 0
    for i, (cin, cout) in enumerate(zip(edims[:-1], edims[1:])):
        d = cin
        for _ in range(cfg.num_res_blocks):
            resnet(f"encoder.down_blocks.{idx}", d, cout)
            d = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            conv2(f"encoder.down_blocks.{idx}.resample.1", cout, cout)
            # a (video-only) temporal conv the image path must ignore
            conv3(f"encoder.down_blocks.{idx}.time_conv", cout, cout)
            idx += 1
    mid("encoder.mid_block", edims[-1])
    rms("encoder.norm_out", edims[-1])
    conv3("encoder.conv_out", edims[-1], 2 * z)
    conv3("quant_conv", 2 * z, 2 * z, k=1)
    conv3("post_quant_conv", z, z, k=1)

    ddims = cfg.decoder_dims          # [16, 16, 8]
    conv3("decoder.conv_in", z, ddims[0])
    mid("decoder.mid_block", ddims[0])
    idx = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        d = cin if i == 0 else cin // 2
        for _ in range(cfg.num_res_blocks + 1):
            resnet(f"decoder.up_blocks.{idx}", d, cout)
            d = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            conv2(f"decoder.up_blocks.{idx}.resample.1", cout, cout // 2)
            conv3(f"decoder.up_blocks.{idx}.time_conv", cout, 2 * cout)
            idx += 1
    rms("decoder.norm_out", ddims[-1])
    conv3("decoder.conv_out", ddims[-1], cfg.in_channels)
    return st


def test_convert_wan_roundtrip_and_forward():
    st = synth_wan_state(TINY)
    params = convert_wan_vae(dict(st), TINY)
    # every converted conv folded the last temporal tap
    w_src = st["encoder.conv_in.weight"]
    np.testing.assert_array_equal(
        params["encoder"]["conv_in"]["w"],
        w_src[:, :, -1].transpose(2, 3, 1, 0))
    # shapes line up with init_wan_vae (the JAX-side source of truth)
    ref = vae_wan.init_wan_vae(jax.random.PRNGKey(0), TINY)
    got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), params)
    ref_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), ref)
    assert got_shapes == ref_shapes
    # full encode -> normalize -> denormalize -> decode runs and is finite
    img = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16, 16, 3)), jnp.float32)
    zed = vae_wan.encode(params["encoder"], TINY, img)
    assert zed.shape == (1, 8, 8, TINY.latent_channels)
    zn = vae_wan.normalize_latents(TINY, zed)
    back = vae_wan.denormalize_latents(TINY, zn)
    np.testing.assert_allclose(np.asarray(back), np.asarray(zed), rtol=1e-5)
    out = vae_wan.decode(params["decoder"], TINY, zed)
    assert out.shape == img.shape and bool(jnp.isfinite(out).all())


def test_convert_wan_flags_unmapped_tensors():
    st = synth_wan_state(TINY)
    st["decoder.某_extra.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_wan_vae(st, TINY)


def test_wan_state_detection():
    assert is_wan_vae_state(synth_wan_state(TINY))
    assert not is_wan_vae_state({"encoder.conv_norm_out.weight": 0})


def test_tracking_state_reports_only_unread():
    ts = TrackingState({"a": 1, "b": 2, "c.time_conv.w": 3})
    _ = ts["a"]
    assert ts.unconsumed() == ["b", "c.time_conv.w"]
    assert ts.unconsumed(ignore_patterns=(r"time_conv",)) == ["b"]
