"""Weight converter tests: build a synthetic diffusers-style state dict,
convert, and check the resulting pytree runs and matches shapes/values."""

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.models.mmdit import init_mmdit, mmdit_forward, MODE_DENSE
from regione_tpu.models.presets import get_config
from regione_tpu.weights.convert import convert_flux_transformer


def synth_state_from_params(params, cfg):
    """Inverse mapping: our pytree -> diffusers-style flat torch state dict
    (numpy).  Exercises every mapping rule in convert_flux_transformer."""
    state = {}

    def put_lin(prefix, p):
        state[f"{prefix}.weight"] = np.asarray(p["w"], np.float32).T.copy()
        state[f"{prefix}.bias"] = np.asarray(p["b"], np.float32).copy()

    put_lin("x_embedder", params["x_embedder"])
    put_lin("context_embedder", params["txt_in"])
    put_lin("time_text_embed.timestep_embedder.linear_1", params["time_in"]["in"])
    put_lin("time_text_embed.timestep_embedder.linear_2", params["time_in"]["out"])
    if cfg.pooled_dim:
        put_lin("time_text_embed.text_embedder.linear_1", params["vector_in"]["in"])
        put_lin("time_text_embed.text_embedder.linear_2", params["vector_in"]["out"])
    if getattr(cfg, "txt_norm", False):
        state["txt_norm.weight"] = np.asarray(
            params["txt_norm"]["scale"], np.float32)
    put_lin("proj_out", params["final_proj"])
    # final_mod is [shift|scale] ours; diffusers emits [scale|shift]
    fm = params["final_mod"]
    h = fm["w"].shape[1] // 2
    state["norm_out.linear.weight"] = np.concatenate(
        [np.asarray(fm["w"][:, h:]), np.asarray(fm["w"][:, :h])], 1).T.copy()
    state["norm_out.linear.bias"] = np.concatenate(
        [np.asarray(fm["b"][h:]), np.asarray(fm["b"][:h])], 0)

    def layer(tree, i):
        return jax.tree.map(lambda x: np.asarray(x[i], np.float32), tree)

    for i in range(cfg.depth_double):
        d = layer(params["double"], i)
        p = f"transformer_blocks.{i}"
        put_lin(f"{p}.norm1.linear", d["img_mod"])
        put_lin(f"{p}.norm1_context.linear", d["txt_mod"])
        put_lin(f"{p}.attn.to_q", d["img_attn"]["q"])
        put_lin(f"{p}.attn.to_k", d["img_attn"]["k"])
        put_lin(f"{p}.attn.to_v", d["img_attn"]["v"])
        put_lin(f"{p}.attn.to_out.0", d["img_attn"]["out"])
        put_lin(f"{p}.attn.add_q_proj", d["txt_attn"]["q"])
        put_lin(f"{p}.attn.add_k_proj", d["txt_attn"]["k"])
        put_lin(f"{p}.attn.add_v_proj", d["txt_attn"]["v"])
        put_lin(f"{p}.attn.to_add_out", d["txt_attn"]["out"])
        state[f"{p}.attn.norm_q.weight"] = d["img_attn"]["norm_q"]["scale"]
        state[f"{p}.attn.norm_k.weight"] = d["img_attn"]["norm_k"]["scale"]
        state[f"{p}.attn.norm_added_q.weight"] = d["txt_attn"]["norm_q"]["scale"]
        state[f"{p}.attn.norm_added_k.weight"] = d["txt_attn"]["norm_k"]["scale"]
        put_lin(f"{p}.ff.net.0.proj", d["img_mlp"]["in"])
        put_lin(f"{p}.ff.net.2", d["img_mlp"]["out"])
        put_lin(f"{p}.ff_context.net.0.proj", d["txt_mlp"]["in"])
        put_lin(f"{p}.ff_context.net.2", d["txt_mlp"]["out"])

    inner = cfg.inner
    for i in range(cfg.depth_single):
        s = layer(params["single"], i)
        p = f"single_transformer_blocks.{i}"
        put_lin(f"{p}.norm.linear", s["mod"])
        w1, b1 = s["linear1"]["w"], s["linear1"]["b"]
        put_lin(f"{p}.attn.to_q", {"w": w1[:, :inner], "b": b1[:inner]})
        put_lin(f"{p}.attn.to_k", {"w": w1[:, inner:2 * inner],
                                   "b": b1[inner:2 * inner]})
        put_lin(f"{p}.attn.to_v", {"w": w1[:, 2 * inner:3 * inner],
                                   "b": b1[2 * inner:3 * inner]})
        put_lin(f"{p}.proj_mlp", {"w": w1[:, 3 * inner:], "b": b1[3 * inner:]})
        put_lin(f"{p}.proj_out", s["linear2"])
        state[f"{p}.attn.norm_q.weight"] = s["norm_q"]["scale"]
        state[f"{p}.attn.norm_k.weight"] = s["norm_k"]["scale"]
    return state


def test_flux_converter_roundtrip():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    state = synth_state_from_params(params, cfg)
    back = convert_flux_transformer(state, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {tuple(str(k) for k in p) for p, _ in flat_a}
    paths_b = {tuple(str(k) for k in p) for p, _ in flat_b}
    assert paths_a == paths_b
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(va, np.float32), vb,
                                   rtol=1e-6, atol=1e-6, err_msg=str(pa))

    # and the converted tree actually runs
    rng = np.random.default_rng(0)
    from regione_tpu.pipelines.base import EditPipelineBase
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    pipe = EditPipelineBase(cfg, jax.tree.map(jnp.asarray, back),
                            RegionEParams(), gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(4, 4, 4)
    v, _ = mmdit_forward(
        jax.tree.map(jnp.asarray, back), cfg,
        jnp.asarray(rng.standard_normal((1, 32, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)), jnp.float32),
        jnp.full((1,), 0.5), rope_img, rope_txt,
        pooled=jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32),
        mode=MODE_DENSE)
    assert v.shape == (1, 32, cfg.out_channels)


def test_vae_converter_roundtrip():
    """Synthetic diffusers AutoencoderKL state dict -> our VAE pytree:
    every tensor mapped, transposed correctly, and the tree runs."""
    from regione_tpu.models import vae as V
    from regione_tpu.weights.convert import convert_vae

    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    params = V.init_vae(jax.random.PRNGKey(0), vae_cfg)

    # inverse mapping: our pytree -> torch-layout flat dict
    state = {}

    def put_conv(prefix, p):
        w = np.asarray(p["w"], np.float32)          # [kh, kw, in, out]
        state[f"{prefix}.weight"] = w.transpose(3, 2, 0, 1).copy()
        state[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)

    def put_gn(prefix, p):
        state[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
        state[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)

    def put_resnet(prefix, p):
        put_gn(f"{prefix}.norm1", p["norm1"])
        put_conv(f"{prefix}.conv1", p["conv1"])
        put_gn(f"{prefix}.norm2", p["norm2"])
        put_conv(f"{prefix}.conv2", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{prefix}.conv_shortcut", p["shortcut"])

    def put_attn(prefix, p):
        put_gn(f"{prefix}.group_norm", p["norm"])
        for name, key in (("to_q", "q"), ("to_k", "k"), ("to_v", "v")):
            state[f"{prefix}.{name}.weight"] = np.asarray(
                p[key]["w"], np.float32).T.copy()
            state[f"{prefix}.{name}.bias"] = np.asarray(p[key]["b"], np.float32)
        state[f"{prefix}.to_out.0.weight"] = np.asarray(
            p["out"]["w"], np.float32).T.copy()
        state[f"{prefix}.to_out.0.bias"] = np.asarray(p["out"]["b"], np.float32)

    enc, dec = params["encoder"], params["decoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    put_gn("encoder.conv_norm_out", enc["norm_out"])
    put_conv("encoder.conv_out", enc["conv_out"])
    put_resnet("encoder.mid_block.resnets.0", enc["mid"]["res1"])
    put_attn("encoder.mid_block.attentions.0", enc["mid"]["attn"])
    put_resnet("encoder.mid_block.resnets.1", enc["mid"]["res2"])
    for i, blk in enumerate(enc["down"]):
        for j, rp in enumerate(blk["resnets"]):
            put_resnet(f"encoder.down_blocks.{i}.resnets.{j}", rp)
        if "downsample" in blk:
            put_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                     blk["downsample"])
    put_conv("decoder.conv_in", dec["conv_in"])
    put_gn("decoder.conv_norm_out", dec["norm_out"])
    put_conv("decoder.conv_out", dec["conv_out"])
    put_resnet("decoder.mid_block.resnets.0", dec["mid"]["res1"])
    put_attn("decoder.mid_block.attentions.0", dec["mid"]["attn"])
    put_resnet("decoder.mid_block.resnets.1", dec["mid"]["res2"])
    for i, blk in enumerate(dec["up"]):
        for j, rp in enumerate(blk["resnets"]):
            put_resnet(f"decoder.up_blocks.{i}.resnets.{j}", rp)
        if "upsample" in blk:
            put_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                     blk["upsample"])

    back = convert_vae(state, vae_cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(va, np.float32), vb,
                                   rtol=1e-6, atol=1e-6, err_msg=str(pa))

    # and it runs
    img = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 16, 3)),
                      jnp.float32)
    back_j = jax.tree.map(jnp.asarray, back)
    z = V.encode(back_j["encoder"], vae_cfg, img)
    out = V.decode(back_j["decoder"], vae_cfg, z)
    assert out.shape == (1, 16, 16, 3)
