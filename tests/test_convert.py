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
    if cfg.guidance_embed:
        put_lin("time_text_embed.guidance_embedder.linear_1",
                params["guidance_in"]["in"])
        put_lin("time_text_embed.guidance_embedder.linear_2",
                params["guidance_in"]["out"])
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


def synth_connector_state(cp, ccfg, prefix="connector."):
    """Inverse of convert_connector: our connector pytree -> the Step1X-Edit
    Qwen2Connector torch naming (fused self_attn_qkv etc.)."""
    state = {}

    def put_lin(name, p):
        state[f"{prefix}{name}.weight"] = np.asarray(p["w"], np.float32).T.copy()
        state[f"{prefix}{name}.bias"] = np.asarray(p["b"], np.float32).copy()

    put_lin("S.input_embedder", cp["in_proj"])
    put_lin("S.t_embedder.mlp.0", cp["t_embed"]["in"])
    put_lin("S.t_embedder.mlp.2", cp["t_embed"]["out"])
    put_lin("S.c_embedder.linear_1", cp["c_embed"]["in"])
    put_lin("S.c_embedder.linear_2", cp["c_embed"]["out"])
    put_lin("global_proj_out", cp["global_proj"])
    state[f"{prefix}scale_factor"] = np.asarray(cp["scale_factor"], np.float32)
    for i in range(ccfg.depth):
        blk = jax.tree.map(lambda x: np.asarray(x[i], np.float32), cp["blocks"])
        b = f"S.individual_token_refiner.blocks.{i}"
        for n in ("norm1", "norm2"):
            state[f"{prefix}{b}.{n}.weight"] = blk[n]["scale"]
            state[f"{prefix}{b}.{n}.bias"] = blk[n]["bias"]
        qkv_w = np.concatenate(
            [blk["attn"][k]["w"] for k in ("q", "k", "v")], 1)
        qkv_b = np.concatenate(
            [blk["attn"][k]["b"] for k in ("q", "k", "v")], 0)
        state[f"{prefix}{b}.self_attn_qkv.weight"] = qkv_w.T.copy()
        state[f"{prefix}{b}.self_attn_qkv.bias"] = qkv_b
        put_lin(f"{b}.self_attn_proj", blk["attn"]["out"])
        put_lin(f"{b}.mlp.fc1", blk["mlp"]["in"])
        put_lin(f"{b}.mlp.fc2", blk["mlp"]["out"])
        put_lin(f"{b}.adaLN_modulation.1", blk["mod"])
    return state


def to_step1x_naming(state):
    """Re-key a diffusers-flux-named state dict to the Step1X transformer
    naming (time_embed/vec_embed top-level embedders)."""
    renames = {"time_text_embed.timestep_embedder.": "time_embed.",
               "time_text_embed.text_embedder.": "vec_embed."}
    out = {}
    for k, v in state.items():
        for old, new in renames.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def to_qwen_naming(state):
    """Re-key a diffusers-flux-named state dict to the Qwen-Image-Edit
    checkpoint naming (img_mod/txt_mod/img_mlp/img_in/txt_in — the inverse
    of convert.QWEN_ALIASES)."""
    inv = [
        (".norm1.linear", ".img_mod.1"),
        (".norm1_context.linear", ".txt_mod.1"),
        (".ff.net.0.proj", ".img_mlp.net.0.proj"),
        (".ff.net.2", ".img_mlp.net.2"),
        (".ff_context.net.0.proj", ".txt_mlp.net.0.proj"),
        (".ff_context.net.2", ".txt_mlp.net.2"),
    ]
    out = {}
    for k, v in state.items():
        nk = k
        for flux_name, qwen_name in inv:
            nk = nk.replace(flux_name, qwen_name)
        if nk.startswith("x_embedder."):
            nk = "img_in." + nk[len("x_embedder."):]
        elif nk.startswith("context_embedder."):
            nk = "txt_in." + nk[len("context_embedder."):]
        out[nk] = v
    return out


def _assert_trees_equal(params, back):
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {tuple(str(k) for k in p) for p, _ in flat_a}
    paths_b = {tuple(str(k) for k in p) for p, _ in flat_b}
    assert paths_a == paths_b, paths_a ^ paths_b
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(va, np.float32),
                                   np.asarray(vb, np.float32),
                                   rtol=1e-6, atol=1e-6, err_msg=str(pa))


def _tiny_step1x_cfg():
    """tiny preset + a connector, i.e. the full Step1X architecture shape."""
    return get_config("tiny-step1x")


def test_step1x_connector_roundtrip():
    """Full Step1X-architecture checkpoint (connector + step1x top-level
    naming: time_embed/vec_embed) converts with zero unmapped tensors,
    matches the init tree exactly, and runs a forward — the VERDICT r2
    missing item #1 (reference invocation
    RegionE/Step1XEdit/inplace.py:514-521)."""
    from regione_tpu.weights.convert import (
        is_step1x_state, normalize_step1x_keys)

    cfg = _tiny_step1x_cfg()
    params = init_mmdit(jax.random.PRNGKey(1), cfg)
    state = synth_state_from_params(params, cfg)
    state.update(synth_connector_state(params["connector"], cfg.connector))
    # re-key top-level embeds to the Step1X transformer naming
    s1x = to_step1x_naming(state)
    assert is_step1x_state(s1x)
    back = convert_flux_transformer(normalize_step1x_keys(s1x), cfg)
    _assert_trees_equal(params, back)

    # converted tree runs end-to-end (connector consumed in the forward)
    rng = np.random.default_rng(2)
    from regione_tpu.pipelines.base import EditPipelineBase
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    back_j = jax.tree.map(jnp.asarray, back)
    pipe = EditPipelineBase(cfg, back_j, RegionEParams(),
                            gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(4, 4, 4)
    v, _ = mmdit_forward(
        back_j, cfg,
        jnp.asarray(rng.standard_normal((1, 32, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)), jnp.float32),
        jnp.full((1,), 0.5), rope_img, rope_txt, mode=MODE_DENSE)
    assert v.shape == (1, 32, cfg.out_channels)
    assert np.isfinite(np.asarray(v, np.float32)).all()


def test_converter_rejects_unconsumed_tensors():
    """A stray tensor (wrong preset / renamed key) must raise, not be
    silently dropped (TrackingState zero-unconsumed assert)."""
    import pytest
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    state = synth_state_from_params(params, cfg)
    state["transformer_blocks.0.attn.to_q_extra.weight"] = np.zeros((4, 4),
                                                                    np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_flux_transformer(state, cfg)

    # connector-bearing preset missing its connector tensors -> KeyError
    # (required tensors absent), never a silent partial tree
    ccfg = _tiny_step1x_cfg()
    cparams = init_mmdit(jax.random.PRNGKey(0), ccfg)
    cstate = synth_state_from_params(cparams, ccfg)  # no connector.* keys
    with pytest.raises(KeyError):
        convert_flux_transformer(cstate, ccfg)


def test_qwen_key_alias_roundtrip():
    """Qwen-Image-Edit native key naming (img_mod/txt_mod/img_mlp/...) ->
    normalize_qwen_keys -> converter reproduces the init tree exactly
    (VERDICT r2: the Qwen alias mapping previously had no roundtrip)."""
    from regione_tpu.weights.convert import normalize_qwen_keys

    cfg = get_config("tiny-qwen")
    params = init_mmdit(jax.random.PRNGKey(5), cfg)
    state = synth_state_from_params(params, cfg)

    # re-key to the Qwen checkpoint naming (inverse of QWEN_ALIASES)
    qstate = to_qwen_naming(state)
    assert any(".img_mod." in k for k in qstate) and "img_in.weight" in qstate

    back = convert_flux_transformer(normalize_qwen_keys(qstate), cfg)
    _assert_trees_equal(params, back)


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


def synth_vae_state(params):
    """Inverse mapping: our VAE pytree -> torch-layout flat state dict."""
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
    return state


def test_vae_converter_roundtrip():
    """Synthetic diffusers AutoencoderKL state dict -> our VAE pytree:
    every tensor mapped, transposed correctly, and the tree runs."""
    from regione_tpu.models import vae as V
    from regione_tpu.weights.convert import convert_vae

    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    params = V.init_vae(jax.random.PRNGKey(0), vae_cfg)
    state = synth_vae_state(params)

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


def test_load_converted_from_disk_skips_text_encoder(tmp_path):
    """load_converted end-to-end from a real on-disk HF checkpoint layout
    (safetensors transformer + vae + config.json), with
    load_text_encoder=False: the text_encoder dir must not be touched (the
    offline converter previously eagerly loaded the multi-GB encoder it
    discards) and the trees must come back complete."""
    import json
    from safetensors.numpy import save_file
    from regione_tpu.models import vae as V
    from regione_tpu.models.text_encoders import MockTextEncoder
    from regione_tpu.weights.convert import load_converted

    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    state = synth_state_from_params(params, cfg)
    (tmp_path / "transformer").mkdir()
    save_file({k: np.asarray(v, np.float32) for k, v in state.items()},
              str(tmp_path / "transformer" / "model.safetensors"))

    vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                          norm_num_groups=4, layers_per_block=1)
    vparams = V.init_vae(jax.random.PRNGKey(1), vae_cfg)
    (tmp_path / "vae").mkdir()
    save_file({k: np.asarray(v, np.float32)
               for k, v in synth_vae_state(vparams).items()},
              str(tmp_path / "vae" / "model.safetensors"))
    json.dump({"latent_channels": 2, "block_out_channels": [8, 16],
               "layers_per_block": 1, "norm_num_groups": 4,
               "scaling_factor": 0.3611, "shift_factor": 0.1159},
              open(tmp_path / "vae" / "config.json", "w"))

    # a text_encoder dir that would fail any from_pretrained attempt
    (tmp_path / "text_encoder").mkdir()
    (tmp_path / "text_encoder" / "config.json").write_text("not json {")

    dit, vcfg, vae_params, enc = load_converted(
        str(tmp_path), cfg, load_text_encoder=False)
    assert isinstance(enc, MockTextEncoder)
    assert vcfg.latent_channels == 2

    # same structure as the init tree, values bf16-cast
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(dit)[0]
    assert ({tuple(str(k) for k in p) for p, _ in flat_a}
            == {tuple(str(k) for k in p) for p, _ in flat_b})
    for (pa, va), (_, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                 sorted(flat_b, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(va, np.float32),
                                   np.asarray(vb, np.float32),
                                   rtol=1e-2, atol=1e-2, err_msg=str(pa))
