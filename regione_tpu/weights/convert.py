"""HF checkpoint (torch safetensors) -> RegionE-TPU parameter pytrees.

The reference loads models with diffusers `from_pretrained` (SURVEY.md §5
checkpoint row).  Here weights are converted once, offline, into this
framework's stacked-layer functional pytrees:

  * torch Linear [out, in]  ->  {"w": [in, out], "b": [out]} (transposed)
  * per-layer block tensors ->  stacked on a leading layer axis (the depth
    runs under lax.scan, models/mmdit.py)
  * diffusers FluxTransformer2DModel naming (used by Step1X-Edit and
    FLUX.1 Kontext) is the primary mapping; Qwen-Image uses its own block
    naming, mapped by `QWEN_ALIASES`.

Key ordering facts encoded here (easy to get silently wrong):
  * AdaLN norm1.linear emits [shift, scale, gate] x2 — same order as
    models.mmdit._modulation consumes.
  * Final AdaLayerNormContinuous emits [scale, shift] (reversed!) — the
    converter swaps the two column halves so mmdit's (shift, scale) split
    is correct.
  * Flux single blocks keep separate to_q/to_k/to_v/proj_mlp in diffusers;
    we fuse them into linear1 = [q ‖ k ‖ v ‖ mlp] columns.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np


def _load_torch_state(model_dir: str) -> dict[str, np.ndarray]:
    """Load all *.safetensors under model_dir into numpy (no torch import
    needed for the usual case; falls back to torch .bin)."""
    model_dir = Path(model_dir)
    state: dict[str, np.ndarray] = {}
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for k in sf.keys():
                    state[k] = sf.get_tensor(k)
        return state
    bins = sorted(model_dir.glob("*.bin"))
    if bins:
        import torch
        for f in bins:
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                state[k] = v.float().numpy()
        return state
    raise FileNotFoundError(f"no safetensors/bin files in {model_dir}")


def _lin(state, prefix, dtype=np.float32):
    w = np.asarray(state[f"{prefix}.weight"], dtype)
    p = {"w": np.ascontiguousarray(w.T)}
    bkey = f"{prefix}.bias"
    p["b"] = (np.asarray(state[bkey], dtype) if bkey in state
              else np.zeros((w.shape[0],), dtype))
    return p


def _norm_scale(state, key, dtype=np.float32):
    return {"scale": np.asarray(state[key], dtype)}


def _stack(dicts: list[dict]) -> dict:
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *dicts)


def convert_connector(state: dict[str, np.ndarray], ccfg,
                      dtype=np.float32, prefix: str = "connector.") -> dict:
    """Step1X-Edit `Qwen2Connector` state dict -> models.connector pytree.

    The connector is the timestep-conditioned token refiner the reference
    invokes inside its patched transformer forward
    (RegionE/Step1XEdit/inplace.py:514-520).  Source naming (Step1X-Edit
    connector_edit.py, shipped inside the transformer checkpoint under
    `connector.*`):

      S.input_embedder                      -> in_proj
      S.t_embedder.mlp.{0,2}                -> t_embed.{in,out}
      S.c_embedder.linear_{1,2}             -> c_embed.{in,out}
      S.individual_token_refiner.blocks.{i}.
          norm1 / norm2 (affine LayerNorm)  -> norm1 / norm2 {scale,bias}
          self_attn_qkv (fused [3h, h])     -> attn.{q,k,v} (split rows)
          self_attn_proj                    -> attn.out
          mlp.fc1 / mlp.fc2                 -> mlp.{in,out}
          adaLN_modulation.1                -> mod
      global_proj_out                       -> global_proj
      scale_factor                          -> scale_factor
    """
    g = lambda p: _lin(state, prefix + p, dtype)
    h = ccfg.hidden

    def ln(p):
        return {"scale": np.asarray(state[f"{prefix}{p}.weight"], dtype),
                "bias": np.asarray(state[f"{prefix}{p}.bias"], dtype)}

    blocks = []
    for i in range(ccfg.depth):
        b = f"S.individual_token_refiner.blocks.{i}"
        qkv = g(f"{b}.self_attn_qkv")   # {"w": [h, 3h], "b": [3h]}
        blocks.append({
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "attn": {
                "q": {"w": qkv["w"][:, :h], "b": qkv["b"][:h]},
                "k": {"w": qkv["w"][:, h:2 * h], "b": qkv["b"][h:2 * h]},
                "v": {"w": qkv["w"][:, 2 * h:], "b": qkv["b"][2 * h:]},
                "out": g(f"{b}.self_attn_proj"),
            },
            "mlp": {"in": g(f"{b}.mlp.fc1"), "out": g(f"{b}.mlp.fc2")},
            "mod": g(f"{b}.adaLN_modulation.1"),
        })
    return {
        "in_proj": g("S.input_embedder"),
        "t_embed": {"in": g("S.t_embedder.mlp.0"),
                    "out": g("S.t_embedder.mlp.2")},
        "c_embed": {"in": g("S.c_embedder.linear_1"),
                    "out": g("S.c_embedder.linear_2")},
        "global_proj": g("global_proj_out"),
        "scale_factor": np.asarray(state[f"{prefix}scale_factor"],
                                   dtype).reshape(1),
        "blocks": _stack(blocks),
    }


# Step1X-Edit transformer top-level naming deltas vs FluxTransformer2DModel
# (observed in the reference's patched forward, inplace.py:514-521:
# `self.time_embed(self.time_proj(...))`, `self.vec_embed(y)`).
STEP1X_ALIASES: list[tuple[str, str]] = [
    (r"^time_embed\.", "time_text_embed.timestep_embedder."),
    (r"^vec_embed\.", "time_text_embed.text_embedder."),
]


def is_step1x_state(state: dict) -> bool:
    return any(k.startswith("connector.") or k.startswith("time_embed.")
               for k in state)


def normalize_step1x_keys(state: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        nk = k
        for pat, rep in STEP1X_ALIASES:
            nk = re.sub(pat, rep, nk)
        out[nk] = v
    return out


def convert_flux_transformer(state: dict[str, np.ndarray], cfg,
                             dtype=np.float32) -> dict:
    """diffusers FluxTransformer2DModel / Step1XEdit transformer state dict
    -> models.mmdit pytree.  Asserts every source tensor is consumed."""
    if not isinstance(state, TrackingState):
        state = TrackingState(state)
    g = lambda p: _lin(state, p, dtype)

    def mlp_embed(prefix):
        return {"in": g(f"{prefix}.linear_1"), "out": g(f"{prefix}.linear_2")}

    params = {
        "x_embedder": g("x_embedder"),
        "txt_in": g("context_embedder"),
    }
    if getattr(cfg, "txt_norm", False):
        params["txt_norm"] = _norm_scale(state, "txt_norm.weight", dtype)
    params.update({
        "time_in": mlp_embed("time_text_embed.timestep_embedder"),
        "final_proj": g("proj_out"),
    })
    if cfg.pooled_dim and "time_text_embed.text_embedder.linear_1.weight" in state:
        params["vector_in"] = mlp_embed("time_text_embed.text_embedder")
    if cfg.guidance_embed:
        params["guidance_in"] = mlp_embed("time_text_embed.guidance_embedder")

    # final AdaLayerNormContinuous emits [scale, shift]; swap to [shift, scale]
    fm = g("norm_out.linear")
    h = fm["w"].shape[1] // 2
    params["final_mod"] = {
        "w": np.concatenate([fm["w"][:, h:], fm["w"][:, :h]], 1),
        "b": np.concatenate([fm["b"][h:], fm["b"][:h]], 0),
    }

    doubles = []
    for i in range(cfg.depth_double):
        p = f"transformer_blocks.{i}"
        doubles.append({
            "img_mod": g(f"{p}.norm1.linear"),
            "txt_mod": g(f"{p}.norm1_context.linear"),
            "img_attn": {
                "q": g(f"{p}.attn.to_q"), "k": g(f"{p}.attn.to_k"),
                "v": g(f"{p}.attn.to_v"), "out": g(f"{p}.attn.to_out.0"),
                "norm_q": _norm_scale(state, f"{p}.attn.norm_q.weight", dtype),
                "norm_k": _norm_scale(state, f"{p}.attn.norm_k.weight", dtype),
            },
            "txt_attn": {
                "q": g(f"{p}.attn.add_q_proj"), "k": g(f"{p}.attn.add_k_proj"),
                "v": g(f"{p}.attn.add_v_proj"), "out": g(f"{p}.attn.to_add_out"),
                "norm_q": _norm_scale(state, f"{p}.attn.norm_added_q.weight", dtype),
                "norm_k": _norm_scale(state, f"{p}.attn.norm_added_k.weight", dtype),
            },
            "img_mlp": {"in": g(f"{p}.ff.net.0.proj"), "out": g(f"{p}.ff.net.2")},
            "txt_mlp": {"in": g(f"{p}.ff_context.net.0.proj"),
                        "out": g(f"{p}.ff_context.net.2")},
        })
    params["double"] = _stack(doubles)

    if cfg.depth_single:
        singles = []
        for i in range(cfg.depth_single):
            p = f"single_transformer_blocks.{i}"
            q, k, v = (g(f"{p}.attn.to_q"), g(f"{p}.attn.to_k"),
                       g(f"{p}.attn.to_v"))
            mlp = g(f"{p}.proj_mlp")
            singles.append({
                "mod": g(f"{p}.norm.linear"),
                "linear1": {
                    "w": np.concatenate([q["w"], k["w"], v["w"], mlp["w"]], 1),
                    "b": np.concatenate([q["b"], k["b"], v["b"], mlp["b"]], 0),
                },
                "linear2": g(f"{p}.proj_out"),
                "norm_q": _norm_scale(state, f"{p}.attn.norm_q.weight", dtype),
                "norm_k": _norm_scale(state, f"{p}.attn.norm_k.weight", dtype),
            })
        params["single"] = _stack(singles)

    if getattr(cfg, "connector", None) is not None:
        params["connector"] = convert_connector(state, cfg.connector, dtype)

    leftover = state.unconsumed()
    if leftover:
        raise ValueError(
            f"convert_flux_transformer: {len(leftover)} unmapped tensors, "
            f"e.g. {sorted(leftover)[:5]} — mapping incomplete or wrong "
            f"preset for this checkpoint")
    return params


# Qwen-Image block-tensor aliases -> flux-style names used above.  The Qwen
# MMDiT (QwenImageTransformer2DModel) is joint-double-stream only; its
# attention/MLP tensor roles line up one-to-one with the double block.
QWEN_ALIASES: list[tuple[str, str]] = [
    (r"\.img_mod\.1", ".norm1.linear"),
    (r"\.txt_mod\.1", ".norm1_context.linear"),
    (r"\.img_mlp\.net\.0\.proj", ".ff.net.0.proj"),
    (r"\.img_mlp\.net\.2", ".ff.net.2"),
    (r"\.txt_mlp\.net\.0\.proj", ".ff_context.net.0.proj"),
    (r"\.txt_mlp\.net\.2", ".ff_context.net.2"),
    (r"time_text_embed\.timestep_embedder", "time_text_embed.timestep_embedder"),
    (r"^img_in", "x_embedder"),
    (r"^txt_in", "context_embedder"),
]


def normalize_qwen_keys(state: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        nk = k
        for pat, rep in QWEN_ALIASES:
            nk = re.sub(pat, rep, nk)
        out[nk] = v
    return out


def convert_vae(state: dict[str, np.ndarray], vae_cfg, dtype=np.float32) -> dict:
    """diffusers AutoencoderKL state dict -> models.vae pytree.
    torch conv weight [out, in, kh, kw] -> [kh, kw, in, out].
    Asserts every source tensor is consumed — including quant/post_quant
    convs: the flux-family AutoencoderKL has none, so a checkpoint carrying
    them is a different architecture and is REJECTED (not silently dropped;
    see the error text below)."""
    if not isinstance(state, TrackingState):
        state = TrackingState(state)

    def conv(prefix):
        w = np.asarray(state[f"{prefix}.weight"], dtype)
        return {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "b": np.asarray(state[f"{prefix}.bias"], dtype)}

    def gn(prefix):
        return {"scale": np.asarray(state[f"{prefix}.weight"], dtype),
                "bias": np.asarray(state[f"{prefix}.bias"], dtype)}

    def resnet(prefix):
        p = {"norm1": gn(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
             "norm2": gn(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in state:
            p["shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    def attn(prefix):
        def lin(sub):
            w = np.asarray(state[f"{prefix}.{sub}.weight"], dtype)
            if w.ndim == 4:  # old 1x1-conv style
                w = w[:, :, 0, 0]
            return {"w": np.ascontiguousarray(w.T),
                    "b": np.asarray(state[f"{prefix}.{sub}.bias"], dtype)}
        return {"norm": gn(f"{prefix}.group_norm"), "q": lin("to_q"),
                "k": lin("to_k"), "v": lin("to_v"), "out": lin("to_out.0")}

    nlev = len(vae_cfg.block_out_channels)
    enc = {"conv_in": conv("encoder.conv_in"),
           "norm_out": gn("encoder.conv_norm_out"),
           "conv_out": conv("encoder.conv_out"),
           "mid": {"res1": resnet("encoder.mid_block.resnets.0"),
                   "attn": attn("encoder.mid_block.attentions.0"),
                   "res2": resnet("encoder.mid_block.resnets.1")},
           "down": []}
    for i in range(nlev):
        blk = {"resnets": [resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                           for j in range(vae_cfg.layers_per_block)]}
        dkey = f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"
        if dkey in state:
            blk["downsample"] = conv(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down"].append(blk)

    dec = {"conv_in": conv("decoder.conv_in"),
           "norm_out": gn("decoder.conv_norm_out"),
           "conv_out": conv("decoder.conv_out"),
           "mid": {"res1": resnet("decoder.mid_block.resnets.0"),
                   "attn": attn("decoder.mid_block.attentions.0"),
                   "res2": resnet("decoder.mid_block.resnets.1")},
           "up": []}
    for i in range(nlev):
        blk = {"resnets": [resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(vae_cfg.layers_per_block + 1)]}
        ukey = f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"
        if ukey in state:
            blk["upsample"] = conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up"].append(blk)
    leftover = state.unconsumed()
    if leftover:
        raise ValueError(
            f"convert_vae: {len(leftover)} unmapped tensors, e.g. "
            f"{sorted(leftover)[:5]} — the flux-family AutoencoderKL has no "
            f"quant/post_quant convs; a checkpoint that does needs them "
            f"modeled, not dropped")
    return {"encoder": enc, "decoder": dec}


class TrackingState(dict):
    """State-dict wrapper recording which source tensors were consumed, so
    conversions can assert zero unmapped tensors (a silent leftover tensor
    means a wrong or incomplete mapping)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed: set[str] = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def unconsumed(self, ignore_patterns: tuple[str, ...] = ()) -> list[str]:
        left = [k for k in self.keys() if k not in self.consumed]
        return [k for k in left
                if not any(re.search(p, k) for p in ignore_patterns)]


def _fold_causal3d(w: np.ndarray) -> np.ndarray:
    """WanCausalConv3d weight [out, in, kt, kh, kw] -> single-frame 2-D
    kernel [kh, kw, in, out].

    The causal conv pads the time axis with (kt-1) zeros IN FRONT
    (diffusers WanCausalConv3d._padding), so for a 1-frame input every tap
    except the LAST multiplies zero padding: the effective 2-D kernel is
    w[..., kt-1, :, :].  Proven vs a causal-conv3d oracle in
    tests/test_wan_vae.py."""
    assert w.ndim == 5, w.shape
    return np.ascontiguousarray(w[:, :, -1].transpose(2, 3, 1, 0))


def convert_wan_vae(state: dict[str, np.ndarray], cfg,
                    dtype=np.float32) -> dict:
    """diffusers AutoencoderKLWan state dict -> models.vae_wan pytree
    (single-frame 2-D fold; time_conv resample weights are intentionally
    unused — they only act on multi-frame video inputs).

    Block indices inside encoder.down_blocks / decoder.up_blocks are a
    single flattened ModuleList mixing residual and resample blocks; the
    walker classifies each index by its key signature instead of
    hard-coding the layout."""
    if not isinstance(state, TrackingState):
        state = TrackingState(state)

    def conv(prefix):
        w = np.asarray(state[f"{prefix}.weight"], dtype)
        if w.ndim == 5:
            w = _fold_causal3d(w)
        elif w.ndim == 4:  # plain Conv2d (resample convs)
            w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        return {"w": w, "b": np.asarray(state[f"{prefix}.bias"], dtype)}

    def rms(prefix):
        g = np.asarray(state[f"{prefix}.gamma"], dtype).reshape(-1)
        p = {"gamma": g}
        if f"{prefix}.bias" in state:
            p["bias"] = np.asarray(state[f"{prefix}.bias"], dtype).reshape(-1)
        return p

    def lin_from_conv(prefix):
        """1x1 Conv2d -> linear {"w": [in, out], "b"}."""
        w = np.asarray(state[f"{prefix}.weight"], dtype)
        w = w.reshape(w.shape[0], w.shape[1])  # [out, in]
        return {"w": np.ascontiguousarray(w.T),
                "b": np.asarray(state[f"{prefix}.bias"], dtype)}

    def resnet(prefix):
        p = {"norm1": rms(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
             "norm2": rms(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in state:
            p["shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    def attn(prefix):
        return {"norm": rms(f"{prefix}.norm"),
                "qkv": lin_from_conv(f"{prefix}.to_qkv"),
                "proj": lin_from_conv(f"{prefix}.proj")}

    def mid(prefix):
        return {"res1": resnet(f"{prefix}.resnets.0"),
                "attn": attn(f"{prefix}.attentions.0"),
                "res2": resnet(f"{prefix}.resnets.1")}

    def walk_levels(prefix, n_levels, n_res, resample_key):
        """Flattened ModuleList -> per-level {resnets, down/upsample}."""
        levels, idx = [], 0
        for _lvl in range(n_levels):
            blk = {"resnets": []}
            for _ in range(n_res):
                blk["resnets"].append(resnet(f"{prefix}.{idx}"))
                idx += 1
            if f"{prefix}.{idx}.resample.1.weight" in state:
                blk[resample_key] = conv(f"{prefix}.{idx}.resample.1")
                idx += 1
            levels.append(blk)
        return levels

    n_levels = len(cfg.dim_mult)
    enc = {
        "conv_in": conv("encoder.conv_in"),
        "down": walk_levels("encoder.down_blocks", n_levels,
                            cfg.num_res_blocks, "downsample"),
        "mid": mid("encoder.mid_block"),
        "norm_out": rms("encoder.norm_out"),
        "conv_out": conv("encoder.conv_out"),
        "quant_conv": conv("quant_conv"),
    }
    dec = {
        "post_quant_conv": conv("post_quant_conv"),
        "conv_in": conv("decoder.conv_in"),
        "mid": mid("decoder.mid_block"),
        "up": walk_levels("decoder.up_blocks", n_levels,
                          cfg.num_res_blocks + 1, "upsample"),
        "norm_out": rms("decoder.norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
    leftover = state.unconsumed(ignore_patterns=(r"\btime_conv\b",
                                                 r"\.time_conv\."))
    if leftover:
        raise ValueError(
            f"convert_wan_vae: {len(leftover)} unmapped tensors, e.g. "
            f"{leftover[:5]} — mapping incomplete or wrong checkpoint")
    return {"encoder": enc, "decoder": dec}


def is_wan_vae_state(state: dict) -> bool:
    return any(k.endswith("norm1.gamma") or k == "encoder.norm_out.gamma"
               for k in state)


def load_converted(model_path: str, cfg, backend: str | None = None,
                   load_text_encoder: bool = True):
    """Load a HF-layout checkpoint directory:
      <model_path>/transformer/*.safetensors
      <model_path>/vae/*.safetensors
      <model_path>/text_encoder/ (+processor/tokenizer subfolders)
    Returns (dit_params, vae_cfg, vae_params, text_encoder).

    When `backend` is given, the prompt encoder is the reference-matching
    per-backend recipe (chat template + prefix drop for the Qwen family,
    T5+CLIP for FLUX — text_encoders.encoder_from_checkpoint); otherwise
    the generic HFTextEncoder fallback."""
    import jax.numpy as jnp
    from regione_tpu.models.text_encoders import (
        HFTextEncoder, MockTextEncoder, encoder_from_checkpoint)
    from regione_tpu.models.vae import VAEConfig

    root = Path(model_path)
    state = _load_torch_state(root / "transformer")
    if any(k.startswith("img_in") or ".img_mod." in k for k in state):
        state = normalize_qwen_keys(state)
    if is_step1x_state(state):
        state = normalize_step1x_keys(state)
    params = convert_flux_transformer(state, cfg, np.float32)
    params = _tree_cast(params, jnp.bfloat16)

    vae_state = _load_torch_state(root / "vae")
    vcfg_file = root / "vae" / "config.json"
    c = json.load(open(vcfg_file)) if vcfg_file.exists() else {}
    if is_wan_vae_state(vae_state) or c.get("_class_name") == "AutoencoderKLWan":
        from regione_tpu.models.vae_wan import WanVAEConfig
        kw = {}
        if "latents_mean" in c:
            kw["latents_mean"] = tuple(c["latents_mean"])
            kw["latents_std"] = tuple(c["latents_std"])
        vae_cfg = WanVAEConfig(
            latent_channels=c.get("z_dim", 16),
            base_dim=c.get("base_dim", 96),
            dim_mult=tuple(c.get("dim_mult", (1, 2, 4, 4))),
            num_res_blocks=c.get("num_res_blocks", 2), **kw)
        vae_params = convert_wan_vae(vae_state, vae_cfg)
    else:
        vae_cfg = VAEConfig(
            latent_channels=c.get("latent_channels", 16),
            block_out_channels=tuple(
                c.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=c.get("layers_per_block", 2),
            norm_num_groups=c.get("norm_num_groups", 32),
            scaling_factor=c.get("scaling_factor", 0.3611),
            shift_factor=c.get("shift_factor", 0.1159) or 0.0,
        )
        vae_params = convert_vae(vae_state, vae_cfg)

    te_dir = root / "text_encoder"
    if not load_text_encoder:
        # offline conversion only needs the transformer/vae trees; skip the
        # multi-GB prompt-encoder load entirely
        encoder = MockTextEncoder(cfg.txt_in_dim, cfg.pooled_dim or None)
    elif backend is not None and te_dir.exists():
        encoder = encoder_from_checkpoint(root, backend)
    elif te_dir.exists():
        encoder = HFTextEncoder(str(te_dir))
    else:
        encoder = MockTextEncoder(cfg.txt_in_dim, cfg.pooled_dim or None)
    return params, vae_cfg, vae_params, encoder


def _tree_cast(tree, dtype):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


def main(argv=None):
    """Offline conversion CLI: HF checkpoint dir -> orbax pytree checkpoints.

    python -m regione_tpu.weights.convert --model_path <hf_dir> \
        --backend step1x-edit --out <dir>
    """
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--backend", default="step1x-edit")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from regione_tpu.models.presets import get_config
    from regione_tpu.weights import checkpoint

    cfg = get_config(args.backend)
    # the offline converter only saves transformer/vae trees; don't pay for
    # loading the multi-GB prompt encoder here (the runtime loading path,
    # cli.main build_pipeline, wires the per-backend recipe)
    params, vae_cfg, vae_params, _enc = load_converted(
        args.model_path, cfg, load_text_encoder=False)
    checkpoint.save(f"{args.out}/transformer", params)
    checkpoint.save(f"{args.out}/vae", vae_params)
    print(f"converted {args.backend} -> {args.out} "
          f"(vae latent_channels={vae_cfg.latent_channels})")


if __name__ == "__main__":
    main()
