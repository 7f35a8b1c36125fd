"""Multi-chip sharding: device mesh + parameter partition specs.

The reference has no distributed code at all (SURVEY.md §2.2) — this is the
TPU-native capability extension: Megatron-style tensor parallelism of the
MMDiT over the ICI mesh axis "tp" plus batch/data parallelism over "dp",
expressed as GSPMD sharding constraints (`jax.sharding.NamedSharding`) so
XLA inserts the all-reduces itself; no hand-written collectives.

TP layout (per block, weights are [L, d_in, d_out] stacked on layers):
  * qkv / mlp-in / fused linear1   : shard d_out  -> heads & mlp split
  * attn-out / mlp-out / linear2   : shard d_in   -> psum at output
  * modulations, norms, embedders  : replicated (tiny)
KV caches shard on the feature (heads*head_dim) axis; latents on batch.

The 20B Qwen backbone (~40 GB bf16) needs tp>=4 on v5e (16 GB HBM/chip) —
SURVEY.md §7.3.8.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """Create a (dp, tp) mesh over the first n devices.  dp defaults to 1
    (editing is batch-1/2 work; tp is where the win is)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    dp = dp or 1
    assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
    mesh_devs = mesh_utils.create_device_mesh((dp, n // dp), devices=devs[:n])
    return Mesh(mesh_devs, axis_names=("dp", "tp"))


# (regex over '/'-joined param path) -> PartitionSpec for stacked [L, i, o]
# or flat [i, o] weights.  First match wins; default replicated.
# `w_q`/`scale` are the int8 forms (ops.quant): w_q has the same [.., i, o]
# layout as w; scale is per-output-channel [.., 1, o], so it shards with
# the OUTPUT axis for column-parallel layers and stays replicated for
# row-parallel ones (their outputs are full-width partial sums).
#
# `w_qp`/`scale4` are the nibble-packed int4 forms (ops.quant): w_qp is
# [.., in/2, out] and scale4 [.., G, out].  Column-parallel layers shard
# both on the OUT axis (same as w_q/scale).  Row-parallel layers shard
# only w_qp on the packed-row axis; scale4 stays replicated because its
# group axis follows WHOLE-TENSOR group order (the first G/2 groups scale
# the lo-nibble input half, the last G/2 the hi half — ops.quant
# quantize_linear4), so a packed-row shard boundary does not land on a
# whole-group boundary in that order; and at ~w/128 bytes the leaf is too
# small to matter (GSPMD slices it locally).  int4 exists for single-chip
# FIT; TP rows run int8.
_RULES: list[tuple[str, P]] = [
    # column-parallel (shard output features)
    (r"(img_attn|txt_attn)/(q|k|v)/(w|w_q|scale|w_qp|scale4)$",
     P(None, None, "tp")),
    (r"(img_mlp|txt_mlp)/in/(w|w_q|scale|w_qp|scale4)$", P(None, None, "tp")),
    (r"linear1/(w|w_q|scale|w_qp|scale4)$", P(None, None, "tp")),
    (r"(img_attn|txt_attn)/(q|k|v)/b$", P(None, "tp")),
    (r"(img_mlp|txt_mlp)/in/b$", P(None, "tp")),
    (r"linear1/b$", P(None, "tp")),
    # row-parallel (shard input features; XLA psums the partial outputs)
    (r"(img_attn|txt_attn)/out/(w|w_q|w_qp)$", P(None, "tp", None)),
    (r"(img_mlp|txt_mlp)/out/(w|w_q|w_qp)$", P(None, "tp", None)),
    (r"linear2/(w|w_q|w_qp)$", P(None, "tp", None)),
    # connector (Step1X): its blocks use the same col/row split
    (r"connector/.*/(q|k|v)/(w|w_q|scale)$", P(None, None, "tp")),
    (r"connector/.*/mlp/in/(w|w_q|scale)$", P(None, None, "tp")),
    (r"connector/.*/(q|k|v|mlp/in)/b$", P(None, "tp")),
    (r"connector/.*/(out|mlp/out)/(w|w_q)$", P(None, "tp", None)),
    # modulation projections: h -> 6h (double) / 3h (single).  The WEIGHT is
    # among the largest leaves of the model (6.3 GiB per Qwen mod stack in
    # bf16) but the OUTPUT is a tiny per-image vector [B, 6h], so column-
    # parallel sharding costs one negligible all-gather per block and must
    # not be left replicated (VERDICT r1: no accidental replication of
    # multi-GB leaves).
    (r"(img_mod|txt_mod|mod)/(w|w_q|scale)$", P(None, None, "tp")),
    (r"(img_mod|txt_mod|mod)/b$", P(None, "tp")),
]


def _spec_for(path: str, ndim: int) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path):
            if len(spec) == ndim:
                return spec
            if len(spec) == ndim + 1:  # unstacked variant of a stacked rule
                return P(*spec[1:])
    return P()  # replicated


def param_specs(params) -> Any:
    """PartitionSpec pytree matching the param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        specs.append(_spec_for(p, leaf.ndim))
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with TP shardings over the mesh."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def cache_specs(cache, dp: int | None = None) -> Any:
    """Head-major KV caches: [L, B, H, S, dh] K/V shard the head axis on
    tp and batch on dp; [L, B, H, S] int8 scale leaves likewise.  A batch
    axis that dp cannot divide stays replicated — batch 1 always (the
    guidance-distilled FLUX runs a single forward), and any other
    indivisible batch when the mesh's dp size is passed (e.g. the CFG
    pair of 2 on a dp=4 mesh)."""
    def spec(x):
        b_sz = x.shape[1]
        b = "dp" if b_sz > 1 and (dp is None or b_sz % dp == 0) else None
        return (P(None, b, "tp", None, None) if x.ndim == 5
                else P(None, b, "tp", None))
    return jax.tree.map(spec, cache)


def latent_spec() -> P:
    return P("dp", None, None)
