"""HBM memory planning for the big backbones on small TPU slices.

The reference never has to plan memory — its backbones run on large-HBM
GPUs and there is no distributed code (SURVEY.md §2.2).  On v5e (16 GB
HBM/chip) the 12B Step1X/FLUX and 20B Qwen backbones only fit with int8
weights and/or tensor parallelism, and the Region-Instruction KV cache is
a first-class tenant (57 block caches at full Step1X scale outweigh the
int8 weights).  This module computes exact per-device byte budgets from
the preset shapes WITHOUT allocating anything (jax.eval_shape), honoring
the TP sharding rules in regione_tpu.parallel.sharding.

CLI:  python -m regione_tpu.utils.memplan --preset qwen-image-edit \
          --grid 64 --t-txt 512 --tp 4 --int8
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np


HBM_BYTES = {"v5e": 16 * 1024**3, "v5p": 95 * 1024**3, "v4": 32 * 1024**3}


@dataclasses.dataclass
class MemPlan:
    preset: str
    tp: int
    int8: bool
    bits: int
    grid: int
    t_txt: int
    batch_cfg: int
    param_bytes_per_device: int
    cache_bytes_per_device: int
    activation_bytes_est: int
    total_bytes_per_device: int
    params_total: int
    sharded_leaves: int
    replicated_big_leaves: list  # (path, MiB) of replicated leaves > 64 MiB

    def fits(self, hbm: int | str = "v5e", reserve_frac: float = 0.08) -> bool:
        budget = HBM_BYTES.get(hbm, hbm) if isinstance(hbm, str) else hbm
        return self.total_bytes_per_device <= budget * (1 - reserve_frac)

    def as_dict(self):
        d = dataclasses.asdict(self)
        for k in ("param_bytes_per_device", "cache_bytes_per_device",
                  "activation_bytes_est", "total_bytes_per_device"):
            d[k + "_gib"] = round(d[k] / 1024**3, 3)
        return d


def _leaf_bytes(leaf) -> int:
    return int(np.prod(leaf.shape)) * jax.dtypes.canonicalize_dtype(
        leaf.dtype).itemsize


def plan(preset: str, grid: int = 64, t_txt: int = 512, tp: int = 1,
         int8: bool = False, batch_cfg: int | None = None,
         cache_dtype=None, quantize_mods: bool = False,
         bits: int = 8, int4_mods: bool = False,
         cache_bits: int = 8) -> MemPlan:
    """Exact param/cache byte budget per device for `preset` at a given
    token geometry, int8 and TP setting.  Activations are an estimate
    (dominant live set of one dense forward at bf16)."""
    import jax.numpy as jnp

    from regione_tpu.models.mmdit import init_cache, init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import quantize_params
    from regione_tpu.parallel.sharding import param_specs

    cfg = preset if not isinstance(preset, str) else get_config(preset)
    preset = getattr(cfg, "name", None) or (
        preset if isinstance(preset, str) else "custom")
    if batch_cfg is None:
        # CFG batching: Step1X/FLUX/Qwen all run 2 guidance rows
        batch_cfg = 2
    s_noise = grid * grid
    s_kv = 2 * s_noise

    def build(key):
        p = init_mmdit(key, cfg)
        return (quantize_params(p, quantize_mods=quantize_mods, bits=bits,
                                int4_mods=int4_mods)
                if int8 else p)

    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    specs = param_specs(shapes)

    param_dev = 0
    params_total = 0
    sharded = 0
    big_replicated = []
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    sflat = jax.tree_util.tree_leaves(specs)
    for (path, leaf), spec in zip(flat, sflat):
        nbytes = _leaf_bytes(leaf)
        n = int(np.prod(leaf.shape))
        if str(getattr(path[-1], "key", path[-1])) == "w_qp":
            n *= 2  # nibble-packed: two weights per stored byte
        params_total += n
        div = tp if any(ax == "tp" for ax in spec) else 1
        param_dev += nbytes // div
        if div > 1:
            sharded += 1
        elif nbytes > 64 * 1024**2 and tp > 1:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            big_replicated.append((p, round(nbytes / 1024**2, 1)))

    if cache_dtype == jnp.int8 and cache_bits == 4:
        cache_cfg = dataclasses.replace(cfg, cache_int8=False,
                                        cache_int4=True)
    elif cache_dtype == jnp.int8:
        cache_cfg = dataclasses.replace(cfg, cache_int8=True,
                                        cache_int4=False)
    else:
        cache_cfg = cfg
    cache_shapes = jax.eval_shape(
        lambda: init_cache(cache_cfg, batch_cfg, s_kv, t_txt,
                           dtype=cache_dtype or cfg.dtype))
    # caches shard the flattened head axis on tp (sharding.cache_specs)
    cache_dev = sum(_leaf_bytes(l) for l in jax.tree.leaves(cache_shapes))
    cache_dev //= tp

    # live activation estimate for one dense forward: img+txt streams and
    # the widest intermediate (mlp hidden or qkv) at bf16, x2 for
    # double-buffering/fusion slack
    act = (batch_cfg * (s_kv + t_txt) *
           max(cfg.mlp_hidden // tp, 3 * cfg.inner // tp, cfg.hidden) * 2) * 2

    total = param_dev + cache_dev + act
    return MemPlan(
        preset=preset, tp=tp, int8=int8, bits=bits if int8 else 16,
        grid=grid, t_txt=t_txt,
        batch_cfg=batch_cfg,
        param_bytes_per_device=int(param_dev),
        cache_bytes_per_device=int(cache_dev),
        activation_bytes_est=int(act),
        total_bytes_per_device=int(total),
        params_total=int(params_total),
        sharded_leaves=sharded,
        replicated_big_leaves=big_replicated,
    )


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", required=True)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--t-txt", type=int, default=512)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8),
                    help="weight quant width when --int8 is set (4 = "
                    "nibble-packed int4 for the big projections)")
    ap.add_argument("--int4-mods", action="store_true",
                    help="with --bits 4: pack modulation projections to "
                    "int4 too (needed for the 60-block Qwen single-chip)")
    ap.add_argument("--cache-int8", action="store_true",
                    help="budget the KV cache at int8 (+ f32 scales)")
    ap.add_argument("--cache-bits", type=int, default=8, choices=(4, 8),
                    help="4 budgets the nibble-packed int4 cache (the "
                    "20B-Qwen@1024px single-chip format); implies a "
                    "quantized cache even without --cache-int8")
    ap.add_argument("--quantize-mods", action="store_true")
    ap.add_argument("--batch-cfg", type=int, default=None)
    ap.add_argument("--hbm", default="v5e")
    args = ap.parse_args(argv)
    import jax.numpy as jnp
    p = plan(args.preset, grid=args.grid, t_txt=args.t_txt, tp=args.tp,
             int8=args.int8, batch_cfg=args.batch_cfg,
             quantize_mods=args.quantize_mods, bits=args.bits,
             int4_mods=args.int4_mods,
             cache_dtype=(jnp.int8 if (args.cache_int8 or
                                       args.cache_bits == 4) else None),
             cache_bits=args.cache_bits)
    out = p.as_dict()
    out["fits_" + args.hbm] = p.fits(args.hbm)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
