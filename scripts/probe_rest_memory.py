"""Fast probe: AOT-compile the sampler's _rest segment at a given scale
(abstract args — no weights materialized) and print XLA's TPU memory
analysis.  Used to iterate on eliminating the full-cache while-loop entry
copy that blocks the 12B-class single-chip RegionE path.

NOTE: since the four-segment split, _rest covers RAGS runs + refresh
split-steps only (the warm scan and SMS tail live in their own cache-free
programs), so this probes the peak-pressure cache-carrying program.

python scripts/probe_rest_memory.py --dd 11 --ds 22 [--cache-int8] [--no-donate]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dd", type=int, default=11)
    ap.add_argument("--ds", type=int, default=22)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--t-txt", type=int, default=640)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--cache-int8", action="store_true")
    ap.add_argument("--cache-int4", action="store_true",
                    help="nibble-packed int4 KV cache (S-halves packing)")
    ap.add_argument("--int4", action="store_true",
                    help="int4 weights incl. modulations (the 20B-Qwen "
                         "single-chip format)")
    ap.add_argument("--act-int8", action="store_true")
    ap.add_argument("--preset", default="step1x-edit",
                    choices=["step1x-edit", "qwen-image-edit"],
                    help="model topology; qwen probes the joint-block "
                         "_rest program (the 1024^2 int4 config)")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--auto-layout", action="store_true",
                    help="compile with Format(Layout.AUTO) entry layouts "
                         "(XLA picks param layouts; probes whether the "
                         "684 MB stacked-int8-weight relayout temps vanish)")
    ap.add_argument("--count-remat", action="store_true",
                    help="also count .remat_compressed / .remat_uncompressed "
                         "fusion names in the compiled HLO (slow: renders "
                         "the full program text once).  Combine with "
                         "$REGIONE_COMPILER_OPTIONS to A/B remat flags "
                         "compile-only before paying for a full-size run")
    ap.add_argument("--auto-layout-paths", default=None,
                    help="regex over param paths: ONLY matching leaves get "
                         "Format(Layout.AUTO) entry layouts, everything "
                         "else stays default (NOTES_ROUND3 item 3's untried "
                         "per-argument pinning — whole-program AUTO "
                         "exploded temps 1.49 -> 3.97 GiB).  E.g. "
                         "'attn/(q|k|v|out)/w_q' or 'single/linear[12]/w_q'")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models.mmdit import init_cache, init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import quantize_params
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline

    cfg = dataclasses.replace(
        get_config(args.preset), depth_double=args.dd,
        depth_single=args.ds, connector=None, cache_int8=args.cache_int8,
        cache_int4=args.cache_int4, act_int8=args.act_int8)
    GRID, T_TXT, CAP = args.grid, args.t_txt, args.cap
    s = GRID * GRID
    s_kv = 2 * s

    bits = 4 if args.int4 else 8
    pshapes = jax.eval_shape(
        lambda k: quantize_params(init_mmdit(k, cfg), quantize_mods=True,
                                  bits=bits, int4_mods=args.int4),
        jax.random.PRNGKey(0))
    abstract = lambda t: jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), t)
    params_abs = abstract(pshapes)

    pipe_cls = (QwenImageEditPipeline if args.preset.startswith("qwen")
                else Step1XEditPipeline)
    pipe = pipe_cls(cfg, None, RegionEParams())
    sampler = pipe.sampler_for(GRID, GRID, T_TXT, batch_cache=2)
    if args.no_donate:
        sampler._rest_jit = jax.jit(sampler._rest)
    if args.auto_layout:
        from jax.experimental.layout import Format, Layout
        sampler._rest_jit = jax.jit(
            sampler._rest, donate_argnums=() if args.no_donate else (0, 3),
            in_shardings=Format(Layout.AUTO),
            out_shardings=Format(Layout.AUTO))

    cache_abs = abstract(jax.eval_shape(
        lambda: init_cache(cfg, 2, s_kv, T_TXT)))
    rope_dim = sum(cfg.axes_dims)
    ctx_abs = EditInputs(
        txt=jax.ShapeDtypeStruct((2, T_TXT, cfg.txt_in_dim), cfg.dtype),
        cond_latent=jax.ShapeDtypeStruct((1, s, cfg.in_channels), jnp.float32),
        rope_img=(jax.ShapeDtypeStruct((s_kv, rope_dim), jnp.float32),) * 2,
        rope_txt=(jax.ShapeDtypeStruct((T_TXT, rope_dim), jnp.float32),) * 2,
        pooled=jax.ShapeDtypeStruct((2, cfg.pooled_dim), cfg.dtype),
        extra={"params": params_abs, "s_noise": s},
    )
    lat_abs = jax.ShapeDtypeStruct((1, s, cfg.in_channels), jnp.float32)
    ids_abs = jax.ShapeDtypeStruct((CAP,), jnp.int32)
    mask_abs = jax.ShapeDtypeStruct((s,), jnp.bool_)

    pinned = []
    if args.auto_layout_paths:
        import re as _re
        from jax.experimental.layout import Format, Layout

        def path_str(path):
            return "/".join(str(getattr(k, "key", k)) for k in path)

        def fmt_tree(tree, regex=None):
            flat, tdef = jax.tree_util.tree_flatten_with_path(tree)
            out = []
            for p, _ in flat:
                if regex is not None and _re.search(regex, path_str(p)):
                    pinned.append(path_str(p))
                    out.append(Format(Layout.AUTO))
                else:
                    out.append(Format())
            return jax.tree_util.tree_unflatten(tdef, out)

        params_fmt = fmt_tree(params_abs, args.auto_layout_paths)
        assert pinned, f"no param path matched {args.auto_layout_paths!r}"
        ctx_fmt = dataclasses.replace(
            fmt_tree(dataclasses.replace(ctx_abs, extra={})),
            extra={"params": params_fmt, "s_noise": Format()})
        sampler._rest_jit = jax.jit(
            sampler._rest,
            donate_argnums=() if args.no_donate else (0, 3),
            in_shardings=(Format(), Format(), Format(),
                          fmt_tree(cache_abs), ctx_fmt))

    t0 = time.perf_counter()
    compiled = sampler._rest_jit.lower(
        lat_abs, ids_abs, mask_abs, cache_abs, ctx_abs).compile()
    ma = compiled.memory_analysis()
    chosen = {}
    if pinned:
        # record XLA's chosen entry layouts for the pinned leaves so a
        # loader could device_put weights in that format up front
        flat_fmt, _ = jax.tree_util.tree_flatten_with_path(
            compiled.input_formats[0])
        for p, f in flat_fmt:
            ps = "/".join(str(getattr(k, "key", k)) for k in p)
            for want in pinned:
                if ps.endswith(want) or want in ps:
                    chosen[want] = str(getattr(f, "layout", f))
    remat = {}
    if args.count_remat:
        txt = compiled.as_text()
        remat = {
            "remat_compressed": txt.count(".remat_compressed"),
            "remat_uncompressed": txt.count(".remat_uncompressed"),
            "remat_plain": txt.count(".remat"),
        }
        del txt
    print(json.dumps({
        "preset": args.preset, "dd": args.dd, "ds": args.ds,
        "grid": args.grid, "t_txt": args.t_txt, "cap": args.cap,
        "bits": 4 if args.int4 else 8, "cache_int8": args.cache_int8,
        "cache_int4": args.cache_int4,
        "donate": not args.no_donate,
        **remat,
        **({"compiler_options": os.environ["REGIONE_COMPILER_OPTIONS"]}
           if os.environ.get("REGIONE_COMPILER_OPTIONS") else {}),
        **({"pinned_auto_layout": pinned,
            "chosen_layouts": chosen} if pinned else {}),
        "compile_s": round(time.perf_counter() - t0, 1),
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
        "peak_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 2**30, 3),
    }))


if __name__ == "__main__":
    main()
