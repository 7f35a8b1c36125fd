"""Per-step-kind timing decomposition of the RegionE path.

Times each jitted step kind in isolation (dense, dense+cache-write, rags
at the given capacity, closed-form reuse) so the end-to-end ratio can be
reconciled against a per-step budget: ratio ~= 28*t_dense / (n_dense*
t_dense + n_refresh*t_write + n_rags*t_rags + eps).

Usage:
  python scripts/profile_steps.py --preset step1x-edit:dev --grid 64
  python scripts/profile_steps.py --preset step1x-edit --grid 44 --int8 \
      --cache-int8
  python scripts/profile_steps.py --preset qwen-image-edit --grid 48 \
      --t-txt 512 --int4 --cache-int8 --cap 640   # the FULLSIZE_QWEN60_768 row

Step counts in the budget come from the preset's ACTUAL StepPlan (backend
gamma + defaults), so the estimate is per-backend exact — e.g. the Qwen
gamma admits only 5 AVD reuses (14 rags computes) vs Step1X's 14.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="step1x-edit:dev")
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--t-txt", type=int, default=128)
    ap.add_argument("--cap", type=int, default=None,
                    help="RAGS capacity (default: quarter of grid^2)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="nibble-packed int4 weights (+int4 mods), the "
                         "single-chip 20B format")
    ap.add_argument("--cache-int8", action="store_true")
    ap.add_argument("--cache-int4", action="store_true",
                    help="nibble-packed int4 KV cache (S-halves packing; "
                         "the 20B-Qwen@1024^2 single-chip format)")
    ap.add_argument("--act-int8", action="store_true",
                    help="W8A8: dynamic activation quant onto the int8 MXU")
    ap.add_argument("--blocks", type=int, default=None,
                    help="override depth_double (e.g. the 36-block "
                         "single-chip Qwen config)")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    # jitted scalar readback: eager int8->f32 convert is rejected by the
    # remote backend, and block_until_ready can return early on it
    _sum = jax.jit(lambda l: jnp.sum(l.astype(jnp.float32)))

    def sync(x):
        return float(_sum(jax.tree.leaves(x)[0]))

    def timeit(fn, *a, n=args.runs):
        out = fn(*a)
        sync(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    def timeit_threaded(fn, state, n=args.runs):
        """For donated-argument programs: each call consumes the previous
        call's output, so exactly one buffer set stays live.  fn returns
        (v, state); completion is read back through the small f32 v (the
        remote backend rejects eager reductions over the big int8 cache)."""
        v, state = fn(state)
        sync(v)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            v, state = fn(state)
            sync(v)
            ts.append(time.perf_counter() - t0)
        return min(ts), state

    from regione_tpu.core.config import DEFAULT_PARAMS, RegionEParams
    from regione_tpu.models.mmdit import init_cache, init_mmdit_jit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import init_quantized
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.flux_kontext import FluxKontextPipeline
    from regione_tpu.pipelines.qwen_image_edit import (
        QwenImageEditPipeline, QwenImageEditPlusPipeline)
    from regione_tpu.pipelines.step1x_edit import (
        Step1XEditPipeline, Step1XEditV1P2Pipeline)

    GRID, T_TXT = args.grid, args.t_txt
    cfg = get_config(args.preset)
    if args.cache_int8:
        cfg = dataclasses.replace(cfg, cache_int8=True)
    if args.cache_int4:
        cfg = dataclasses.replace(cfg, cache_int4=True)
    if args.blocks is not None:
        cfg = dataclasses.replace(cfg, depth_double=args.blocks)
    if args.act_int8:
        cfg = dataclasses.replace(cfg, act_int8=True)
        assert args.int8, "--act-int8 requires --int8 weights"
    if args.int4:
        params = init_quantized(jax.random.PRNGKey(0), cfg, bits=4,
                                quantize_mods=True, int4_mods=True)
    elif args.int8:
        params = init_quantized(jax.random.PRNGKey(0), cfg,
                                quantize_mods=True)
    else:
        params = init_mmdit_jit(jax.random.PRNGKey(0), cfg)
    backend = args.preset.split(":")[0]
    re = DEFAULT_PARAMS.get(backend,
                            RegionEParams().replace(threshold=0.88,
                                                    cache_threshold=0.02))
    # full backend table: the pipeline class selects the gamma table that
    # drives build_stage_plan, so a fallback here would silently profile
    # with the wrong plan (Step1X admits ~14 AVD reuses vs Qwen's ~5)
    pipe_cls = {"step1x-edit": Step1XEditPipeline,
                "step1x-edit-v1p2": Step1XEditV1P2Pipeline,
                "flux-kontext": FluxKontextPipeline,
                "qwen-image-edit": QwenImageEditPipeline,
                "qwen-image-edit-plus": QwenImageEditPlusPipeline}
    if backend not in pipe_cls:
        raise SystemExit(f"unknown backend {backend!r}; expected one of "
                         f"{sorted(pipe_cls)} (tiny-* presets: pass the "
                         "matching backend preset instead)")
    pipe = pipe_cls[backend](cfg, params, re)

    rng = np.random.default_rng(0)
    s = GRID * GRID
    cap = args.cap or max(64, (s // 4 + 127) // 128 * 128)
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    lat = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)
    ctx = EditInputs(
        txt=jnp.asarray(rng.standard_normal((2, T_TXT, cfg.txt_in_dim)),
                        cfg.dtype),
        cond_latent=jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                                jnp.float32),
        rope_img=rope_img, rope_txt=rope_txt,
        pooled=(jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)),
                            cfg.dtype) if cfg.pooled_dim else None),
        guidance=(jnp.full((2,), 2.5, jnp.float32)
                  if cfg.guidance_embed else None),
        extra={"params": params, "s_noise": s},
    )
    cache = init_cache(cfg, 2, 2 * s, T_TXT)
    ids = jnp.arange(cap, dtype=jnp.int32)
    lat_act = jnp.asarray(rng.standard_normal((1, cap, cfg.in_channels)),
                          jnp.float32)
    sigma = jnp.float32(0.7)

    # donate the cache into each program so only ONE cache set is resident
    # (params 11.5 GiB + 2 cache copies OOMs the 16 GB chip at full size)
    dense = jax.jit(lambda l, c: pipe.dense_forward(l, sigma, None, c, False)[0])
    write = jax.jit(lambda l, ca, c: pipe.dense_forward(l, sigma, ca, c, True),
                    donate_argnums=(1,))
    # rags reads the cache frozen (returned unchanged) — donation still lets
    # XLA alias it through instead of holding a second copy
    rags = jax.jit(lambda la, ca, i, c: pipe.rags_forward(la, sigma, ca, i, c),
                   donate_argnums=(1,))

    print(f"[profile] {args.preset} grid={GRID} cap={cap} "
          f"int8={args.int8} cache_int8={args.cache_int8} "
          f"cache_int4={args.cache_int4} "
          f"act_int8={args.act_int8}", file=sys.stderr)
    t_dense, _ = timeit(dense, lat, ctx)
    print(f"[profile] dense forward          {t_dense*1e3:9.1f} ms",
          file=sys.stderr)

    t_write, cache = timeit_threaded(
        lambda ca: write(lat, ca, ctx), cache, n=2)
    print(f"[profile] dense + cache write    {t_write*1e3:9.1f} ms",
          file=sys.stderr)

    t_rags, cache = timeit_threaded(
        lambda ca: rags(lat_act, ca, ids, ctx), cache)
    print(f"[profile] rags forward (cap={cap}) {t_rags*1e3:7.1f} ms",
          file=sys.stderr)

    # per-step budget from the preset's ACTUAL plan (backend gamma decides
    # the AVD reuse/rags split; core/schedule.py)
    plan = pipe.sampler_for(GRID, GRID, T_TXT, batch_cache=2).plan
    n_write = sum(1 for sp in plan if sp.kv_phase == "cache_write")
    n_reuse = sum(1 for sp in plan if sp.reuse)
    n_rags = sum(1 for sp in plan if sp.is_rags and not sp.reuse)
    n_dense = sum(1 for sp in plan
                  if sp.dense and sp.kv_phase != "cache_write")
    steps = len(plan)
    assert n_dense + n_write + n_rags + n_reuse == steps, (
        n_dense, n_write, n_rags, n_reuse, steps)
    est = n_dense * t_dense + n_write * t_write + n_rags * t_rags
    full = steps * t_dense
    print(json.dumps({
        "preset": args.preset,
        "dense_ms": round(t_dense * 1e3, 1),
        "write_ms": round(t_write * 1e3, 1),
        "rags_ms": round(t_rags * 1e3, 1),
        "rags_over_dense": round(t_rags / t_dense, 3),
        "plan_counts": {"dense": n_dense, "write": n_write,
                        "rags": n_rags, "reuse": n_reuse},
        "est_regione_s": round(est, 3),
        "est_dense_s": round(full, 3),
        "est_ratio": round(full / est, 3),
    }))


if __name__ == "__main__":
    main()
