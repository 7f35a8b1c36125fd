"""Per-step-kind timing decomposition of the RegionE path.

Times each jitted step kind in isolation (dense, dense+cache-write, rags
at the given capacity, closed-form reuse) so the end-to-end ratio can be
reconciled against a per-step budget: ratio ~= 28*t_dense / (n_dense*
t_dense + n_refresh*t_write + n_rags*t_rags + eps).

Usage:
  python scripts/profile_steps.py --preset step1x-edit:dev --grid 64
  python scripts/profile_steps.py --preset step1x-edit --grid 44 --int8 \
      --cache-int8
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
    ap.add_argument("--cache-int8", action="store_true")
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

    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models.mmdit import init_cache, init_mmdit_jit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import init_quantized
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline

    GRID, T_TXT = args.grid, args.t_txt
    cfg = get_config(args.preset)
    if args.cache_int8:
        cfg = dataclasses.replace(cfg, cache_int8=True)
    if args.blocks is not None:
        cfg = dataclasses.replace(cfg, depth_double=args.blocks)
    if args.act_int8:
        cfg = dataclasses.replace(cfg, act_int8=True)
        assert args.int8, "--act-int8 requires --int8 weights"
    params = (init_quantized(jax.random.PRNGKey(0), cfg, quantize_mods=True)
              if args.int8 else init_mmdit_jit(jax.random.PRNGKey(0), cfg))
    re = RegionEParams().replace(threshold=0.88, cache_threshold=0.02)
    pipe = Step1XEditPipeline(cfg, params, re)

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
        pooled=jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)),
                           cfg.dtype),
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

    # theoretical per-step budget at the default 28-step plan:
    # 5 warm dense + 1 partition write + 1 refresh write + 2 SMS dense,
    # 14 reuse (free), 5 rags computes  (defaults: warmup 6, post 2,
    # refresh [16]); see core/schedule.py
    n_dense, n_write, n_rags = 7, 2, 5
    est = n_dense * t_dense + n_write * t_write + n_rags * t_rags
    full = 28 * t_dense
    print(json.dumps({
        "dense_ms": round(t_dense * 1e3, 1),
        "write_ms": round(t_write * 1e3, 1),
        "rags_ms": round(t_rags * 1e3, 1),
        "rags_over_dense": round(t_rags / t_dense, 3),
        "est_regione_s": round(est, 3),
        "est_dense_s": round(full, 3),
        "est_ratio": round(full / est, 3),
    }))


if __name__ == "__main__":
    main()
