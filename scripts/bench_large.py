"""Largest-fitting single-chip benchmark: block-identical Step1X topology.

NOTE: superseded for the full-model claim by scripts/bench_fullsize.py —
with the int8 KV cache the FULL 12.3B topology now runs on one v5e at
grid 44 (704px; FULLSIZE.json).  This script keeps the 1024px-grid
variant: the largest BLOCK-IDENTICAL config at the full 4096-token grid
is depth 11 double + 22 single at the full hidden=3072/heads=24 — every
block is byte-identical in shape to the production 12B model's, so
per-block step time extrapolates directly; only the block count is ~0.58x.

Usage:  python scripts/bench_large.py [--steps-only]
Prints one JSON line (same schema as bench.py plus topology fields).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[bench_large] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models.mmdit import init_mmdit, param_count
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import quantize_params, quantized_bytes
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline
    from regione_tpu.utils.memplan import plan

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dd", type=int, default=11, help="double depth")
    ap.add_argument("--ds", type=int, default=22, help="single depth")
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--cache-int8", action="store_true")
    args = ap.parse_args()

    GRID, T_TXT, SEED = args.grid, 640, 110
    cfg = dataclasses.replace(
        get_config("step1x-edit"), depth_double=args.dd,
        depth_single=args.ds, connector=None, cache_int8=args.cache_int8)

    mp = plan(cfg, grid=GRID, t_txt=T_TXT, int8=True, quantize_mods=True)
    log(f"plan: params {mp.params_total/1e9:.2f}B, "
        f"{mp.total_bytes_per_device/2**30:.2f} GiB predicted, "
        f"fits={mp.fits('v5e')}")

    def sync(x):
        return float(jnp.sum(x))

    # fused init+quantize in ONE program so the bf16 intermediates die
    # block-stack by block-stack instead of coexisting with the int8 copy
    log("init + quantize on device...")
    t0 = time.perf_counter()
    params = jax.jit(
        lambda k: quantize_params(init_mmdit(k, cfg), quantize_mods=True),
        static_argnums=())(jax.random.PRNGKey(0))
    sync(params["x_embedder"]["scale"])
    log(f"params ready in {time.perf_counter()-t0:.1f}s; "
        f"{quantized_bytes(params)/2**30:.2f} GiB on device")

    re = RegionEParams(threshold=0.88, cache_threshold=0.02)
    pipe = Step1XEditPipeline(cfg, params, re)

    rng = np.random.default_rng(SEED)
    s = GRID * GRID
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    lat0 = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((2, T_TXT, cfg.txt_in_dim)), cfg.dtype)
    pooled = jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)), cfg.dtype)

    def make_ctx(cond):
        return EditInputs(txt=txt, cond_latent=jnp.asarray(cond, jnp.float32),
                          rope_img=rope_img, rope_txt=rope_txt, pooled=pooled)

    # forced quarter mask (bring-up; the adaptive path is exercised by the
    # dev-scale driver bench — here the question is memory + speed at scale)
    q = GRID // 2
    block = np.zeros((GRID, GRID), bool)
    block[:q, :q] = True
    forced_mask = jnp.asarray(block.reshape(-1))
    cond = rng.standard_normal((1, s, cfg.in_channels))
    ctx = make_ctx(cond)

    log("dense 28-step compile+run...")
    t0 = time.perf_counter()
    out_dense = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0]
    sync(out_dense)
    log(f"  {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out_dense = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0]
        sync(out_dense)
        times.append(time.perf_counter() - t0)
    t_dense = min(times)
    log(f"dense: {t_dense:.2f}s")

    log("RegionE compile+run...")
    t0 = time.perf_counter()
    out_re, stats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                      forced_mask=forced_mask)
    sync(out_re)
    log(f"  {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out_re, stats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                          forced_mask=forced_mask)
        sync(out_re)
        times.append(time.perf_counter() - t0)
    t_re = min(times)

    a = np.asarray(out_dense, np.float64)
    b = np.asarray(out_re, np.float64)
    mse = float(np.mean((a - b) ** 2))
    peak = float(a.max() - a.min())
    psnr = 10 * np.log10(peak * peak / mse) if mse else float("inf")

    print(json.dumps({
        "metric": "large-scale (block-identical 12B topology) edit speedup",
        "value": round(t_dense / t_re, 4),
        "unit": "x",
        "vs_baseline": round(t_dense / t_re / 2.572, 4),
        "dense_s": round(t_dense, 3),
        "regione_s": round(t_re, 3),
        "psnr_latent_vs_dense": round(psnr, 2),
        "params": param_count(params),
        "param_bytes_gib": round(quantized_bytes(params) / 2**30, 2),
        "depth_double": cfg.depth_double, "depth_single": cfg.depth_single,
        "hidden": cfg.hidden, "int8": True, "quantize_mods": True,
        "cache_int8": cfg.cache_int8,
        "t_txt": T_TXT, "seq_len": s,
        "edited_tokens": stats.edited_tokens, "capacity": stats.capacity,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
