"""Single-chip batched-serving benchmark: N same-geometry edit requests
in ONE vmapped device program (core.sampler.sample_batch).

Round-1 state: at dev scale (1.26B, 1024^2 grid) batch 2 exceeded one
16 GB v5e because each image carries its own bf16 KV-cache set (~2.4 GiB)
plus the batched dense-step activations (pipelines/serve.py memory note).
With the int8 KV cache (ops.quant, cfg.cache_int8) each set halves, and
batch 2 fits a single chip — this script measures the realized
throughput gain over sequential single-image runs.

Usage:  timeout 1800 python scripts/bench_serve_batch.py [--batch 2]
Prints one JSON line: per-image latency batched vs sequential.
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


def log(m):
    print(f"[serve_batch] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--t-txt", type=int, default=128)
    ap.add_argument("--preset", default="step1x-edit:dev")
    ap.add_argument("--cache-int4", action="store_true",
                    help="nibble-packed int4 KV caches instead of int8 "
                         "(halves the per-request cache set again; the "
                         "lever that fits batch 4 on one v5e — int8 "
                         "needed 17.24 GiB of 15.75, SERVE_r05_B4.json)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--service", action="store_true",
                    help="measure EditService.run end-to-end (full "
                         "pipeline incl. VAE) instead of the batched "
                         "sampler comparison")
    ap.add_argument("--out", default=None,
                    help="also write the JSON row to this path "
                         "(e.g. SERVE_r05.json)")
    args = ap.parse_args()
    if args.service:
        return service_e2e(args)

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    def sync(x):
        return float(jnp.sum(x))

    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models.mmdit import init_mmdit_jit as init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline

    GRID, T_TXT, B = args.grid, args.t_txt, args.batch
    cache_kind = "int4" if args.cache_int4 else "int8"
    cfg = dataclasses.replace(get_config(args.preset),
                              cache_int8=not args.cache_int4,
                              cache_int4=args.cache_int4)
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    re = RegionEParams().replace(threshold=0.88, cache_threshold=0.02)
    pipe = Step1XEditPipeline(cfg, params, re)

    rng = np.random.default_rng(110)
    s = GRID * GRID
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)

    def mk_req(i):
        r = np.random.default_rng(110 + i)
        lat0 = jnp.asarray(r.standard_normal((1, s, cfg.in_channels)),
                           jnp.float32)
        ctx = EditInputs(
            txt=jnp.asarray(r.standard_normal((2, T_TXT, cfg.txt_in_dim)),
                            cfg.dtype),
            cond_latent=jnp.asarray(
                r.standard_normal((1, s, cfg.in_channels)), jnp.float32),
            rope_img=rope_img, rope_txt=rope_txt,
            pooled=jnp.asarray(r.standard_normal((2, cfg.pooled_dim)),
                               cfg.dtype),
        )
        return lat0, ctx

    reqs = [mk_req(i) for i in range(B)]
    q = GRID // 2
    fblock = np.zeros((GRID, GRID), bool)
    fblock[:q, :q] = True
    fmask = jnp.asarray(fblock.reshape(-1))

    # ---- sequential single-image baseline -------------------------------
    log("compiling single-image path...")
    for lat0, ctx in reqs[:1]:
        out, _ = pipe.edit_latents(lat0, ctx, GRID, GRID, forced_mask=fmask)
        sync(out)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        for lat0, ctx in reqs:
            out, _ = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                       forced_mask=fmask)
            sync(out)
        times.append((time.perf_counter() - t0) / B)
    t_seq = min(times)
    log(f"sequential: {t_seq:.3f}s/image")

    # ---- one vmapped batch program --------------------------------------
    log(f"compiling batch-{B} path...")
    lats = [r[0] for r in reqs]
    ctxs = [r[1] for r in reqs]
    try:
        outs, stats = pipe.edit_latents_batch(lats, ctxs, GRID, GRID,
                                              forced_masks=[fmask] * B)
        sync(outs[0])
    except Exception as e:  # typically HBM OOM: B cache sets + batched acts
        msg = str(e)
        if "memory" not in msg.lower() and "hbm" not in msg.lower():
            raise
        import re as _re
        m = _re.search(r"Used ([0-9.]+)G of ([0-9.]+)G", msg)
        row = {
            "metric": f"batch-{B} single-chip serving ({cache_kind} KV cache)",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0,
            "oom": True,
            "hbm_needed_gib": float(m.group(1)) if m else None,
            "hbm_capacity_gib": float(m.group(2)) if m else None,
            "seq_s_per_image": round(t_seq, 4),
            "seq_images_per_s": round(1.0 / t_seq, 4),
            "batch": B, "grid": GRID, "t_txt": T_TXT,
            "model": args.preset, "device": str(jax.devices()[0]),
        }
        log(f"batch-{B} does not fit one chip: {row['hbm_needed_gib']} GiB "
            f"needed of {row['hbm_capacity_gib']}")
        if args.out:
            with open(args.out, "w") as f:
                json.dump(row, f, indent=2)
        print(json.dumps(row))
        return
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        outs, stats = pipe.edit_latents_batch(lats, ctxs, GRID, GRID,
                                              forced_masks=[fmask] * B)
        sync(outs[0])
        times.append((time.perf_counter() - t0) / B)
    t_bat = min(times)
    log(f"batched: {t_bat:.3f}s/image")

    # parity: batched output must match the single-image output
    ref, _ = pipe.edit_latents(lats[0], ctxs[0], GRID, GRID,
                               forced_mask=fmask)
    err = float(jnp.max(jnp.abs(outs[0] - ref)))

    from regione_tpu.models.mmdit import init_cache
    cache_gib = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(jax.eval_shape(
            lambda: init_cache(cfg, 2, 2 * s, T_TXT)))) * B / 2**30
    row = {
        "metric": f"batch-{B} single-chip serving throughput gain "
                  f"({cache_kind} KV cache)",
        "value": round(t_seq / t_bat, 4),
        "unit": "x",
        "vs_baseline": round(t_seq / t_bat, 4),
        "seq_s_per_image": round(t_seq, 4),
        "batched_s_per_image": round(t_bat, 4),
        "seq_images_per_s": round(1.0 / t_seq, 4),
        "batched_images_per_s": round(1.0 / t_bat, 4),
        "batch": B,
        "cache_sets_gib": round(cache_gib, 3),
        "max_abs_err_vs_single": err,
        "grid": GRID,
        "t_txt": T_TXT,
        "model": args.preset,
        "device": str(jax.devices()[0]),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=2)
    print(json.dumps(row))



def service_e2e(args):
    """Measure EditService.run end-to-end on device: full pipeline
    (mock text encode -> VAE encode -> RegionE denoise -> VAE decode)
    with host prep overlapped one request ahead.  Reports per-request
    wall latency and the prep time hidden behind device compute."""
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models import vae as V
    from regione_tpu.models.mmdit import init_mmdit_jit as init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.models.text_encoders import MockTextEncoder
    from regione_tpu.pipelines.serve import EditRequest, EditService
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline

    cfg = dataclasses.replace(get_config(args.preset), cache_int8=True)
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    # random weights give near-zero x0/condition similarity, so the
    # adaptive partition marks ~everything edited — this measures the
    # serving path at its worst-case capacity (cap == full grid)
    re = RegionEParams().replace(threshold=0.88)
    pipe = Step1XEditPipeline(cfg, params, re)
    vae_cfg = V.VAEConfig(block_out_channels=(8, 16, 32, 64),
                          norm_num_groups=8, layers_per_block=1,
                          latent_channels=cfg.in_channels // 4)
    pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(1), vae_cfg))
    pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim,
                                             cfg.pooled_dim, max_length=128))
    svc = EditService(pipe)
    rng = np.random.default_rng(0)
    reqs = [EditRequest(
        image=(rng.random((1024, 1024, 3)) * 255).astype(np.uint8),
        prompt=f"edit {i}", seed=i) for i in range(args.requests)]
    svc.run(reqs[:1])                     # compile
    t0 = time.perf_counter()
    results = svc.run(reqs)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "end-to-end serving latency (overlapped prep, "
                  "mock encoder + VAE, adaptive RegionE)",
        "value": round(wall / len(reqs), 4),
        "unit": "s/request",
        "vs_baseline": 1.0,
        "requests": len(reqs),
        "wall_s": round(wall, 4),
        "prep_s_mean": round(float(np.mean([r.prep_s for r in results])), 4),
        "denoise_decode_s_mean": round(
            float(np.mean([r.latency_s for r in results])), 4),
        "model": args.preset,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
