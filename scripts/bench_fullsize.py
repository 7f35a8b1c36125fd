"""Full-topology 12B Step1X-Edit / FLUX.1-Kontext on ONE v5e chip: int8
weights + int8 KV cache, RegionE vs dense 28-step denoise.

VERDICT r1 item 3: "attempt int8 full-topology Step1X/FLUX on the single
v5e — measure speedup and record the memory plan; if it doesn't fit, find
and document the largest config that does."

The memory plan (regione_tpu.utils.memplan) for the full 19+38-block
hidden-3072 backbone (12.31B params — reference Step1X-Edit size,
src/Step1X-Edit/modules/model.py config):

    step1x grid 64 (1024px), int8 weights + bf16 cache : 22.96 GiB — no
    step1x grid 64 (1024px), int8 weights + int8 cache : 17.62 GiB — no
    step1x grid 48 ( 768px), int8 weights + int8 cache : 15.05 GiB — dense
        fits and runs; the cache-carrying RegionE programs exhaust HBM
        even with the four-segment sampler (probe peak 15.14 GiB
        connector-less vs 15.75 usable — the connector + runtime reserve
        eat the margin)
    step1x grid 44 ( 704px), int8 weights + int8 cache : 14.48 GiB — YES
    flux   grid 64 (1024px), int8 weights + int8 cache : 14.30 GiB — YES
    qwen36 grid 48 ( 768px), int8 weights + int8 cache : 13.90 GiB — YES

FLUX.1-Kontext (guidance-distilled, RegionE/FluxKontext/inplace.py) runs a
SINGLE forward per step (guidance enters via the embedding, no CFG batch
concat), so its KV cache is half of Step1X's — the full 12.06B FLUX fits
one v5e at the reference's native 1024px grid.  Step1X's batch-concat CFG
doubles the cache; its largest single-chip grid is 44 (704px); 1024px at
full size needs tp=2 (validated shape-level on the virtual mesh,
tests/test_parallel.py).  Weights are random but distribution-matched
(ops.quant.init_quantized) — runtime depends only on shapes/dtypes, and
fidelity is still meaningful because RegionE is compared against the dense
run of the SAME quantized model.

Writes FULLSIZE.json (step1x) / FULLSIZE_FLUX.json at the repo root and
prints the same one-line JSON schema as bench.py.

Usage:  timeout 3000 python scripts/bench_fullsize.py [--preset flux-kontext]
            [--grid 44] [--t-txt 128] [--act-int8]
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


def log(msg):
    print(f"[fullsize] {msg}", file=sys.stderr, flush=True)


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(max(a.max() - a.min(), 1e-9))
    return 10.0 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="step1x-edit",
                    choices=["step1x-edit", "step1x-edit-v1p2",
                             "flux-kontext", "qwen-image-edit",
                             "qwen-image-edit-plus"])
    ap.add_argument("--grid", type=int, default=None)
    ap.add_argument("--t-txt", type=int, default=None)
    ap.add_argument("--blocks", type=int, default=None,
                    help="override depth_double (Qwen: the full 60-block "
                         "20B needs tp=4 — scripts/dryrun_qwen_tp4.py; 36 "
                         "blocks at the FULL production width is 12.3B and "
                         "the largest single-chip config, per-block "
                         "byte-identical to the 20B model's)")
    ap.add_argument("--act-int8", action="store_true",
                    help="W8A8: dynamic per-row activation quant onto the "
                         "int8 MXU (~1.4x the bf16 matmul rate on v5e)")
    ap.add_argument("--int4", action="store_true",
                    help="nibble-packed int4 weights incl. modulations "
                         "(ops.quant bits=4, int4_mods).  Single-chip "
                         "format for the FULL 60-block 20B Qwen and for "
                         "Step1X at its native 1024px; bf16 MXU compute")
    ap.add_argument("--cache-int4", action="store_true",
                    help="nibble-packed int4 KV cache instead of int8 "
                         "(ops.quant.quantize_kv_heads4): quarter of the "
                         "bf16 cache bytes — the single-chip unlock for "
                         "the FULL 20B Qwen at its native 1024^2 area "
                         "(grid 64: int8 cache 5.8 GiB does not fit "
                         "beside the 10.2 GiB int4 weights; int4 cache "
                         "2.9 GiB does)")
    ap.add_argument("--adaptive", action="store_true",
                    help="run the REAL adaptive partition end-to-end at "
                         "full size (x0 probe + on-device cosine/morphology "
                         "selection, the bench.py headline path) instead of "
                         "the pinned 25%% forced-mask ablation; synthesizes "
                         "a structured condition latent the way bench.py "
                         "does and reports the forced row as an ablation "
                         "(VERDICT r2 weak #1)")
    ap.add_argument("--dense-chunk", type=int, default=None,
                    help="max dense steps per device program.  The remote "
                         "TPU runtime kills single executions over ~60 s; "
                         "the Step1X@1024px 28-step dense scan runs ~71 s "
                         "(21 steps = 53 s is fine), so big-grid rows "
                         "split the baseline into bounded chunks "
                         "(numerically identical)")
    ap.add_argument("--cap-granularity", type=int, default=None,
                    help="override RegionEParams.capacity_granularity "
                         "(default 128): smaller buckets cut rags padding "
                         "(e.g. Qwen@768 edited 529 -> cap 640 at 128 vs "
                         "576 at 64) at the cost of more possible "
                         "capacity buckets to compile")
    ap.add_argument("--cache-threshold", type=float, default=None,
                    help="override RegionEParams.cache_threshold (the AVD "
                         "accumulated-error budget; backend defaults "
                         "Appendix B).  Larger admits more gamma-certified "
                         "velocity reuses per RAGS segment; report such "
                         "rows as knob-sweep rows, never over the default "
                         "artifact (VERDICT r4 item 3 sanctions +-0.02)")
    ap.add_argument("--threshold", type=float, default=None,
                    help="override RegionEParams.threshold (partition "
                         "cosine-similarity cut; backend defaults "
                         "Appendix B)")
    ap.add_argument("--skip-pixel-psnr", action="store_true",
                    help="skip the post-timing VAE decode of both latents "
                         "(psnr_pixel_vs_dense); timing rows are "
                         "unaffected either way")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    defaults = {  # (grid, t_txt, blocks, artifact)
        # reference text lengths: FLUX T5 max 512, Qwen chat-template
        # prompts run to ~512; Step1X Qwen2.5-VL prompts are short (128)
        "step1x-edit": (44, 128, None, "FULLSIZE.json"),
        "step1x-edit-v1p2": (44, 128, None, "FULLSIZE_V1P2.json"),
        "flux-kontext": (64, 512, None, "FULLSIZE_FLUX.json"),
        "qwen-image-edit": (48, 512, 36, "FULLSIZE_QWEN.json"),
        "qwen-image-edit-plus": (48, 512, 36, "FULLSIZE_PLUS.json"),
    }
    if args.int4 and args.act_int8:
        ap.error("--int4 and --act-int8 are mutually exclusive (int4 runs "
                 "the bf16 dot; W8A8 needs int8 weights)")
    dg, dt, db, dout = defaults[args.preset]
    if args.int4:
        # int4 unlocks the configs int8 cannot hold: the FULL 60-block
        # Qwen (memplan 13.7 GiB @704px) and Step1X at the reference's
        # native 1024px (12.4 GiB)
        if args.preset == "qwen-image-edit":
            dg, db, dout = 44, 60, "FULLSIZE_QWEN60.json"
        elif args.preset == "qwen-image-edit-plus":
            dg, db, dout = 44, 60, "FULLSIZE_PLUS60.json"
        elif args.preset.startswith("step1x"):
            dg = 64
            dout = ("FULLSIZE_1024.json" if args.preset == "step1x-edit"
                    else "FULLSIZE_V1P2_1024.json")
            if args.dense_chunk is None:
                args.dense_chunk = 14  # 28-step scan ~71 s > watchdog
        else:
            dout = dout.replace(".json", "_INT4.json")
    args.grid = args.grid if args.grid is not None else dg
    args.t_txt = args.t_txt if args.t_txt is not None else dt
    args.blocks = args.blocks if args.blocks is not None else db
    if args.out is None:
        if args.act_int8:  # keep the weight-only baseline artifact intact
            dout = dout.replace(".json", "_W8A8.json")
        args.out = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), dout)

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    def sync(x):
        return float(jnp.sum(x))

    from regione_tpu.core.config import DEFAULT_PARAMS
    from regione_tpu.models.mmdit import param_count
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import init_quantized
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.flux_kontext import FluxKontextPipeline
    from regione_tpu.pipelines.qwen_image_edit import (
        QwenImageEditPipeline, QwenImageEditPlusPipeline)
    from regione_tpu.pipelines.step1x_edit import (
        Step1XEditPipeline, Step1XEditV1P2Pipeline)
    from regione_tpu.utils.memplan import plan

    GRID, T_TXT = args.grid, args.t_txt
    preset = args.preset
    is_flux = preset == "flux-kontext"
    is_qwen = preset.startswith("qwen")
    cfg = dataclasses.replace(get_config(preset),
                              cache_int8=not args.cache_int4,
                              cache_int4=args.cache_int4,
                              act_int8=args.act_int8)
    if args.blocks is not None:
        cfg = dataclasses.replace(cfg, depth_double=args.blocks)
    batch_cfg = 1 if is_flux else 2  # flux: guidance-embedded single fwd

    bits = 4 if args.int4 else 8
    mp = plan(cfg, grid=GRID, t_txt=T_TXT, tp=1, int8=True,
              batch_cfg=batch_cfg, quantize_mods=True, cache_dtype=jnp.int8,
              bits=bits, int4_mods=args.int4,
              cache_bits=4 if args.cache_int4 else 8)
    log(f"memplan: params {mp.param_bytes_per_device/2**30:.2f} GiB, "
        f"cache {mp.cache_bytes_per_device/2**30:.2f} GiB, "
        f"total {mp.total_bytes_per_device/2**30:.2f} GiB, "
        f"fits v5e: {mp.fits('v5e')}")

    log(f"initializing {preset} int{bits} weights on device...")
    t0 = time.perf_counter()
    params = init_quantized(jax.random.PRNGKey(0), cfg, quantize_mods=True,
                            bits=bits, int4_mods=args.int4)
    mod_probe = params["double"]["img_mod"]
    sync(mod_probe["scale4" if "scale4" in mod_probe else "scale"])
    log(f"init {time.perf_counter()-t0:.1f}s; "
        f"{param_count(params)/1e9:.2f}B leaves resident")

    re = DEFAULT_PARAMS[preset]
    if args.cap_granularity:
        re = re.replace(capacity_granularity=args.cap_granularity)
    if args.cache_threshold is not None:
        re = re.replace(cache_threshold=args.cache_threshold)
    if args.threshold is not None:
        re = re.replace(threshold=args.threshold)
    pipe_cls = {"step1x-edit": Step1XEditPipeline,
                "step1x-edit-v1p2": Step1XEditV1P2Pipeline,
                "flux-kontext": FluxKontextPipeline,
                "qwen-image-edit": QwenImageEditPipeline,
                "qwen-image-edit-plus": QwenImageEditPlusPipeline}[preset]
    kw = {"guidance_scale": 2.5} if is_flux else {}
    pipe = pipe_cls(cfg, params, re, **kw)
    if args.dense_chunk:
        pipe.dense_chunk = args.dense_chunk
        log(f"dense baseline chunked at {args.dense_chunk} steps/program")

    rng = np.random.default_rng(110)
    s = GRID * GRID
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    lat0 = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                       jnp.float32)
    ctx = EditInputs(
        txt=jnp.asarray(rng.standard_normal((batch_cfg, T_TXT,
                                             cfg.txt_in_dim)), cfg.dtype),
        cond_latent=jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                                jnp.float32),
        rope_img=rope_img, rope_txt=rope_txt,
        pooled=jnp.asarray(rng.standard_normal((batch_cfg, cfg.pooled_dim)),
                           cfg.dtype),
        guidance=(jnp.full((batch_cfg,), 2.5, jnp.float32)
                  if cfg.guidance_embed else None),
    )

    # pinned ~25% region ablation mask (and the default workload without
    # --adaptive: avoids the extra full-size x0-probe compiles)
    q = GRID // 2
    fblock = np.zeros((GRID, GRID), bool)
    fblock[:q, :q] = True
    forced_mask = jnp.asarray(fblock.reshape(-1))

    if args.adaptive:
        # structured condition latent so the REAL partition runs at full
        # size: identical to the model's own x0 estimate everywhere except
        # a ~25% target region replaced with noise (bench.py's recipe —
        # random weights would otherwise mark every token edited)
        from regione_tpu.core.partition import select_edited_mask
        sampler = pipe.sampler_for(GRID, GRID, T_TXT, batch_cache=batch_cfg)
        warm_plan = sampler.plan[: re.warmup_step - 1]
        part_sp = sampler.plan[re.warmup_step - 1]

        @jax.jit
        def x0_probe(lat, c):
            lat = lat.astype(jnp.float32)
            sig = jnp.array([sp.sigma for sp in warm_plan], jnp.float32)
            dts = jnp.array([sp.dt for sp in warm_plan], jnp.float32)

            def body(l, xs):
                sg, dt = xs
                v, _ = pipe.dense_forward(l, sg, None, c, False)
                return l + dt * v.astype(jnp.float32), None

            lat, _ = jax.lax.scan(body, lat, (sig, dts))
            v, _ = pipe.dense_forward(lat, jnp.float32(part_sp.sigma),
                                      None, c, False)
            return lat + part_sp.dt_final * v.astype(jnp.float32)

        def ctx_extra(c):
            return dataclasses.replace(
                c, extra={"params": params, "s_noise": s})

        b0, b1 = GRID // 16, GRID // 2  # pre-morphology target block
        block = np.zeros((GRID, GRID), bool)
        block[b0:b1, b0:b1] = True
        target = block.reshape(-1)
        noise_block = rng.standard_normal((int(target.sum()),
                                           cfg.in_channels))
        cond = np.asarray(ctx.cond_latent)
        log("probing x0 for a structured condition latent...")
        for it in range(3):
            t0 = time.perf_counter()
            x0 = np.asarray(x0_probe(lat0, ctx_extra(
                dataclasses.replace(ctx, cond_latent=jnp.asarray(
                    cond, jnp.float32)))))
            cond = x0.copy()
            cond[0, target] = noise_block
            mask_prev = np.asarray(select_edited_mask(
                jnp.asarray(x0), jnp.asarray(cond, jnp.float32),
                re.threshold, grid_h=GRID, grid_w=GRID,
                erosion_dilation=re.erosion_dilation))
            frac = float(mask_prev.mean())
            log(f"probe iter {it}: edited frac {frac:.3f} "
                f"({time.perf_counter()-t0:.1f}s)")
            if 0.15 <= frac <= 0.40 and it >= 1:
                break
        ctx = dataclasses.replace(ctx, cond_latent=jnp.asarray(
            cond, jnp.float32))

    log("compiling dense baseline (28 steps, 12B)...")
    t0 = time.perf_counter()
    out_dense = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0]
    sync(out_dense)
    log(f"dense compile+run {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out_dense = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                      dense_only=True)[0]
        sync(out_dense)
        times.append(time.perf_counter() - t0)
        log(f"dense run {times[-1]:.2f}s")
    t_dense = min(times)

    headline_mask = None if args.adaptive else forced_mask
    log(f"compiling RegionE path "
        f"({'adaptive partition' if args.adaptive else 'forced mask'})...")
    t0 = time.perf_counter()
    out_re, stats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                      forced_mask=headline_mask)
    sync(out_re)
    log(f"regione compile+run {time.perf_counter()-t0:.1f}s "
        f"(edited {stats.edited_tokens}, cap {stats.capacity})")
    times, sts_times = [], []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out_re, stats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                          forced_mask=headline_mask,
                                          timed=True)
        sync(out_re)
        times.append(time.perf_counter() - t0)
        sts_times.append(stats.sts_s)
        log(f"regione run {times[-1]:.2f}s (warm+partition {stats.sts_s:.2f}s)")
    t_re = min(times)
    t_sts = min(sts_times)

    forced_row = {}
    if args.adaptive:
        # forced-mask ablation alongside (same program shapes as the old
        # default rows, so the two stay comparable)
        out_f, fstats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                          forced_mask=forced_mask)
        sync(out_f)
        ftimes = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            out_f, fstats = pipe.edit_latents(lat0, ctx, GRID, GRID,
                                              forced_mask=forced_mask)
            sync(out_f)
            ftimes.append(time.perf_counter() - t0)
            log(f"forced-ablation run {ftimes[-1]:.2f}s")
        forced_row = {
            "forced_mask_s": round(min(ftimes), 4),
            "forced_mask_speedup": round(t_dense / min(ftimes), 4),
            "forced_edited_tokens": fstats.edited_tokens,
        }

    speedup = t_dense / t_re
    psnr_latent = round(psnr(out_dense, out_re), 2)
    n_params = param_count(params)

    # ---- pixel-space PSNR (VERDICT r4 item 4) ------------------------------
    # The reference measures PSNR on DECODED images (evaluation/
    # metric_all_task.py:12-143).  Decode both latents through the family
    # VAE decoder AFTER all timing, dropping the DiT params/pipeline/cache
    # references first (the 20B rows leave <2 GiB HBM headroom; the decoder
    # needs ~0.1-0.4 GiB weights + a few GiB of bf16 activations).  Guarded:
    # the timing artifact must survive a decode failure.
    pix = {}
    if not args.skip_pixel_psnr:
        try:
            import gc

            from regione_tpu.eval.pixelprobe import (family_for_preset,
                                                     pixel_psnr_vs_dense)
            out_d_np = np.asarray(out_dense)
            out_r_np = np.asarray(out_re)
            pipe = params = out_dense = out_re = None
            if args.adaptive:
                out_f = fstats = None
            gc.collect()
            log("decoding both latents for pixel-space PSNR...")
            pix = pixel_psnr_vs_dense(out_d_np, out_r_np, GRID, GRID,
                                      family_for_preset(preset))
            log(f"pixel PSNR vs dense: {pix['psnr_pixel_vs_dense']} dB")
        except Exception as e:
            pix = {"pixel_decode_error": repr(e)[:200]}

    # assets/result.jpg reference headline rows; the reference table has
    # no v1p2/Plus rows — compare each against its family's row
    ref_headline = {"step1x-edit": 2.572, "step1x-edit-v1p2": 2.572,
                    "flux-kontext": 2.409,
                    "qwen-image-edit": 2.059,
                    "qwen-image-edit-plus": 2.059}[preset]
    qwen_label = (f"production-width Qwen ({cfg.depth_double}/60 blocks, "
                  f"{n_params/1e9:.1f}B)")
    label = {"step1x-edit": "full-size 12B Step1X",
             "step1x-edit-v1p2": "full-size 12B Step1X v1.2 (own gamma)",
             "flux-kontext": "full-size 12B FLUX.1-Kontext",
             "qwen-image-edit": qwen_label,
             "qwen-image-edit-plus": qwen_label + " [Plus gamma]"}[preset]
    if args.int4 and is_qwen and cfg.depth_double == 60:
        label = (f"FULL 20B Qwen (60/60 blocks, "
                 f"{n_params/1e9:.1f}B)"
                 + (" [Plus gamma]" if preset.endswith("plus") else ""))
    row = {
        "metric": f"{label} single-chip edit speedup "
                  f"(int{bits} weights + "
                  f"int{4 if args.cache_int4 else 8} KV cache"
                  f"{' + W8A8 activations' if args.act_int8 else ''})",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / ref_headline, 4),
        "dense_s": round(t_dense, 4),
        "regione_s": round(t_re, 4),
        "psnr_latent_vs_dense": psnr_latent,
        **pix,
        "partition": "adaptive" if args.adaptive else "forced",
        "edited_tokens": stats.edited_tokens,
        "edited_frac": round(stats.edited_tokens / s, 4),
        # wall time of the warm scan + partition/probe/cache-build segment
        # within the timed edit (the adaptive path's x0-estimate cost lives
        # here — VERDICT r2 weak #1 asked for this bounded at full size)
        "warm_partition_s": round(t_sts, 4),
        **forced_row,
        "capacity": stats.capacity,
        "seq_len": stats.seq_len,
        "reuse_steps": stats.reuse_steps,
        **({"cache_threshold": re.cache_threshold} if args.cache_threshold is not None else {}),
        **({"threshold": re.threshold} if args.threshold is not None else {}),
        "params": n_params,
        "weight_bits": bits,
        "grid": GRID,
        "resolution_px": GRID * 16,
        "memplan_total_gib": round(mp.total_bytes_per_device / 2**30, 3),
        "model": preset,
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
