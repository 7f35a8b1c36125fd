"""CLI bench/demo/evaluation driver.

Flag-compatible with the reference experimental drivers
(src/Step1X-Edit/main.py:12-41 and twins): `--use_regione` toggles the
accelerated path vs. the vanilla dense baseline at pinned resolution; the
six RegionE knobs keep their names; demo mode iterates a jsonl of
(image, prompt) pairs; `--evaluation` walks data/Processed/<bench>/<task>
dirs writing generation/*.png + time_consuming.json + metadata.json in the
same schema (src/Step1X-Edit/main.py:77-130), so the reference's evaluation
stack runs unchanged on our outputs.

Model weights: `--model_path` points at a converted checkpoint directory
(see regione_tpu.weights.convert).  Without one, `--random_weights` runs
the architecture with seeded random weights (timing/integration work in
environments without the checkpoints, e.g. this zero-egress container).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

# schema resolution shared with the VIEScore harness (one copy, no drift)
from regione_tpu.utils.metadata import item_key, resolve_item as _item_image_prompt


def build_pipeline(args):
    import jax
    from regione_tpu.core.config import DEFAULT_PARAMS
    from regione_tpu.models.mmdit import init_mmdit
    from regione_tpu.models.presets import get_config
    from regione_tpu.models.text_encoders import MockTextEncoder
    from regione_tpu.models import vae as V
    from regione_tpu.pipelines.step1x_edit import (
        Step1XEditPipeline, Step1XEditV1P2Pipeline)
    from regione_tpu.pipelines.flux_kontext import FluxKontextPipeline
    from regione_tpu.pipelines.qwen_image_edit import (
        QwenImageEditPipeline, QwenImageEditPlusPipeline)

    classes = {
        "step1x-edit": Step1XEditPipeline,
        "step1x-edit-v1p2": Step1XEditV1P2Pipeline,
        "flux-kontext": FluxKontextPipeline,
        "qwen-image-edit": QwenImageEditPipeline,
        "qwen-image-edit-plus": QwenImageEditPlusPipeline,
    }
    backend = args.backend
    preset = args.preset or (backend + (":dev" if args.dev else ""))
    try:
        cfg = get_config(preset)
    except KeyError:
        cfg = get_config(backend)

    re = DEFAULT_PARAMS[backend].replace(
        warmup_step=args.warmup_step, post_step=args.post_step,
        refresh_step=args.refresh_step, threshold=args.threshold,
        cache_threshold=args.cache_threshold,
        erosion_dilation=args.erosion_dilation).validate()
    steps = getattr(args, "num_inference_steps", None)
    if steps is not None and steps != re.num_inference_steps:
        if args.use_regione:
            # the reference pins this in RegionE mode (RegionE/tool/
            # RegionE.py:44): the gamma tables are fitted at 28 steps
            raise SystemExit("--num_inference_steps must be 28 with "
                             "--use_regione (fitted gamma tables)")
        if steps < 4:
            raise SystemExit("--num_inference_steps must be >= 4")
        # dense-only run: the reference's vanilla path takes any step
        # count without Manager validation; the RegionE knobs are unused
        # on this path, so pin them to values that satisfy validate()
        re = re.replace(num_inference_steps=steps, allow_custom_steps=True,
                        warmup_step=1, post_step=0,
                        refresh_step=(3,)).validate()

    if args.model_path:
        from regione_tpu.weights.convert import load_converted
        params, vae_cfg, vae_params, encoder = load_converted(
            args.model_path, cfg, backend=backend)
    else:
        params = init_mmdit(jax.random.PRNGKey(args.seed), cfg)
        # 4 resolution levels -> spatial_factor 8, token_factor 16: the
        # mock VAE must match the PRODUCTION latent geometry, or the
        # default ~1024^2 target_resolution yields a 256x256 token grid
        # (65k tokens) instead of 64x64 and the dense attention logits
        # alone exceed any device's memory
        vae_cfg = V.VAEConfig(block_out_channels=(8, 16, 32, 64),
                              norm_num_groups=8, layers_per_block=1,
                              latent_channels=cfg.in_channels // 4)
        vae_params = init_vae_cached(vae_cfg, args.seed)
        encoder = MockTextEncoder(cfg.txt_in_dim,
                                  cfg.pooled_dim or None, max_length=128)

    if getattr(args, "act_int8", False) and not getattr(args, "int8", False):
        # W8A8 needs int8 weights: activation quant alone would dequantize
        # nothing and the int8 MXU path never engages (ADVICE r2)
        raise SystemExit("--act_int8 requires --int8 (W8A8 = int8 weights "
                         "+ int8 activations)")
    if getattr(args, "int4", False) and getattr(args, "act_int8", False):
        # int4 projections run the bf16 dot (no per-column int8 scale for
        # the MXU s8xs8 path); mixing the flags would silently leave most
        # of the model outside the W8A8 path the user asked for
        raise SystemExit("--int4 and --act_int8 are mutually exclusive "
                         "(int4 buys single-chip fit; W8A8 speed needs "
                         "int8 weights)")
    if getattr(args, "int8", False) or getattr(args, "int4", False):
        from regione_tpu.ops.quant import quantize_params
        quantize_mods = getattr(args, "quantize_mods", None)
        if quantize_mods is None:
            quantize_mods = bool(getattr(args, "act_int8", False)
                                 or getattr(args, "int4", False))
        int4_mods = getattr(args, "int4_mods", None)
        if int4_mods is None:
            # the published single-chip 60-block format packs mods to int4
            # (bench_fullsize int4 rows); --int4_mods false keeps them int8
            int4_mods = bool(getattr(args, "int4", False))
        params = quantize_params(
            params, quantize_mods=quantize_mods,
            bits=4 if getattr(args, "int4", False) else 8,
            int4_mods=int4_mods and bool(getattr(args, "int4", False)))
    if getattr(args, "act_int8", False):
        import dataclasses
        cfg = dataclasses.replace(cfg, act_int8=True)
    # --guidance_scale maps the way the reference drivers use it: FLUX's
    # distilled guidance embed (src/FluxKontext/main.py:56) vs true CFG for
    # the batch-CFG backends (src/Step1X-Edit/main.py:19 default 6.0,
    # src/Qwen-Image/main.py:21 default 4.0); None keeps the per-backend
    # constructor default, which IS the reference default.
    kw = {}
    gs = getattr(args, "guidance_scale", None)
    if gs is not None:
        if backend == "flux-kontext":
            kw["guidance_scale"] = gs
        else:
            kw["true_cfg_scale"] = gs
    pipe = classes[backend](cfg, params, re, **kw)
    pipe.attach_vae(vae_cfg, vae_params)
    pipe.attach_text_encoder(encoder)
    pipe._regione_enabled = args.use_regione
    return pipe


def init_vae_cached(vae_cfg, seed):
    import jax
    from regione_tpu.models.vae import init_vae
    return init_vae(jax.random.PRNGKey(seed + 1), vae_cfg)


def save_png(path: Path, img_uint8: np.ndarray):
    """Save an image; .webp paths use lossless webp (the reference v1.2
    driver's save format)."""
    from PIL import Image
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix == ".webp":
        Image.fromarray(img_uint8).save(path, lossless=True)
    else:
        Image.fromarray(img_uint8).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _first_item(args):
    """(image path, prompt) of the first input the timed run will see —
    so --num_warmup_runs warms the same shapes in every input mode
    (plain --image_path, demo jsonl, or an --evaluation dataset root)."""
    if args.image_path:
        return args.image_path, args.prompt
    if args.data_jsonl:
        for line in open(args.data_jsonl):
            return _item_image_prompt(json.loads(line))
    if args.eval_dir:
        for task_dir in sorted(p for p in Path(args.eval_dir).iterdir()
                               if p.is_dir()):
            meta_file = task_dir / "metadata.jsonl"
            if not meta_file.exists():
                continue
            for line in open(meta_file):
                return _item_image_prompt(json.loads(line),
                                          img_dir=task_dir / "img")
    return None, None


def run_demo(pipe, args):
    import jax
    items = [json.loads(l) for l in open(args.data_jsonl)] if args.data_jsonl \
        else [{"image": args.image_path, "prompt": args.prompt}]
    out_dir = Path(args.output_dir)
    times = []
    refs = [load_image(p) for p in getattr(args, "ref_image_path", None) or []]
    for i, item in enumerate(items):
        path, item["prompt"] = _item_image_prompt(item)
        img = load_image(path)
        if refs:
            # multi-reference conditioning (Plus): main image + extra refs
            # as the pipeline's image list (pipelines/qwen_image_edit.py)
            img = [img] + refs
        t0 = time.perf_counter()
        if args.enable_thinking or args.enable_reflection:
            from regione_tpu.pipelines.thinker import edit_with_reflection
            out, info = edit_with_reflection(
                pipe, img, item["prompt"],
                enable_thinking=args.enable_thinking,
                enable_reflection=args.enable_reflection,
                max_try_cnt=args.max_try_cnt, seed=args.seed,
                width=args.size_level, height=args.size_level,
                resize_to_input=not args.no_resize_back)
            stats = None
        else:
            out, stats = pipe(img, item["prompt"], seed=args.seed,
                              width=args.size_level, height=args.size_level,
                              output_type="uint8",
                              resize_to_input=not args.no_resize_back)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        times.append(dt)
        save_png(out_dir / f"demo_{i}.{args.save_format}", out)
        print(f"[{i}] {dt:.2f}s edited={getattr(stats, 'edited_tokens', '-')} "
              f"prompt={item['prompt'][:60]!r}")
    if times:
        print(f"avg {np.mean(times):.3f}s over {len(times)} images")


def run_evaluation(pipe, args):
    """Reference schema (src/Step1X-Edit/main.py:77-130): per task dir with
    metadata.jsonl -> generation/*.png + time_consuming.json + metadata.json."""
    import jax
    root = Path(args.eval_dir)
    for task_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        meta_file = task_dir / "metadata.jsonl"
        if not meta_file.exists():
            continue
        out_task = Path(args.output_dir) / task_dir.name
        gen_dir = out_task / "generation"
        times, metadata = [], {}
        for line in open(meta_file):
            item = json.loads(line)
            path, prompt = _item_image_prompt(item, img_dir=task_dir / "img")
            key = item_key(item, path)
            img = load_image(path)
            t0 = time.perf_counter()
            out, _ = pipe(img, prompt, seed=args.seed,
                          width=args.size_level, height=args.size_level,
                          output_type="uint8",
                          resize_to_input=not args.no_resize_back)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
            save_png(gen_dir / f"{key}.{args.save_format}", out)
            metadata[key] = prompt
        out_task.mkdir(parents=True, exist_ok=True)
        ave = float(np.mean(times)) if times else 0.0
        # reference schema first (src/Step1X-Edit/main.py:125 writes
        # ave_time_consuming/time_consuming_list; evaluation/metric_merge.py:20
        # reads them) so the reference eval stack runs unchanged on our
        # outputs; keep the short aliases for older round artifacts.
        json.dump({"num_item": len(times),
                   "ave_time_consuming": ave,
                   "time_consuming_list": times,
                   "ave": ave,
                   "list": times},
                  open(out_task / "time_consuming.json", "w"), indent=2)
        json.dump(metadata, open(out_task / "metadata.json", "w"), indent=2)
        print(f"{task_dir.name}: {len(times)} items, "
              f"avg {np.mean(times) if times else 0:.2f}s")


def make_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("regione-tpu")
    ap.add_argument("--backend", default="step1x-edit",
                    choices=["step1x-edit", "step1x-edit-v1p2", "flux-kontext",
                             "qwen-image-edit", "qwen-image-edit-plus"])
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--use_regione", action="store_true")
    ap.add_argument("--warmup_step", type=int, default=6)
    ap.add_argument("--post_step", type=int, default=2)
    ap.add_argument("--refresh_step", default="16")
    ap.add_argument("--threshold", type=float, default=0.88)
    ap.add_argument("--cache_threshold", type=float, default=0.02)
    # The reference CLI defines this store_true (src/Step1X-Edit/main.py:27)
    # and its script/*.sh always pass it bare; accept the bare form AND an
    # explicit True/False value.  Default stays True — the plugin-level
    # reference default for every backend (RegionE/tool/RegionE.py:1-7).
    ap.add_argument("--erosion_dilation", type=lambda s: s != "False",
                    nargs="?", const=True, default=True)
    ap.add_argument("--seed", type=int, default=110)
    ap.add_argument("--guidance_scale", type=float, default=None,
                    help="reference drivers' knob: FLUX guidance embed / "
                         "true CFG scale elsewhere (default: per-backend "
                         "reference value)")
    ap.add_argument("--size_level", type=int, default=None)
    ap.add_argument("--num_inference_steps", type=int, default=None,
                    help="denoise step count (reference flag, src/<M>/"
                         "main.py): any value for the dense baseline; "
                         "must stay 28 with --use_regione")
    ap.add_argument("--device", default=None,
                    help="accepted for reference command-line "
                         "compatibility (e.g. 'cuda:0'); device placement "
                         "is managed by JAX/XLA, so the value is ignored")
    ap.add_argument("--image_path", default=None)
    ap.add_argument("--ref_image_path", action="append", default=None,
                    help="extra reference image(s) for multi-reference "
                         "conditioning (qwen-image-edit-plus); repeatable")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--data_jsonl", default=None)
    ap.add_argument("--output_dir", default="outputs")
    ap.add_argument("--evaluation", action="store_true")
    ap.add_argument("--eval_dir", default=None)
    ap.add_argument("--num_warmup_runs", type=int, default=0,
                    help="full-pipeline warmup invocations before timing "
                         "(reference does 3, main.py:50-58)")
    ap.add_argument("--dev", action="store_true",
                    help="use the scaled :dev architecture preset")
    ap.add_argument("--preset", default=None,
                    help="explicit architecture preset name (overrides "
                         "--backend/--dev resolution; e.g. 'tiny' for "
                         "CPU smoke runs)")
    ap.add_argument("--random_weights", action="store_true")
    ap.add_argument("--save_format", default="png", choices=["png", "webp"])
    ap.add_argument("--no_resize_back", action="store_true",
                    help="keep outputs at the processed (snapped) "
                    "resolution instead of restoring the input image's "
                    "geometry.  Default restores, like the reference "
                    "plugin's _output_process_image "
                    "(RegionE/Step1XEdit/inplace.py:449); this flag "
                    "matches the reference's experimental mains, which "
                    "keep the processed size "
                    "(src/Step1X-Edit/utils.py:449).  Moot when "
                    "--size_level pins an explicit size")
    ap.add_argument("--print_plan", action="store_true",
                    help="dump the static 28-step stage plan and continue")
    ap.add_argument("--enable_thinking", action="store_true",
                    help="v1.2 thinker prompt rewrite (reference CLI "
                         "hardcodes these off, src/Step1X-Edit-v1p2/"
                         "main.py:42-43)")
    ap.add_argument("--enable_reflection", action="store_true")
    ap.add_argument("--max_try_cnt", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 quantization of the DiT "
                         "(halves weight HBM; regione_tpu.ops.quant)")
    ap.add_argument("--int4", action="store_true",
                    help="nibble-packed int4 weights for the big DiT "
                         "projections (implies --quantize_mods and "
                         "--int4_mods).  The single-chip format for "
                         "the FULL 60-block 20B Qwen backbone")
    ap.add_argument("--int4_mods", default=None,
                    type=lambda s: s.lower() in ("1", "true", "yes"),
                    help="with --int4, pack the per-block modulation "
                         "projections to int4 too (default true — Qwen's "
                         "mod stacks are ~6.8B params and int8 mods alone "
                         "break the 60-block single-chip budget; set false "
                         "to keep mods int8 for fidelity on backbones that "
                         "fit)")
    ap.add_argument("--act_int8", action="store_true",
                    help="W8A8: with --int8, dynamically quantize "
                         "activations per row onto the int8 MXU (~20%% "
                         "lower latency; validate PSNR per checkpoint — "
                         "docs/RUNBOOK_REAL_WEIGHTS.md).  Also widens "
                         "weight quant to the modulation projections "
                         "unless --quantize_mods overrides")
    ap.add_argument("--quantize_mods", default=None,
                    type=lambda s: s.lower() in ("1", "true", "yes"),
                    help="int8-quantize the modulation projections too "
                         "(default: follows --act_int8; set false to A/B "
                         "pure activation quant against weight-only "
                         "--int8 without the extra weight coverage)")
    return ap


def main(argv=None):
    args = make_parser().parse_args(argv)

    # reference --image_path overloading (src/<M>/main.py:34,47,87): a
    # .jsonl is the demo metadata list; with --evaluation a directory is
    # the dataset root — accept reference command lines unchanged
    if args.image_path:
        p = Path(args.image_path)
        if args.data_jsonl is None and p.suffix == ".jsonl":
            args.data_jsonl, args.image_path = args.image_path, None
        elif args.eval_dir is None and args.evaluation and p.is_dir():
            args.eval_dir, args.image_path = args.image_path, None
    if args.evaluation:
        # fail BEFORE the (minutes-long) weight load/compile, not with a
        # Path(None) TypeError afterwards
        if args.eval_dir is None:
            hint = (f" ({args.image_path!r} is not an existing directory)"
                    if args.image_path else "")
            raise SystemExit("--evaluation needs a dataset root: pass "
                             "--eval_dir (or the reference-style "
                             "--image_path) pointing at an existing "
                             "directory of task dirs" + hint)
        if not Path(args.eval_dir).is_dir():
            raise SystemExit(f"--eval_dir {args.eval_dir!r} is not a "
                             f"directory")

    from regione_tpu.utils.telemetry import enable_compile_cache
    enable_compile_cache()
    pipe = build_pipeline(args)
    if args.print_plan:
        from regione_tpu.core.schedule import (
            build_sigmas, build_stage_plan, calculate_shift, describe_plan)
        mu = calculate_shift(4096)
        plan = build_stage_plan(pipe.re, build_sigmas(
            pipe.re.num_inference_steps, mu=mu), pipe.gamma)
        print(describe_plan(plan))
    if args.num_warmup_runs:
        # warm on the first real input so the timed runs never include
        # XLA compile time — in every input mode (the reference's 3
        # warmup invocations, main.py:50-58)
        wpath, wprompt = _first_item(args)
        if wpath is None:
            raise SystemExit("--num_warmup_runs needs an input to warm on "
                             "(no --image_path/--data_jsonl/--eval_dir "
                             "items found)")
        img = load_image(wpath)
        for _ in range(args.num_warmup_runs):
            pipe(img, wprompt or "warmup", seed=args.seed,
                 width=args.size_level, height=args.size_level)
    if args.evaluation:
        run_evaluation(pipe, args)
    else:
        run_demo(pipe, args)


if __name__ == "__main__":
    main()
