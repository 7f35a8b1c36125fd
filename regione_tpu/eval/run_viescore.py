"""CLI for the VIEScore sweep (reference run_gedit_score.py:68-166).

Walks every task dir under --data_dir (each with metadata.jsonl + a
generation/ folder of edited images), scores SC/PQ/O per item with the
selected backbone, resumes per-task if the CSV already exists, and prints
the aggregated statistics."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from regione_tpu.eval.viescore import (
    DryRunBackbone, OpenAIBackbone, VIEScore, run_task)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="processed benchmark root (tasks with metadata.jsonl)")
    ap.add_argument("--gen_root", default=None,
                    help="results root holding <task>/generation; defaults "
                         "to --data_dir")
    ap.add_argument("--backbone", default="gpt4o",
                    choices=["gpt4o", "gemini", "qwen25vl", "dryrun"])
    ap.add_argument("--model_name", default="gpt-4.1")
    ap.add_argument("--key_path", default=None)
    ap.add_argument("--vlm_path", default=None,
                    help="local VLM checkpoint dir (qwen25vl backbone)")
    ap.add_argument("--workers", type=int, default=6)
    args = ap.parse_args(argv)

    if args.backbone == "gpt4o":
        assert args.key_path, "--key_path required for the gpt4o backbone"
        backbone = OpenAIBackbone(args.key_path, args.model_name)
    elif args.backbone == "gemini":
        from regione_tpu.eval.viescore import GeminiBackbone
        key = (open(args.key_path).read().split()[0]
               if args.key_path else None)  # else $GEMINI_API_KEY
        backbone = GeminiBackbone(api_key=key,
                                  model_name=args.model_name
                                  if args.model_name.startswith("gemini")
                                  else "gemini-1.5-pro")
    elif args.backbone == "qwen25vl":
        from regione_tpu.eval.viescore import LocalVLMBackbone
        assert args.vlm_path, "--vlm_path required for the qwen25vl backbone"
        backbone = LocalVLMBackbone(args.vlm_path)
    else:
        backbone = DryRunBackbone()
    scorer = VIEScore(backbone)

    root = Path(args.data_dir)
    gen_root = Path(args.gen_root or args.data_dir)
    csvs = []
    for task in sorted(p for p in root.iterdir() if p.is_dir()):
        if not (task / "metadata.jsonl").exists():
            continue
        gen = gen_root / task.name / "generation"
        if not gen.is_dir():
            continue
        out_csv = gen_root / task.name / f"{args.backbone}_vie_score.csv"
        rows = run_task(scorer, str(task), str(gen), str(out_csv),
                        workers=args.workers)
        csvs.append(str(out_csv))
        print(f"{task.name}: {len(rows)} scored")
    from regione_tpu.eval.viescore import write_score_artifacts
    stats = write_score_artifacts(csvs, str(gen_root), args.backbone)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
