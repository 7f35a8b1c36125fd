"""Empirical accounting for the benchmark prompt length t_txt (VERDICT r4
item 8) — what the Qwen-family prompt EMBEDDING length actually is.

Round-4 docs justified t_txt=128 with "GEdit instructions embed to
~30-100 tokens".  That counts only the instruction text and misses the
dominant term: the reference's Qwen pipelines condition the prompt on the
IMAGE — `prompt_image` is the edit target resized to the output
resolution (RegionE/QwenImageEdit/inplace.py:220-222) fed through the
Qwen2.5-VL processor, whose vision tokens land INSIDE the prompt
embedding (after the template-prefix drop, the retained hidden states are
[vision tokens ‖ instruction ‖ turn suffix]).  The reference then caps
everything at max_sequence_length=512
(RegionE/QwenImageEdit/inplace.py:96 default; diffusers encode_prompt
truncates to it).

This script computes, from in-container artifacts only (no egress):

  1. EXACT vision-token counts via transformers'
     Qwen2VLImageProcessor.smart_resize (the class ships with the library;
     no weights needed) for the image recipes each backend uses, under the
     library-default pixel budget (min 3136 / max 1003520).  The
     checkpoint-shipped preprocessor_config.json may override max_pixels —
     egress-gated, so both the computed default and the 384^2-area
     fallback (the Plus condition recipe, 196 tokens) are reported.
  2. Instruction word counts over every instruction set in the container
     (reference assets/data.jsonl + assets/minibench) with a BPE estimate
     of tokens ~= 1.3 x words + 3 (English BPE averages 1.2-1.4
     tokens/word; the Qwen2 tokenizer files are egress-gated).
  3. The implied benchmark t_txt per backend, bracketed against the
     reference's 512 hard cap.

Usage: python scripts/t_txt_analysis.py   (CPU; prints a markdown table)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def vision_tokens(h: int, w: int, max_pixels: int | None = None) -> int:
    """Merged vision-token count for an h x w image through the Qwen2.5-VL
    processor (patch 14, merge 2 -> 28 px effective; smart_resize caps
    total pixels at max_pixels)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor, smart_resize)
    pr = Qwen2VLImageProcessor()
    rh, rw = smart_resize(h, w, factor=pr.patch_size * pr.merge_size,
                          min_pixels=pr.min_pixels,
                          max_pixels=max_pixels or pr.max_pixels)
    return (rh // 28) * (rw // 28)


def instruction_stats() -> dict:
    """Word counts over every in-container instruction set."""
    sets = {
        "reference assets/data.jsonl": "/root/reference/assets/data.jsonl",
        "repo minibench": None,  # expanded below
    }
    words = []
    srcs = []
    p = sets["reference assets/data.jsonl"]
    if os.path.exists(p):
        for line in open(p):
            item = json.loads(line)
            words.append(len(item["instruction"].split()))
            srcs.append("demo")
    mb = os.path.join(REPO, "assets", "minibench")
    if os.path.isdir(mb):
        for root, _, files in os.walk(mb):
            for f in files:
                if f == "metadata.jsonl":
                    for line in open(os.path.join(root, f)):
                        item = json.loads(line)
                        words.append(len(item.get(
                            "prompt", item.get("instruction", "")).split()))
                        srcs.append("minibench")
    if not words:  # no reference mounts / minibench in this checkout —
        return None  # the vision-token analysis below still runs
    w = np.asarray(words)
    est = np.round(1.3 * w + 3).astype(int)  # BPE estimate
    return {"n": len(w), "words_min": int(w.min()), "words_max": int(w.max()),
            "words_mean": float(w.mean()),
            "tok_est_min": int(est.min()), "tok_est_max": int(est.max()),
            "tok_est_mean": float(est.mean())}


def main():
    ins = instruction_stats()
    if ins is None:
        print("instruction sets in container: none found "
              "(no reference data.jsonl / assets/minibench)")
    else:
        print(f"instruction sets in container: n={ins['n']}, "
              f"words {ins['words_min']}-{ins['words_max']} "
              f"(mean {ins['words_mean']:.1f}); BPE-estimated tokens "
              f"{ins['tok_est_min']}-{ins['tok_est_max']} "
              f"(mean {ins['tok_est_mean']:.1f})")
    print()

    suffix = 5  # <|im_end|>\n<|im_start|>assistant\n remainder after drop
    rows = []
    # base Qwen-Image-Edit: prompt_image = output-resolution resize
    # (1024^2-area) through the processor
    v_default = vision_tokens(1024, 1024)             # library max_pixels
    v_384 = vision_tokens(384, 384)                   # 384^2-area fallback
    rows.append(("qwen-image-edit", "1024^2-area prompt_image, "
                 "library-default max_pixels", v_default))
    rows.append(("qwen-image-edit", "if checkpoint processor caps at "
                 "~384^2 (Plus condition recipe)", v_384))
    # Plus: per-reference 384^2-area condition images
    rows.append(("qwen-image-edit-plus", "384^2-area condition image "
                 "(CONDITION_IMAGE_SIZE recipe), single ref", v_384))

    print("| backend | vision recipe | vision tokens | + instr + suffix "
          "| implied t_txt (cap 512) |")
    print("|---|---|---|---|---|")
    # no instruction corpus in this checkout -> fall back to the GEdit
    # bracket measured from the reference's demo set (11-17 words)
    lo, hi = ((ins["tok_est_min"], ins["tok_est_max"]) if ins
              else (17, 25))
    for backend, recipe, v in rows:
        tot_lo, tot_hi = v + lo + suffix, v + hi + suffix
        cap_lo, cap_hi = min(tot_lo, 512), min(tot_hi, 512)
        print(f"| {backend} | {recipe} | {v} | {tot_lo}-{tot_hi} | "
              f"{cap_lo}-{cap_hi} |")
    print()
    print("reference hard cap: max_sequence_length=512 "
          "(RegionE/QwenImageEdit/inplace.py:96)")
    print("step1x-edit: same Qwen2.5-VL mechanism; its ref-image processor "
          "size lives in the forked diffusers branch (egress-gated) — "
          "bracket with the same two hypotheses")


if __name__ == "__main__":
    main()
