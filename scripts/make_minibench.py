"""Generate the canned in-repo mini-benchmark (assets/minibench).

The real GEdit-Bench/Kontext-Bench sweep needs HF-hub downloads
(script/load_data.sh in the reference) and production checkpoints —
neither exists in an air-gapped container.  This stages the sweep so it
is a drop-in when they do: a small deterministic benchmark in exactly the
processed layout the CLI's --evaluation mode and the eval stack consume
(data/Processed/<bench>/<task>/{img/*.png, metadata.jsonl} — reference
data/preprocess.py), with procedurally generated source images (no
external assets) and GEdit-style instructions across three task types.

Regenerate with:  python scripts/make_minibench.py
Run the sweep:    bash scripts/run_minibench.sh <output_dir> [--mock]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "minibench")

# (task_type, key, instruction, scene seed) — instructions follow the
# GEdit-Bench phrasing style for the three most-contrastive task types
ITEMS = [
    ("color_alter", "mb_color_0",
     "change the red balloon to a blue balloon", 0),
    ("color_alter", "mb_color_1",
     "make the green field golden yellow", 1),
    ("subject-add", "mb_add_0",
     "add a small white bird in the sky", 2),
    ("subject-add", "mb_add_1",
     "add a wooden boat on the water", 3),
    ("background_change", "mb_bg_0",
     "replace the background with a snowy mountain", 4),
    ("background_change", "mb_bg_1",
     "change the background to a sunset beach", 5),
]


def scene(seed: int, size: int = 256) -> np.ndarray:
    """Deterministic structured scene: sky gradient + ground + shapes."""
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 1, size)[:, None, None]
    x = np.linspace(0, 1, size)[None, :, None]
    sky = np.array(rng.uniform(0.3, 0.9, 3))
    ground = np.array(rng.uniform(0.1, 0.6, 3))
    horizon = rng.uniform(0.45, 0.7)
    img = np.where(y < horizon, sky * (0.6 + 0.4 * (1 - y)),
                   ground * (0.5 + 0.5 * y))
    img = img + 0.0 * x
    # a few circles ("objects")
    yy, xx = np.mgrid[0:size, 0:size] / size
    for _ in range(3):
        cy, cx, r = rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8), rng.uniform(0.05, 0.15)
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        img[m] = rng.uniform(0, 1, 3)
    img = img + rng.normal(0, 0.01, img.shape)   # mild sensor noise
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    from PIL import Image
    tasks: dict[str, list] = {}
    for task, key, prompt, seed in ITEMS:
        tasks.setdefault(task, []).append((key, prompt, seed))
    for task, items in tasks.items():
        d = os.path.join(OUT, task)
        os.makedirs(os.path.join(d, "img"), exist_ok=True)
        with open(os.path.join(d, "metadata.jsonl"), "w") as fh:
            for key, prompt, seed in items:
                Image.fromarray(scene(seed)).save(
                    os.path.join(d, "img", f"{key}.png"), optimize=True)
                fh.write(json.dumps({
                    "key": key, "image": f"{key}.png", "prompt": prompt,
                    "task_type": task, "language": "en"}) + "\n")
    n = sum(len(v) for v in tasks.values())
    print(f"minibench: {n} items across {len(tasks)} tasks -> {OUT}")


if __name__ == "__main__":
    main()
