"""Generate a synthetic demo set (images + data.jsonl) for smoke runs.

The reference ships a 5-image demo set (assets/data.jsonl); this container
has no network access, so we synthesize deterministic test images with
text-like and object-like structures that give the edit pipeline something
spatially localized to act on.

Usage: python examples/make_demo.py [--out examples/demo] [--n 5]
Then:  regione-tpu --use_regione --data_jsonl examples/demo/data.jsonl ...
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

PROMPTS = [
    "change the word 'SUMMER' to 'WINTER'",
    "remove the red circle",
    "change the background to a sunset",
    "make the square blue",
    "add falling snow",
]


def synth_image(seed: int, size: int = 512) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 255, np.uint8)
    # background gradient
    g = np.linspace(120, 230, size, dtype=np.uint8)
    img[..., 2] = g[None, :]
    img[..., 1] = g[:, None] // 2 + 90
    # a few solid shapes (localized edit targets)
    smax = max(size // 5, 8)
    for _ in range(4):
        y, x = rng.integers(0, max(size - smax, 1), 2)
        h, w = rng.integers(max(smax // 2, 4), smax, 2)
        color = rng.integers(0, 255, 3)
        img[y:y + h, x:x + w] = color
    # circle
    yy, xx = np.mgrid[:size, :size]
    cy, cx, r = rng.integers(size // 4, 3 * size // 4, 2).tolist() + [size // 8]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    img[mask] = [200, 40, 40]
    return img


def main(argv=None):
    from PIL import Image
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/demo")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "data.jsonl", "w") as fh:
        for i in range(args.n):
            path = out / f"demo_{i}.png"
            Image.fromarray(synth_image(i, args.size)).save(path)
            fh.write(json.dumps({"image": str(path),
                                 "prompt": PROMPTS[i % len(PROMPTS)]}) + "\n")
    print(f"wrote {args.n} images + data.jsonl under {out}")


if __name__ == "__main__":
    main()
