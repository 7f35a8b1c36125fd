"""CLI for the per-task pixel metrics (reference metric_all_task.py:182-202)."""

from __future__ import annotations

import argparse

from regione_tpu.eval.metrics import run_all_tasks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder1", required=True, help="vanilla results root")
    ap.add_argument("--folder2", required=True, help="RegionE results root")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--no_lpips", action="store_true")
    ap.add_argument("--lpips_weights", default=None,
                    help=".npz from eval.lpips_jax.save_lpips_npz (same as "
                         "$REGIONE_LPIPS_WEIGHTS); enables the JAX LPIPS "
                         "path when the lpips package is absent")
    args = ap.parse_args(argv)
    if args.lpips_weights:
        import os
        os.environ["REGIONE_LPIPS_WEIGHTS"] = args.lpips_weights
    res = run_all_tasks(args.folder1, args.folder2, args.out_dir,
                        with_lpips=not args.no_lpips)
    for task, rows in res.items():
        if rows:
            import numpy as np
            print(f"{task}: n={len(rows)} "
                  f"psnr={np.mean([r['psnr'] for r in rows]):.3f} "
                  f"ssim={np.mean([r['ssim'] for r in rows]):.4f}")


if __name__ == "__main__":
    main()
