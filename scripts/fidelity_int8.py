"""Quantization fidelity at PRODUCTION width (hidden=3072, heads=24).

VERDICT r2 weak #4: the FULLSIZE PSNR numbers compare RegionE-vs-dense of
the *same int8 model*; the weight-format drift itself (bf16 -> weight-only
int8 -> W8A8) was only ever bounded at dev width.  This probe runs a
full-WIDTH, few-block Step1X-topology slice on CPU/virtual and measures
each format's forward (and short-trajectory) error against an fp32 master,
so the quantization claims rest on production-shape numerics:

    fp32 master  ->  bf16          (the production baseline format)
                 ->  int8 weights  (FULLSIZE rows)
                 ->  W8A8          (FULLSIZE_*_W8A8 rows)
                 ->  int4 weights  (FULLSIZE_QWEN60 / FULLSIZE_1024 rows;
                                    nibble-packed, group-128 scales,
                                    int4 modulations)

Error metric: SNR in dB, 10*log10(sum(ref^2)/sum(err^2)) — the same
signal-to-error figure quoted for the dev-scale cross-mode drift
(NOTES_ROUND3; 65.4 dB W8A8-vs-weight-only at dev width).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/fidelity_int8.py [--steps 8] [--grid 24]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def snr_db(ref, x) -> float:
    import numpy as np
    ref = np.asarray(ref, np.float64)
    err = np.asarray(x, np.float64) - ref
    denom = float((err * err).sum())
    if denom == 0.0:
        return float("inf")
    return 10.0 * float(np.log10((ref * ref).sum() / denom))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=24,
                    help="token grid (24 -> 576 noise + 576 cond rows)")
    ap.add_argument("--t-txt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8,
                    help="dense Euler steps for the trajectory-drift row "
                         "(0 = single forward only)")
    ap.add_argument("--depth-double", type=int, default=2)
    ap.add_argument("--depth-single", type=int, default=4)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from regione_tpu.models.mmdit import MODE_DENSE, init_mmdit, mmdit_forward
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.quant import quantize_params
    from regione_tpu.core.schedule import build_sigmas, calculate_shift

    # production WIDTH (the quantization-sensitive dimension), few blocks
    base = get_config("step1x-edit")
    cfg32 = dataclasses.replace(
        base, depth_double=args.depth_double, depth_single=args.depth_single,
        connector=None, dtype=jnp.float32)

    grid, t_txt = args.grid, args.t_txt
    s = grid * grid
    rng = np.random.default_rng(110)
    master = init_mmdit(jax.random.PRNGKey(0), cfg32)  # fp32 master

    # inputs at production scale statistics
    img = jnp.asarray(rng.standard_normal((1, 2 * s, cfg32.in_channels)),
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, t_txt, cfg32.txt_in_dim)),
                      jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg32.pooled_dim)),
                         jnp.float32)
    # rope tables via a throwaway pipeline instance (params unused for rope)
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    from regione_tpu.pipelines.base import EditPipelineBase
    pipe = EditPipelineBase(cfg32, None, RegionEParams(),
                            gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)
    t_sig = jnp.full((1,), 0.7, jnp.float32)

    def fwd(params, cfg, img_in):
        v, _ = mmdit_forward(params, cfg, img_in, txt, t_sig, rope_img,
                             rope_txt, pooled=pooled, mode=MODE_DENSE)
        return v

    # the four formats, each quantized/cast from the SAME master the way
    # the real loading path would (checkpoint bf16 -> quantize_params)
    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        master)
    cfg_bf = dataclasses.replace(cfg32, dtype=jnp.bfloat16)
    int8 = quantize_params(bf16, quantize_mods=True)
    int4 = quantize_params(bf16, quantize_mods=True, bits=4, int4_mods=True)
    cfg_w8a8 = dataclasses.replace(cfg_bf, act_int8=True)

    jfwd = jax.jit(fwd, static_argnums=(1,))
    print("[fidelity] forward x4 formats at hidden=3072, "
          f"{args.depth_double}+{args.depth_single} blocks, "
          f"{2 * s} img rows ...", file=sys.stderr)
    v_ref = jfwd(master, cfg32, img)
    v_bf16 = jfwd(bf16, cfg_bf, img)
    v_int8 = jfwd(int8, cfg_bf, img)
    v_w8a8 = jfwd(int8, cfg_w8a8, img)
    v_int4 = jfwd(int4, cfg_bf, img)

    out = {
        "width": cfg32.hidden, "heads": cfg32.heads,
        "depth": [args.depth_double, args.depth_single],
        "img_rows": 2 * s, "t_txt": t_txt,
        "forward_snr_db_vs_fp32": {
            "bf16": round(snr_db(v_ref, v_bf16), 1),
            "int8_weight_only": round(snr_db(v_ref, v_int8), 1),
            "w8a8": round(snr_db(v_ref, v_w8a8), 1),
            "int4_weight_only": round(snr_db(v_ref, v_int4), 1),
        },
        "forward_snr_db_int8_vs_bf16": round(snr_db(v_bf16, v_int8), 1),
        "forward_snr_db_w8a8_vs_int8": round(snr_db(v_int8, v_w8a8), 1),
        "forward_snr_db_int4_vs_bf16": round(snr_db(v_bf16, v_int4), 1),
    }

    if args.steps:
        # short dense Euler trajectory: drift accumulates across steps the
        # way a real edit accumulates it (conservative vs RegionE, which
        # reuses cached velocities on many steps)
        mu = calculate_shift(s)
        sigmas = build_sigmas(args.steps, mu=mu)

        lat_init = jnp.asarray(rng.standard_normal((1, s, cfg32.in_channels)),
                               jnp.float32)

        def run_traj(params, cfg):
            lat = lat_init
            for i in range(args.steps):
                x = jnp.concatenate([lat, img[:, s:]], axis=1)
                v = jfwd(params, cfg, x)[:, :s]
                lat = lat + (sigmas[i + 1] - sigmas[i]) * v.astype(
                    jnp.float32)
            return lat

        print(f"[fidelity] {args.steps}-step trajectories ...",
              file=sys.stderr)
        l_ref = run_traj(master, cfg32)
        l_bf16 = run_traj(bf16, cfg_bf)
        l_int8 = run_traj(int8, cfg_bf)
        l_w8a8 = run_traj(int8, cfg_w8a8)
        l_int4 = run_traj(int4, cfg_bf)
        out["trajectory_steps"] = args.steps
        out["trajectory_snr_db_vs_fp32"] = {
            "bf16": round(snr_db(l_ref, l_bf16), 1),
            "int8_weight_only": round(snr_db(l_ref, l_int8), 1),
            "w8a8": round(snr_db(l_ref, l_w8a8), 1),
            "int4_weight_only": round(snr_db(l_ref, l_int4), 1),
        }
        out["trajectory_snr_db_int8_vs_bf16"] = round(
            snr_db(l_bf16, l_int8), 1)
        out["trajectory_snr_db_w8a8_vs_int8"] = round(
            snr_db(l_int8, l_w8a8), 1)
        out["trajectory_snr_db_int4_vs_bf16"] = round(
            snr_db(l_bf16, l_int4), 1)

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
