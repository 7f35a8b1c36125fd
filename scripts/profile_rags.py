"""Surgical timing of the RegionE hot path at dev scale (VERDICT item 7).

Breaks the ~4.1 s RegionE end-to-end into its compiled pieces and times
each on hardware, to locate the remaining RAGS-phase overhead vs the
structural ceiling (~3.05x at 9 dense + 19 accelerated steps):

  dense-fwd       one dense cache-write forward (the refresh/STS unit)
  rags-fwd        one gathered RAGS forward (edited-cap queries, KV cache)
  rags-scan-k     a lax.scan of k consecutive RAGS forwards (steady state)
  attn-only       the Pallas attention alone at the RAGS shape
  qkv-only        the projection matmuls alone at the RAGS active rows
  scatter-only    the KV-row cache scatter alone

Prints one JSON line with per-piece times.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, sync=None):
    import jax.numpy as jnp
    out = fn(*args)
    (sync or (lambda x: float(jnp.sum(x[0] if isinstance(x, tuple) else x))))(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        (sync or (lambda x: float(jnp.sum(
            x[0] if isinstance(x, tuple) else x))))(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import argparse
    import dataclasses
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--cache-int8", action="store_true")
    ap.add_argument("--scan-only", action="store_true",
                    help="only the steady-state scan numbers (fast sweep)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from regione_tpu.core.config import RegionEParams
    from regione_tpu.models.mmdit import init_cache, init_mmdit_jit
    from regione_tpu.models.presets import get_config
    from regione_tpu.ops.flash_attention import flash_attention
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline

    GRID, T_TXT, CAP = 64, 128, args.cap
    cfg = dataclasses.replace(get_config("step1x-edit:dev"),
                              cache_int8=args.cache_int8)
    params = init_mmdit_jit(jax.random.PRNGKey(0), cfg)
    pipe = Step1XEditPipeline(cfg, params, RegionEParams())
    rng = np.random.default_rng(0)
    s = GRID * GRID
    s_kv = 2 * s
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    ctx = EditInputs(
        txt=jnp.asarray(rng.standard_normal((2, T_TXT, cfg.txt_in_dim)), cfg.dtype),
        cond_latent=jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                                jnp.float32),
        rope_img=rope_img, rope_txt=rope_txt,
        pooled=jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)), cfg.dtype),
        extra={"params": params, "s_noise": s},
    )
    lat = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)
    lat_act = jnp.asarray(rng.standard_normal((1, CAP, cfg.in_channels)),
                          jnp.float32)
    ids = jnp.asarray(np.arange(CAP, dtype=np.int32))
    cache = init_cache(cfg, 2, s_kv, T_TXT)

    res = {"cap": CAP, "cache_int8": args.cache_int8,
           "flash": os.environ.get("REGIONE_TPU_FLASH", "default")}

    # NOTE: single-call timings on the remote axon backend carry ~25 ms of
    # scalar-readback sync latency; the scan-of-8 numbers (one sync per 8
    # steps) are the reliable ones.
    def scan8_dense(l, c, ctx):
        def body(carry, sig):
            l, c = carry
            v, c = pipe.dense_forward(l, sig, c, ctx, True)
            return (l + 0.01 * v.astype(jnp.float32), c), None
        (l, c), _ = jax.lax.scan(
            body, (l, c), jnp.linspace(0.9, 0.4, 8).astype(jnp.float32))
        return l
    res["dense_scan8_ms"] = timeit(jax.jit(scan8_dense), lat, cache, ctx) * 1e3

    if not args.scan_only:
        dense = jax.jit(lambda l, c, ctx: pipe.dense_forward(
            l, jnp.float32(0.7), c, ctx, True))
        res["dense_fwd_ms"] = timeit(dense, lat, cache, ctx) * 1e3

        rags = jax.jit(lambda la, c, i, ctx: pipe.rags_forward(
            la, jnp.float32(0.5), c, i, ctx))
        res["rags_fwd_ms"] = timeit(rags, lat_act, cache, ids, ctx) * 1e3

    def scan8(la, c, i, ctx):
        def body(carry, sig):
            la, c = carry
            v, c = pipe.rags_forward(la, sig, c, i, ctx)
            return (la + 0.01 * v.astype(jnp.float32), c), None
        (la, c), _ = jax.lax.scan(
            body, (la, c), jnp.linspace(0.6, 0.3, 8).astype(jnp.float32))
        return la
    res["rags_scan8_ms"] = timeit(jax.jit(scan8), lat_act, cache, ids, ctx) * 1e3

    if args.scan_only:
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                          for k, v in res.items()}))
        return

    # attention alone at the RAGS shape: q rows = txt + cap, kv = full
    h, dh = cfg.heads, cfg.head_dim
    q = jnp.asarray(rng.standard_normal((2, h, T_TXT + CAP, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, h, T_TXT + s_kv, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, h, T_TXT + s_kv, dh)), jnp.bfloat16)
    att = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    res["attn_rags_ms_x24"] = timeit(att, q, k, v) * 1e3 * (
        cfg.depth_double + cfg.depth_single)

    # projection matmuls alone on the active rows (qkv of one dbl block x L)
    wq = jnp.asarray(rng.standard_normal((cfg.hidden, 3 * cfg.inner)),
                     jnp.bfloat16)
    xact = jnp.asarray(rng.standard_normal((2, T_TXT + CAP, cfg.hidden)),
                       jnp.bfloat16)
    proj = jax.jit(lambda x, w: x @ w)
    res["qkv_proj_ms_x24"] = timeit(proj, xact, wq) * 1e3 * (
        cfg.depth_double + cfg.depth_single)

    # cache row scatter alone (one block's K update, x2 tensors x L blocks)
    rows = jnp.asarray(rng.standard_normal((2, T_TXT + CAP, cfg.inner)),
                       jnp.bfloat16)
    cache_k = cache["sk"][0]
    sel = jnp.asarray(np.arange(T_TXT + CAP, dtype=np.int32))
    scat = jax.jit(lambda c, r, i: c.at[:, i, :].set(r, mode="drop",
                                                     unique_indices=True))
    res["scatter_ms_x48"] = timeit(scat, cache_k, rows, sel) * 1e3 * 2 * (
        cfg.depth_double + cfg.depth_single)

    # the closed-form AVD reuse run (should be ~0)
    reuse = jax.jit(lambda la, a: la + 0.05 * a)
    res["avd_reuse_ms"] = timeit(reuse, lat_act, lat_act) * 1e3

    res = {k: round(v, 2) for k, v in res.items()}
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
