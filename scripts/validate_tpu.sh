#!/usr/bin/env bash
# Reproduce the hardware validations on one TPU chip (the runs behind
# the README benchmark tables).  Last full pass: dev headline 2.82x,
# kernel max-rel <= 0.27%, fused partition bit-exact, 512-token
# padded-bias 2.78x with exact masked-token invariance, multichip
# dryrun OK.  Full-size rows: scripts/bench_fullsize.py.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== headline bench (Step1X dev topology, ~2.82x) ==="
python bench.py

echo "=== attention kernel vs XLA (hardware numerics) ==="
python - <<'EOF'
import os, numpy as np, jax.numpy as jnp, jax
os.environ["REGIONE_TPU_FLASH"] = "0"  # force the XLA reference path in sdpa
from regione_tpu.models.layers import sdpa
from regione_tpu.ops.flash_attention import flash_attention
def rand(s, seed): return jnp.asarray(np.random.default_rng(seed).standard_normal(s), jnp.bfloat16)
for t, s in [(8320, 8320), (1152, 8320)]:
    q, k, v = rand((1,4,t,128),0), rand((1,4,s,128),1), rand((1,4,s,128),2)
    w = np.asarray(jax.jit(sdpa)(q,k,v), np.float32)
    g = np.asarray(flash_attention(q,k,v), np.float32)
    print(f"q={t} kv={s}: max-rel {np.abs(w-g).max()/np.abs(w).max():.5f}")
EOF

echo "=== fused partition kernel (bit-exact vs XLA path) ==="
python - <<'EOF'
import numpy as np, jax.numpy as jnp
from regione_tpu.ops.partition_kernel import fused_partition
from regione_tpu.core.partition import remove_scattered_points, token_similarity
rng = np.random.default_rng(0); gh = gw = 64; s, d = gh*gw, 64
x0 = rng.standard_normal((1,s,d)).astype(np.float32)
cond = x0 + 0.3*rng.standard_normal((1,s,d)).astype(np.float32)
cond[0, :s//4] = rng.standard_normal((s//4, d)).astype(np.float32)
sim = token_similarity(jnp.asarray(x0), jnp.asarray(cond), "cosine")
want = np.asarray(remove_scattered_points(jnp.asarray(
    np.asarray(sim[0] <= 0.9).reshape(gh, gw)))).reshape(-1)
got = np.asarray(fused_partition(jnp.asarray(x0[0]), jnp.asarray(cond[0]),
                                 0.9, gh, gw, True))
print("mismatches:", int((got != want).sum()))
EOF

echo "=== 512-token padded text bias at bench scale ==="
# Reference Qwen/Step1X prompts run to ~512 tokens with asymmetric real
# lengths per CFG row; the bias must mask pad columns in every cache mode.
# Measured (this hardware): dense 11.44s regione 4.13s speedup 2.77x
# psnr 43.6 masked-token-invariance-err 0.0
python - <<'EOF'
import time, numpy as np, dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
def sync(x): return float(jnp.sum(x))
from regione_tpu.core.config import RegionEParams
from regione_tpu.models.mmdit import init_mmdit_jit as init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.base import EditInputs
from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline
GRID, T_TXT = 64, 512
cfg = get_config("step1x-edit:dev")
params = init_mmdit(jax.random.PRNGKey(0), cfg)
pipe = Step1XEditPipeline(cfg, params, RegionEParams().replace(
    threshold=0.88, cache_threshold=0.02))
rng = np.random.default_rng(110)
s = GRID*GRID; s_kv = 2*s
rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
lat0 = jnp.asarray(rng.standard_normal((1,s,cfg.in_channels)), jnp.float32)
bias = np.zeros((2,1,1,T_TXT+s_kv), np.float32)
bias[0,...,448:T_TXT] = -1e9   # positive prompt: 448 real tokens
bias[1,...,77:T_TXT] = -1e9    # negative prompt: 77 real tokens
ctx = EditInputs(
    txt=jnp.asarray(rng.standard_normal((2,T_TXT,cfg.txt_in_dim)), cfg.dtype),
    cond_latent=jnp.asarray(rng.standard_normal((1,s,cfg.in_channels)), jnp.float32),
    rope_img=rope_img, rope_txt=rope_txt,
    pooled=jnp.asarray(rng.standard_normal((2,cfg.pooled_dim)), cfg.dtype),
    txt_bias=jnp.asarray(bias))
m = np.zeros((GRID,GRID), bool); m[:GRID//2,:GRID//2] = True
fmask = jnp.asarray(m.reshape(-1))
out_d = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0]; sync(out_d)
t0=time.perf_counter(); out_d = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0]; sync(out_d); td=time.perf_counter()-t0
out_r, _ = pipe.edit_latents(lat0, ctx, GRID, GRID, forced_mask=fmask); sync(out_r)
t0=time.perf_counter(); out_r, _ = pipe.edit_latents(lat0, ctx, GRID, GRID, forced_mask=fmask); sync(out_r); tr=time.perf_counter()-t0
a,b = np.asarray(out_d,np.float64), np.asarray(out_r,np.float64)
psnr = 10*np.log10((a.max()-a.min())**2/((a-b)**2).mean())
txt2 = np.asarray(ctx.txt, np.float32).copy(); txt2[1, 300] = 777.0  # masked
ctx2 = dataclasses.replace(ctx, txt=jnp.asarray(txt2, cfg.dtype))
out_r2, _ = pipe.edit_latents(lat0, ctx2, GRID, GRID, forced_mask=fmask)
derr = float(jnp.max(jnp.abs(out_r - out_r2)))
print(f"dense {td:.2f}s regione {tr:.2f}s speedup {td/tr:.2f}x "
      f"psnr {psnr:.1f} masked-token-invariance-err {derr:.1e}")
assert derr == 0.0, "masked text token leaked into the output"
EOF

echo "=== multichip dryrun (8 virtual CPU devices) ==="
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -c "
import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
