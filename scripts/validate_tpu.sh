#!/usr/bin/env bash
# Reproduce the round-1 hardware validations on one TPU chip.
# (These are the runs behind the README benchmark table.)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== headline bench (Step1X dev topology, 2.78x) ==="
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

echo "=== multichip dryrun (8 virtual CPU devices) ==="
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -c "
import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
