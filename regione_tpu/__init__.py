"""RegionE-TPU: a TPU-native, training-free acceleration framework for
instruction-based image editing with flow-matching diffusion transformers.

This is a from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
reference `Peyton-Chen/RegionE` project (a CUDA/torch/diffusers plugin).
It is NOT a port: the denoise loop is compiled end-to-end under `jax.jit`
with a statically precomputed stage plan, token selection uses a
static-capacity index formulation (XLA needs static shapes), the
Region-Instruction KV cache is a loop-carried pytree updated with
scatter/where, and the hot kernels (flash attention over mixed
edited-query x full-KV, fused region partition) are Pallas TPU kernels.

Public surface (parity with `RegionE/tool/RegionE.py:9-51` in the
reference): `RegionEHelper(pipeline).set_params(...)/.enable()/.disable()`.
"""

__version__ = "0.1.0"

from regione_tpu.api import RegionEHelper, BACKEND_DEFAULTS  # noqa: F401
from regione_tpu.core.config import RegionEParams  # noqa: F401
