"""Text/vision-language prompt encoders.

The reference backends embed prompts with large external encoders loaded
from the HF hub (Step1X/Qwen: Qwen2.5-VL via a connector; FLUX: T5-XXL +
CLIP pooled).  This module provides:

  * `HFTextEncoder` — wraps a local `transformers` checkpoint (torch, CPU)
    and returns numpy features.  The DiT consumes them as plain arrays, so
    prompt encoding runs once per prompt off the TPU hot path (exactly the
    reference's behavior: encode_prompt happens before the denoise loop,
    RegionE/Step1XEdit/inplace.py:231-255).
  * `MockTextEncoder` — deterministic seeded features for tests, benches,
    and environments without checkpoints (this container has no network
    egress, so the real encoders cannot be fetched here).

Both expose: encode(prompt) -> (embeds [1, T, D], pooled [1, P] | None,
mask [1, T]).
"""

from __future__ import annotations

import hashlib

import numpy as np


class MockTextEncoder:
    """Deterministic pseudo-embeddings: same prompt -> same features."""

    def __init__(self, dim: int, pooled_dim: int | None = None,
                 max_length: int = 128):
        self.dim = dim
        self.pooled_dim = pooled_dim
        self.max_length = max_length

    def encode(self, prompt: str):
        seed = int.from_bytes(
            hashlib.sha256(prompt.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        t = min(self.max_length, max(4, len(prompt.split()) + 2))
        emb = np.zeros((1, self.max_length, self.dim), np.float32)
        emb[:, :t] = rng.standard_normal((1, t, self.dim)).astype(np.float32)
        mask = np.zeros((1, self.max_length), bool)
        mask[:, :t] = True
        pooled = (rng.standard_normal((1, self.pooled_dim)).astype(np.float32)
                  if self.pooled_dim else None)
        return emb, pooled, mask


class HFTextEncoder:
    """transformers-backed encoder (torch CPU).  `kind` selects the feature
    extraction recipe; extend per backend as checkpoints are wired up."""

    def __init__(self, model_path: str, kind: str = "auto",
                 max_length: int = 128, device: str = "cpu"):
        import torch  # local import: torch stays off the TPU path
        from transformers import AutoModel, AutoTokenizer

        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModel.from_pretrained(
            model_path, torch_dtype=torch.float32).to(device).eval()
        self.max_length = max_length
        self.device = device

    def encode(self, prompt: str):
        torch = self.torch
        with torch.no_grad():
            toks = self.tokenizer(
                prompt, return_tensors="pt", padding="max_length",
                truncation=True, max_length=self.max_length).to(self.device)
            out = self.model(**toks, output_hidden_states=True)
            emb = out.last_hidden_state.float().cpu().numpy()
            pooled = getattr(out, "pooler_output", None)
            pooled = pooled.float().cpu().numpy() if pooled is not None else None
            mask = toks["attention_mask"].bool().cpu().numpy()
        return emb, pooled, mask
