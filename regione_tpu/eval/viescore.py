"""VIEScore semantic evaluation harness (GPT-4.1 / local VLM backbones).

Port of the reference evaluation/GEdit-Bench stack:
  * SC (semantic consistency) + PQ (perceptual quality) prompting and the
    overall score O = sqrt(min(SC) * min(PQ))   (viescore/__init__.py:91-95)
  * threaded runner with linear-backoff retry    (run_gedit_score.py:24-61)
  * per-task CSV with resume-by-existing-file    (run_gedit_score.py:109-115)
  * statistics aggregator                        (calculate_statistics.py:11-72)

Prompts are written to the VIEScore recipe (Ku et al., 2023) rather than
copied verbatim from the reference's vie_prompts.py.  The OpenAI-compatible
client reads keys from a key file and rotates on auth/rate errors
(mllm_tools/openai.py:84-93,159-171).  Everything degrades gracefully when
no API access exists (this container has zero egress): `DryRunBackbone`
returns deterministic pseudo-scores so the plumbing stays testable.
"""

from __future__ import annotations

import csv
import json
import math
import re
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

_SC_PROMPT = (
    "You are a professional digital artist evaluating an AI-edited image.\n"
    "RULES: two images are given — the first is the original, the second is "
    "the edited result. The editing instruction is: {instruction}\n"
    "On a scale of 0 to 10, rate (1) how well the edit follows the "
    "instruction and (2) the degree to which the rest of the image was "
    "preserved (over-editing scores low).\n"
    'Answer with JSON only: {{"score": [score1, score2], "reasoning": "..."}}'
)

_PQ_PROMPT = (
    "You are a professional digital artist judging an AI-generated image.\n"
    "On a scale of 0 to 10, rate (1) how natural the image looks and (2) "
    "how free it is of artifacts (distortions, duplicated or broken "
    "structures, blur, watermarks).\n"
    'Answer with JSON only: {{"score": [score1, score2], "reasoning": "..."}}'
)


def parse_scores(text: str) -> list[float]:
    """Extract the score list from a (possibly sloppy) model reply
    (equivalent of viescore/utils.py mllm_output_to_dict)."""
    m = re.search(r"\{.*\}", text, re.DOTALL)
    if m:
        try:
            blob = json.loads(m.group(0))
            s = blob.get("score")
            if isinstance(s, (int, float)):
                return [float(s)]
            if isinstance(s, list):
                return [float(x) for x in s]
        except (json.JSONDecodeError, TypeError, ValueError):
            pass
    nums = re.findall(r"\b(\d+(?:\.\d+)?)\b", text)
    return [float(x) for x in nums[:2]] if nums else []


class DryRunBackbone:
    """Deterministic pseudo-scorer for plumbing tests / no-API environments."""

    def get_parsed_output(self, prompt: str, images: list) -> str:
        seed = abs(hash(prompt)) % 1000 / 1000
        return json.dumps({"score": [round(5 + 4 * seed, 1),
                                     round(5 + 3 * (1 - seed), 1)],
                           "reasoning": "dry-run"})


class OpenAIBackbone:
    """GPT-4.1 via the OpenAI API with key rotation on failures
    (reference mllm_tools/openai.py)."""

    def __init__(self, key_path: str, model_name: str = "gpt-4.1",
                 base_url: str | None = None):
        keys = [k.strip() for k in open(key_path) if k.strip()]
        assert keys, f"no API keys in {key_path}"
        self.keys = keys
        self.key_idx = 0
        self.model_name = model_name
        self.base_url = base_url

    def _client(self):
        from openai import OpenAI  # optional dep
        return OpenAI(api_key=self.keys[self.key_idx], base_url=self.base_url)

    def get_parsed_output(self, prompt: str, images: list) -> str:
        import base64
        import io
        from PIL import Image
        content = [{"type": "text", "text": prompt}]
        for img in images:
            buf = io.BytesIO()
            Image.fromarray(np.asarray(img)).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            content.append({"type": "image_url",
                            "image_url": {"url": f"data:image/png;base64,{b64}"}})
        try:
            resp = self._client().chat.completions.create(
                model=self.model_name,
                messages=[{"role": "user", "content": content}],
                max_tokens=400)
            return resp.choices[0].message.content or ""
        except Exception:
            self.key_idx = (self.key_idx + 1) % len(self.keys)  # rotate
            raise


class LocalVLMBackbone:
    """Local vision-language judge via transformers (torch CPU/GPU) — the
    reference's Qwen2.5-VL scoring path (mllm_tools/qwen25vl_eval.py).
    Requires a locally available checkpoint (no hub download here)."""

    def __init__(self, model_path: str, device: str = "cpu",
                 max_new_tokens: int = 400):
        import torch
        from transformers import AutoModelForVision2Seq, AutoProcessor
        self.torch = torch
        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = AutoModelForVision2Seq.from_pretrained(
            model_path, torch_dtype=torch.float32).to(device).eval()
        self.device = device
        self.max_new_tokens = max_new_tokens

    def get_parsed_output(self, prompt: str, images: list) -> str:
        from PIL import Image
        torch = self.torch
        pil = [Image.fromarray(np.asarray(im)) for im in images]
        content = [{"type": "image"} for _ in pil] + [
            {"type": "text", "text": prompt}]
        chat = self.processor.apply_chat_template(
            [{"role": "user", "content": content}],
            add_generation_prompt=True)
        inputs = self.processor(text=chat, images=pil,
                                return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model.generate(**inputs,
                                      max_new_tokens=self.max_new_tokens)
        new_tokens = out[0][inputs["input_ids"].shape[1]:]
        return self.processor.decode(new_tokens, skip_special_tokens=True)


class VIEScore:
    """SC/PQ/O scoring of one (source, edited, instruction) triple
    (reference viescore/__init__.py:10-101)."""

    def __init__(self, backbone):
        self.backbone = backbone

    def evaluate(self, images: list, instruction: str) -> dict:
        src, edited = images
        sc_raw = self.backbone.get_parsed_output(
            _SC_PROMPT.format(instruction=instruction), [src, edited])
        pq_raw = self.backbone.get_parsed_output(_PQ_PROMPT, [edited])
        sc = parse_scores(sc_raw) or [0.0]
        pq = parse_scores(pq_raw) or [0.0]
        o = math.sqrt(max(min(sc), 0.0) * max(min(pq), 0.0))
        return {"sc": min(sc), "pq": min(pq), "o": o,
                "sc_raw": sc, "pq_raw": pq}


def process_with_retry(fn, *args, max_tries: int = 10000,
                       backoff: float = 1.0, **kw):
    """Linear-backoff retry loop (reference run_gedit_score.py:31-61)."""
    for attempt in range(max_tries):
        try:
            return fn(*args, **kw)
        except Exception:
            if attempt == max_tries - 1:
                raise
            time.sleep(min(backoff * (attempt + 1), 30.0))


def run_task(scorer: VIEScore, task_dir: str, gen_dir: str, out_csv: str,
             workers: int = 6) -> list[dict]:
    """Score one task dir; resumes (skips) if out_csv exists
    (reference run_gedit_score.py:109-115, 133-154)."""
    out_path = Path(out_csv)
    if out_path.exists():
        return list(csv.DictReader(open(out_path)))
    from PIL import Image
    meta = {}
    for line in open(Path(task_dir) / "metadata.jsonl"):
        item = json.loads(line)
        meta[item.get("key") or Path(item["image"]).stem] = item

    def one(key):
        item = meta[key]
        src = np.asarray(Image.open(
            Path(task_dir) / "img" / item["image"]).convert("RGB"))
        edited = np.asarray(Image.open(
            Path(gen_dir) / f"{key}.png").convert("RGB"))
        r = process_with_retry(scorer.evaluate, [src, edited], item["prompt"])
        return {"key": key, "sc": r["sc"], "pq": r["pq"], "o": r["o"]}

    keys = [k for k in meta if (Path(gen_dir) / f"{k}.png").exists()]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        rows = list(ex.map(one, keys))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["key", "sc", "pq", "o"])
        w.writeheader()
        w.writerows(rows)
    return rows


def analyze_scores(csv_paths: list[str]) -> dict:
    """Per-task and overall SC/PQ/O means
    (reference calculate_statistics.py:11-72)."""
    per_task, all_rows = {}, []
    for p in csv_paths:
        rows = list(csv.DictReader(open(p)))
        if not rows:
            continue
        stats = {k: float(np.mean([float(r[k]) for r in rows]))
                 for k in ("sc", "pq", "o")}
        per_task[Path(p).parent.name] = {**stats, "n": len(rows)}
        all_rows += rows
    overall = ({k: float(np.mean([float(r[k]) for r in all_rows]))
                for k in ("sc", "pq", "o")} if all_rows else {})
    return {"per_task": per_task, "overall": overall,
            "n": len(all_rows)}
