"""Evaluation-harness tests: metrics vs naive oracles, CSV/merge schema,
VIEScore plumbing, thinker loop."""

import csv
import json
import math
from pathlib import Path

import numpy as np
import pytest

from regione_tpu.eval import merge, metrics, viescore


def test_psnr_oracle():
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 10
    mse = 100 / (8 * 8 * 3)
    assert metrics.psnr(a, b) == pytest.approx(10 * math.log10(255 ** 2 / mse))
    assert metrics.psnr(a, a) == float("inf")


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert metrics.ssim(a, a) == pytest.approx(1.0)
    noisy = np.clip(a.astype(int) + rng.integers(-60, 60, a.shape), 0, 255
                    ).astype(np.uint8)
    s = metrics.ssim(a, noisy)
    assert 0.0 < s < 0.95


def test_ssim_against_naive_window_oracle():
    """Direct sliding-window SSIM (no filters) on a tiny grayscale image."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (16, 16)).astype(np.float64)
    b = np.clip(a + rng.integers(-30, 30, a.shape), 0, 255).astype(np.float64)
    win, dr = 7, 255.0
    c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
    vals = []
    n = win * win
    for i in range(16 - win + 1):
        for j in range(16 - win + 1):
            x = a[i:i + win, j:j + win].ravel()
            y = b[i:i + win, j:j + win].ravel()
            ux, uy = x.mean(), y.mean()
            vx, vy = x.var(ddof=1), y.var(ddof=1)
            vxy = ((x - ux) * (y - uy)).sum() / (n - 1)
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) /
                        ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    want = float(np.mean(vals))
    got = metrics.ssim(a, b)
    assert got == pytest.approx(want, abs=1e-6)


def test_metric_csv_and_merge(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(2)
    for task in ("TE", "CR"):
        for root in ("vanilla", "regione"):
            d = tmp_path / root / task / "generation"
            d.mkdir(parents=True)
            for k in range(2):
                img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"img_{k}.png")
                jitter = np.clip(img.astype(int) + (5 if root == "regione" else 0),
                                 0, 255).astype(np.uint8)
                Image.fromarray(jitter).save(d / f"img_{k}.png")
        json.dump({"num_item": 2, "ave": 1.5, "list": [1.4, 1.6]},
                  open(tmp_path / "regione" / task / "time_consuming.json", "w"))

    res = metrics.run_all_tasks(str(tmp_path / "vanilla"),
                                str(tmp_path / "regione"),
                                with_lpips=False)
    assert set(res) == {"TE", "CR"}
    rows = list(csv.reader(open(tmp_path / "regione" / "TE" / "metric.csv")))
    # reference column schema (metric_all_task.py:145-178): the reference
    # merger indexes these exact names on the tail row
    assert rows[0] == ["Filename", "PSNR", "SSIM", "LPIPS"]
    assert rows[-1][0] == "AVERAGE"

    # transcription of the reference merger's read (metric_merge.py:40-41):
    # pandas tail(1) -> index by uppercase column names
    import pandas as pd
    tail = pd.read_csv(tmp_path / "regione" / "TE" / "metric.csv"
                       ).tail(1).to_dict(orient="records")[0]
    assert {"PSNR", "SSIM", "LPIPS"} <= set(tail)

    text = merge.merge_direction(str(tmp_path / "regione"))
    assert "PSNR:" in text and "Latency: 1.5000" in text and "Prompts: 4" in text


def test_merge_reads_both_metric_csv_schemas(tmp_path):
    """Our merger reads a reference-produced metric.csv (uppercase
    columns) AND the pre-r4 lowercase header; an unknown header is an
    ERROR, not a silent skip."""
    for name, hdr in (("ref", "Filename,PSNR,SSIM,LPIPS"),
                      ("old", "file,psnr,ssim,lpips")):
        d = tmp_path / name / "TE"
        d.mkdir(parents=True)
        (d / "metric.csv").write_text(
            f"{hdr}\nimg.png,30.0,0.9,0.1\nAVERAGE,30.0,0.9,0.1\n")
        json.dump({"num_item": 1, "ave_time_consuming": 2.0,
                   "time_consuming_list": [2.0]},
                  open(d / "time_consuming.json", "w"))
        text = merge.merge_direction(str(tmp_path / name))
        assert "PSNR: 30.0000" in text and "SSIM: 0.9000" in text

    bad = tmp_path / "bad" / "TE"
    bad.mkdir(parents=True)
    (bad / "metric.csv").write_text("name,quality\nimg.png,9\n")
    with pytest.raises(ValueError, match="column"):
        merge.merge_direction(str(tmp_path / "bad"))


def test_merge_reads_reference_schema(tmp_path):
    """A time_consuming.json written by the REFERENCE CLI
    (src/Step1X-Edit/main.py:125: num_item/ave_time_consuming/
    time_consuming_list) must merge to the correct latency, not 0.0."""
    d = tmp_path / "ref" / "TE"
    d.mkdir(parents=True)
    json.dump({"num_item": 3, "ave_time_consuming": 2.0,
               "time_consuming_list": [1.5, 2.0, 2.5]},
              open(d / "time_consuming.json", "w"))
    text = merge.merge_direction(str(tmp_path / "ref"), is_pretrain=True)
    assert "Latency: 2.0000" in text and "Prompts: 3" in text


def test_merge_errors_on_unknown_timing_schema(tmp_path):
    """Neither schema present -> hard error, never a fabricated 0.0."""
    d = tmp_path / "bad" / "TE"
    d.mkdir(parents=True)
    json.dump({"n": 1, "mean_seconds": 9.9},
              open(d / "time_consuming.json", "w"))
    with pytest.raises(ValueError, match="refusing to fabricate"):
        merge.merge_direction(str(tmp_path / "bad"))


def test_viescore_parse_and_dryrun():
    assert viescore.parse_scores('{"score": [7, 8.5], "reasoning": "x"}') == [7.0, 8.5]
    s = viescore.VIEScore(viescore.DryRunBackbone())
    img = np.zeros((8, 8, 3), np.uint8)
    r = s.evaluate([img, img], "make it red")
    assert 0 <= r["o"] <= 10
    assert r["o"] == pytest.approx(math.sqrt(r["sc"] * r["pq"]))
    assert not r["guessed"]


def test_viescore_parse_sloppy_corpus():
    """The acceptance/rejection set of the reference's mllm_output_to_dict
    (evaluation/GEdit-Bench/viescore/utils.py:154-235) over sloppy replies."""
    p = viescore.parse_scores
    # delimiter-wrapped JSON
    assert p('||V^=^V||{"score": [6, 9], "reasoning": "ok"}||V^=^V||') == [6.0, 9.0]
    # JSON buried in prose, multi-line reasoning
    assert p('Sure! Here is my rating:\n{"score": [3, 4],\n'
             '"reasoning": "the\nedit is partial"}\nHope that helps.') == [3.0, 4.0]
    # scalar score coerced to a list
    assert p('{"score": 7, "reasoning": "fine"}') == [7.0]
    # near-JSON with bare keys (fix_json repair path)
    assert p('{score: [5, 6], reasoning: ok}') == [5.0, 6.0]
    # trailing comma
    assert p('{"score": [5, 6], "reasoning": "ok",}') == [5.0, 6.0]
    # bare list reply
    assert p('[6, 0]') == [6.0, 0.0]
    # bare integer reply
    assert p('8') == [8.0]
    # mild float spill clamps; out-of-scale rejects
    assert p('{"score": [10.3, 0]}') == [10.0, 0.0]
    assert p('{"score": [100, 5]}') is None
    assert p('{"score": [-3, 5]}') is None
    # scale text must NOT parse as scores (VERDICT r2 weak #3)
    assert p("On a scale of 0 to 10, I would need to see the image.") is None
    assert p("no numbers here") is None
    assert p('{"reasoning": "forgot the scores"}') is None
    assert p('{"score": ["high", "low"]}') is None
    assert p('{"score": [true, false]}') is None
    # expected-length validation
    assert p('{"score": [7]}', n_expected=2) is None
    assert p('[1, 2, 3]', n_expected=2) is None
    assert p('{"score": [7, 8]}', n_expected=2) == [7.0, 8.0]
    # non-finite literals (json.loads accepts NaN/Infinity) must reject,
    # not flow into the task means
    assert p('{"score": [NaN, 7]}') is None
    assert p('{"score": [Infinity, 7]}') is None


def test_prompts_render_literal_json_example():
    """Both judge prompts must show the model a single-braced JSON example:
    _SC_PROMPT after its .format pass, _PQ_PROMPT verbatim (it is sent
    without a .format pass)."""
    sc = viescore._SC_PROMPT.format(instruction="make it red")
    for prompt in (sc, viescore._PQ_PROMPT):
        assert "{{" not in prompt and "}}" not in prompt
        assert '{"score": [score1, score2]' in prompt


def test_gemini_blocked_response_degrades_to_parse_failure():
    """A safety-blocked Gemini response (resp.text raises ValueError) must
    surface as an unparseable reply (bounded retries + flagged guess), not
    an exception that loops the transport-retry path forever."""
    b = viescore.GeminiBackbone(api_key="k")

    class _BlockedResp:
        @property
        def text(self):
            raise ValueError("response was blocked by safety filters")

    class _Model:
        def generate_content(self, content):
            return _BlockedResp()

    b._model = _Model()
    assert b.get_parsed_output("rate this", [np.zeros((4, 4, 3), np.uint8)]) == ""


def test_gemini_backbone_construction(monkeypatch):
    """GeminiBackbone resolves the key from arg or $GEMINI_API_KEY and
    defers the SDK import until first use (so environments without
    google-generativeai can still construct/select other backbones)."""
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    with pytest.raises(AssertionError):
        viescore.GeminiBackbone()
    b = viescore.GeminiBackbone(api_key="k1", model_name="gemini-1.5-flash")
    assert b.api_key == "k1" and b.model_name == "gemini-1.5-flash"
    assert b._model is None  # SDK not imported at construction
    monkeypatch.setenv("GEMINI_API_KEY", "k2")
    assert viescore.GeminiBackbone().api_key == "k2"


def test_make_backbone_dispatch(monkeypatch, tmp_path):
    """make_backbone covers the reference's full dispatch table
    (viescore/__init__.py:18-40): gpt4o/gpt4v/gemini/idefics2/mantis/
    minicpmv/qwen25vl (+ this repo's dryrun), routing each local-judge name
    to the right wrapper class with its reference default checkpoint id."""
    built = {}

    class FakeLocal:
        def __init__(self, path, device="cpu"):
            built["local"] = path

    class FakeMini:
        def __init__(self, path, device="cpu"):
            built["mini"] = path

    monkeypatch.setattr(viescore, "LocalVLMBackbone", FakeLocal)
    monkeypatch.setattr(viescore, "MiniCPMVBackbone", FakeMini)

    assert isinstance(viescore.make_backbone("dryrun"),
                      viescore.DryRunBackbone)
    with pytest.raises(ValueError):
        viescore.make_backbone("nope")

    key = tmp_path / "keys.txt"
    key.write_text("sk-abc\n")
    b = viescore.make_backbone("gpt4o", key_path=str(key))
    assert b.model_name == "gpt-4.1"
    b = viescore.make_backbone("gpt4v", key_path=str(key))
    assert b.model_name == "gpt-4-vision-preview"
    # explicit model ids pass through verbatim (ADVICE r3: never silently
    # substitute the default — "models/..." and "tunedModels/..." are valid)
    b = viescore.make_backbone("gemini", key_path=str(key),
                               model_name="models/gemini-1.5-pro")
    assert b.model_name == "models/gemini-1.5-pro" and b.api_key == "sk-abc"
    b = viescore.make_backbone("gemini", key_path=str(key))
    assert b.model_name == "gemini-1.5-pro"  # default only when unset

    for name in ("idefics2", "mantis", "qwen25vl"):
        viescore.make_backbone(name)
        assert built.pop("local") == viescore.LOCAL_JUDGE_DEFAULTS[name]
    viescore.make_backbone("minicpmv", vlm_path="/ckpt/minicpm")
    assert built.pop("mini") == "/ckpt/minicpm"


def test_minicpmv_backbone_chat_protocol():
    """MiniCPMVBackbone speaks the chat API (model.chat with msgs +
    tokenizer, sampling=False) rather than generate — the protocol the
    reference's minicpmv_eval.py wrapper uses."""
    class FakeChatModel:
        def chat(self, image, msgs, tokenizer, sampling):
            assert sampling is False and tokenizer == "tok"
            assert msgs[0]["role"] == "user"
            kinds = [c["type"] for c in msgs[0]["content"]]
            assert kinds == ["image", "image", "text"]
            return '{"score": [6, 7]}'

    b = viescore.MiniCPMVBackbone.__new__(viescore.MiniCPMVBackbone)
    b.model, b.tokenizer = FakeChatModel(), "tok"
    img = np.zeros((4, 4, 3), np.uint8)
    assert viescore.parse_scores(
        b.get_parsed_output("rate", [img, img])) == [6.0, 7.0]


def test_viescore_give_up_parsing():
    """An unparseable judge reply raises (so the runner re-queries); with
    give_up_parsing it degrades to a flagged neutral guess."""
    class ProseBackbone:
        def get_parsed_output(self, prompt, images):
            return "I would rate this somewhere between good and great."

    s = viescore.VIEScore(ProseBackbone())
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError):
        s.evaluate([img, img], "edit")
    r = s.evaluate([img, img], "edit", give_up_parsing=True)
    assert r["guessed"] and r["sc"] == 5.0 and r["pq"] == 5.0


def test_viescore_run_task_gives_up_on_prose(tmp_path):
    """run_task completes (with flagged guesses) when the judge only ever
    replies prose, instead of looping forever."""
    from PIL import Image
    task = tmp_path / "task"
    (task / "img").mkdir(parents=True)
    gen = tmp_path / "gen"
    gen.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(img).save(task / "img" / "k0.png")
    Image.fromarray(img).save(gen / "k0.png")
    with open(task / "metadata.jsonl", "w") as fh:
        fh.write(json.dumps({"key": "k0", "image": "k0.png",
                             "prompt": "edit"}) + "\n")

    calls = []

    class ProseBackbone:
        def get_parsed_output(self, prompt, images):
            calls.append(1)
            return "on a scale of 0 to 10 this is hard to say"

    out_csv = tmp_path / "scores" / "vie.csv"
    rows = viescore.run_task(viescore.VIEScore(ProseBackbone()), str(task),
                             str(gen), str(out_csv), parse_tries=2)
    assert len(rows) == 1
    assert float(rows[0]["sc"]) == 5.0 and float(rows[0]["o"]) == 5.0
    # the guess is flagged in the persisted CSV, not just in memory
    assert int(rows[0]["guessed"]) == 1
    persisted = list(csv.DictReader(open(out_csv)))
    assert persisted[0]["guessed"] == "1"
    # 2 parse attempts + 1 give-up pass, 2 backbone queries each
    assert len(calls) == 6


def test_viescore_task_runner_and_stats(tmp_path):
    from PIL import Image
    task = tmp_path / "task"
    (task / "img").mkdir(parents=True)
    gen = tmp_path / "gen"
    gen.mkdir()
    with open(task / "metadata.jsonl", "w") as fh:
        for k in range(3):
            img = np.full((8, 8, 3), k * 40, np.uint8)
            Image.fromarray(img).save(task / "img" / f"k{k}.png")
            Image.fromarray(img).save(gen / f"k{k}.png")
            fh.write(json.dumps({"key": f"k{k}", "image": f"k{k}.png",
                                 "prompt": f"edit {k}"}) + "\n")
    scorer = viescore.VIEScore(viescore.DryRunBackbone())
    out_csv = tmp_path / "task_scores" / "vie_score.csv"
    rows = viescore.run_task(scorer, str(task), str(gen), str(out_csv))
    assert len(rows) == 3
    # resume: second call reads the csv instead of rescoring
    rows2 = viescore.run_task(scorer, str(task), str(gen), str(out_csv))
    assert len(rows2) == 3
    stats = viescore.analyze_scores([str(out_csv)])
    assert stats["n"] == 3 and "o" in stats["overall"]
    # reference-convention artifacts (calculate_statistics.py:105-114)
    stats2 = viescore.write_score_artifacts([str(out_csv)], str(tmp_path),
                                            "dryrun")
    merged = (tmp_path / "dryrun_voe_score_merged.txt").read_text()
    assert merged.startswith("Average: ")
    m = stats2["overall_task_mean"]
    assert merged == f"Average: {m['sc']:.3f}, {m['pq']:.3f}, {m['o']:.3f}"
    per_task = (tmp_path / "task_scores" /
                "dryrun_voe_score_mean.txt").read_text()
    assert len(per_task.split(", ")) == 3


def test_overall_task_mean_is_unweighted_over_tasks(tmp_path):
    """The reference's headline average weights each TASK equally, not
    each image (calculate_statistics.py:55-71) — with unbalanced task
    sizes the two conventions must differ accordingly."""
    a = tmp_path / "ta" / "v.csv"
    b = tmp_path / "tb" / "v.csv"
    for p, rows in ((a, [(2, 2, 2)]), (b, [(8, 8, 8), (8, 8, 8), (8, 8, 8)])):
        p.parent.mkdir()
        with open(p, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["key", "sc", "pq", "o"])
            w.writeheader()
            for i, (sc, pq, o) in enumerate(rows):
                w.writerow({"key": f"k{i}", "sc": sc, "pq": pq, "o": o})
    stats = viescore.analyze_scores([str(a), str(b)])
    assert stats["overall"]["o"] == pytest.approx((2 + 8 * 3) / 4)   # rows
    assert stats["overall_task_mean"]["o"] == pytest.approx(5.0)     # tasks


def test_retry_backoff():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    assert viescore.process_with_retry(flaky, backoff=0.0) == "ok"
    assert len(calls) == 3


def test_thinker_reflection_loop():
    from regione_tpu.pipelines.thinker import (
        EchoThinker, VLMThinker, edit_with_reflection)

    outs = []

    def fake_pipeline(image, prompt, seed=0, output_type="uint8"):
        outs.append(prompt)
        return np.zeros((4, 4, 3), np.uint8), None

    img, info = edit_with_reflection(fake_pipeline, np.zeros((4, 4, 3)),
                                     "add a hat", thinker=EchoThinker())
    assert info["reformat_prompt"] == "add a hat"
    assert len(info["images"]) == 1  # accepted first try

    # failing-then-succeeding VLM
    replies = iter([
        "rewritten: add a red hat",
        '{"score": [3, 4]} <#Failure> <#Prompt> add a LARGE red hat',
        '{"score": [8, 9]} <#Success>',
    ])

    def vlm(images, text):
        return next(replies)

    outs.clear()
    img, info = edit_with_reflection(
        fake_pipeline, np.zeros((4, 4, 3)), "add a hat",
        thinker=VLMThinker(vlm), max_try_cnt=3)
    assert len(info["images"]) == 2
    assert outs[1] == "add a LARGE red hat"
    assert info["best_info"]["success"]


def test_thinker_reflect_prose_and_failure_tag():
    """reflect must extract scores from prose VLM replies (local VLMs often
    skip the JSON framing) and an explicit <#Failure> tag must override the
    score heuristic."""
    from regione_tpu.pipelines.thinker import VLMThinker, _lenient_scores

    # prose numbers extract; scale mentions don't parse as scores
    assert _lenient_scores("I'd rate 8 and 9, nice work") == [8.0, 9.0]
    assert _lenient_scores("On a scale of 0 to 10: 7.5 then 6") == [7.5, 6.0]
    assert _lenient_scores("on a scale of 0-10 it is hard to say") is None

    def vlm_prose(images, text):
        return "I'd rate 8 and 9. Looks faithful and clean."

    ok, new_prompt, s1, s2 = VLMThinker(vlm_prose).reflect(
        None, None, "add a hat")
    assert ok and s1 == [8.0] and s2 == [9.0]
    assert new_prompt == "add a hat"

    def vlm_contradiction(images, text):
        return '{"score": [8, 9]} <#Failure> <#Prompt> try harder'

    ok, new_prompt, _, _ = VLMThinker(vlm_contradiction).reflect(
        None, None, "add a hat")
    assert not ok and new_prompt == "try harder"


def test_viescore_csv_reference_schema_interop(tmp_path):
    """Both directions of {backbone}_vie_score.csv interop: our CSV must
    satisfy a transcription of the reference stats read
    (calculate_statistics.py:26-39 — indexes key/edited_image/instruction/
    sementics_score/quality_score/instruction_language by name), and a
    reference-produced CSV must flow through our analyze_scores."""
    import math
    from PIL import Image

    task = tmp_path / "task"
    (task / "img").mkdir(parents=True)
    gen = tmp_path / "gen"
    gen.mkdir()
    with open(task / "metadata.jsonl", "w") as fh:
        img = np.full((8, 8, 3), 80, np.uint8)
        Image.fromarray(img).save(task / "img" / "k0.png")
        Image.fromarray(img).save(gen / "k0.png")
        # reference-schema metadata item (raw dataset dump: key +
        # instruction, no image/prompt fields)
        fh.write(json.dumps({"key": "k0", "instruction": "make it red",
                             "instruction_language": "en"}) + "\n")
    out_csv = tmp_path / "scores" / "dryrun_vie_score.csv"
    viescore.run_task(viescore.VIEScore(viescore.DryRunBackbone()),
                      str(task), str(gen), str(out_csv))

    import pandas as pd
    df = pd.read_csv(out_csv)
    sems, quals, overalls = [], [], []
    for _, row in df.iterrows():  # transcription of the reference loop
        if row["instruction_language"] != "en":
            continue
        assert row["key"] == "k0" and row["edited_image"] == "k0.png"
        assert row["instruction"] == "make it red"
        sems.append(row["sementics_score"])
        quals.append(row["quality_score"])
        overalls.append(math.sqrt(row["sementics_score"]
                                  * row["quality_score"]))
    assert len(sems) == 1

    # reference-produced CSV (no sc/pq/o columns, cn row filtered out)
    ref_csv = tmp_path / "TE" / "gpt4o_vie_score.csv"
    ref_csv.parent.mkdir()
    ref_csv.write_text(
        "key,edited_image,instruction,sementics_score,quality_score,"
        "instruction_language\n"
        "a,a.png,edit,8.0,6.0,en\n"
        "b,b.png,bianji,2.0,2.0,cn\n")
    stats = viescore.analyze_scores([str(ref_csv)])
    assert stats["n"] == 1
    assert stats["overall"]["sc"] == 8.0 and stats["overall"]["pq"] == 6.0
    assert stats["overall"]["o"] == pytest.approx(math.sqrt(48.0))
    # language=None keeps every row
    assert viescore.analyze_scores([str(ref_csv)], language=None)["n"] == 2


def test_preprocessor_writes_reference_readable_metadata(tmp_path,
                                                         monkeypatch):
    """Our preprocessed metadata.jsonl must satisfy the REFERENCE drivers,
    which index data["instruction"] and open img/{key}.png
    (src/Qwen-Image-Edit-2509/main.py:113-114)."""
    import sys
    import types
    from PIL import Image
    from regione_tpu.eval import preprocess

    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    fake_ds = [{"key": "k7", "task_type": "text_change",
                "instruction": "swap the words", "instruction_language": "en",
                "input_image": img},
               {"key": "k8", "task_type": "text_change",
                "instruction": "huan ci", "instruction_language": "cn",
                "input_image": img}]
    mod = types.SimpleNamespace(load_dataset=lambda *a, **k: fake_ds)
    monkeypatch.setitem(sys.modules, "datasets", mod)

    preprocess.GEditBenchProcessor(str(tmp_path / "src"),
                                   str(tmp_path / "out")).process()
    task = tmp_path / "out" / "GEdit-Bench" / "text_change"
    lines = [json.loads(l) for l in open(task / "metadata.jsonl")]
    assert len(lines) == 1  # cn filtered
    (item,) = lines
    # the reference driver's exact reads
    assert item["instruction"] == "swap the words"
    assert item["instruction_language"] == "en"
    assert (task / "img" / f"{item['key']}.png").exists()
    # our short alias stays
    assert item["prompt"] == item["instruction"]


def test_write_score_artifacts_language_threading(tmp_path):
    """A cn GEdit sweep must not silently produce empty statistics
    (round-4 review): language threads write_score_artifacts ->
    analyze_scores; the default stays the reference's en filter."""
    import csv as csvmod
    from regione_tpu.eval.viescore import write_score_artifacts
    task = tmp_path / "color_alter"
    task.mkdir()
    p = task / "x_vie_score.csv"
    with open(p, "w", newline="") as fh:
        w = csvmod.DictWriter(fh, fieldnames=[
            "key", "sc", "pq", "o", "instruction_language"])
        w.writeheader()
        w.writerow({"key": "k0", "sc": 9, "pq": 8, "o": 8.485,
                    "instruction_language": "cn"})
    stats = write_score_artifacts([str(p)], str(tmp_path), "x",
                                  language="cn")
    assert stats["n"] == 1
    assert stats["per_task"]["color_alter"]["n"] == 1
    assert (tmp_path / "x_voe_score_merged.txt").exists()
    stats_en = write_score_artifacts([str(p)], str(tmp_path), "y")
    assert stats_en["n"] == 0 and not (
        tmp_path / "y_voe_score_merged.txt").exists()
