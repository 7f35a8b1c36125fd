"""CLI driver end-to-end smoke tests (tiny dev config, mock weights)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def tiny_cli(monkeypatch):
    """Patch the CLI's preset resolution to the tiny config + tiny VAE so
    the smoke test runs in seconds."""
    from regione_tpu.cli import main as cli
    from regione_tpu.models import vae as V

    orig_build = cli.build_pipeline

    def build(args):
        from regione_tpu.core.config import DEFAULT_PARAMS
        from regione_tpu.models.mmdit import init_mmdit
        from regione_tpu.models.presets import get_config
        from regione_tpu.models.text_encoders import MockTextEncoder
        from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline
        import jax
        cfg = get_config("tiny")
        re = DEFAULT_PARAMS["step1x-edit"].replace(
            threshold=args.threshold, cache_threshold=args.cache_threshold,
            erosion_dilation=args.erosion_dilation,
            capacity_granularity=8).validate()
        params = init_mmdit(jax.random.PRNGKey(0), cfg)
        vae_cfg = V.VAEConfig(block_out_channels=(8, 16), latent_channels=2,
                              norm_num_groups=4, layers_per_block=1)
        pipe = Step1XEditPipeline(cfg, params, re)
        pipe.attach_vae(vae_cfg, V.init_vae(jax.random.PRNGKey(1), vae_cfg))
        pipe.attach_text_encoder(MockTextEncoder(cfg.txt_in_dim,
                                                 cfg.pooled_dim, max_length=8))
        pipe._regione_enabled = args.use_regione
        return pipe

    monkeypatch.setattr(cli, "build_pipeline", build)
    return cli


def test_cli_mock_vae_production_geometry():
    """The --random_weights mock VAE must have the production spatial
    factor (8 -> token_factor 16): with a 2-level VAE the default ~1024^2
    target resolution used to produce a 256x256 token grid (65k tokens),
    whose dense attention logits alone need ~256 GiB."""
    import argparse
    from regione_tpu.cli import main as cli

    ns = argparse.Namespace(
        backend="step1x-edit", preset="tiny", dev=False, model_path=None,
        seed=0, warmup_step=6, post_step=2, refresh_step="16",
        threshold=0.88, cache_threshold=0.02, erosion_dilation=True,
        use_regione=True, int8=False)
    pipe = cli.build_pipeline(ns)
    assert pipe.token_factor == 16
    w, h = pipe.target_resolution(1024, 1024)
    assert (h // pipe.token_factor, w // pipe.token_factor) == (64, 64)


def test_cli_demo_mode(tiny_cli, tmp_path):
    from PIL import Image
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    tiny_cli.main([
        "--use_regione", "--threshold", "0.0", "--erosion_dilation", "False",
        "--image_path", str(tmp_path / "in.png"), "--prompt", "test edit",
        "--output_dir", str(tmp_path / "out"), "--size_level", "32",
    ])
    assert (tmp_path / "out" / "demo_0.png").exists()


def test_cli_evaluation_mode(tiny_cli, tmp_path):
    from PIL import Image
    task = tmp_path / "bench" / "TE"
    (task / "img").mkdir(parents=True)
    with open(task / "metadata.jsonl", "w") as fh:
        for k in range(2):
            img = (np.random.default_rng(k).random((32, 32, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(img).save(task / "img" / f"k{k}.png")
            fh.write(json.dumps({"key": f"k{k}", "image": f"k{k}.png",
                                 "prompt": f"edit {k}"}) + "\n")
    tiny_cli.main([
        "--use_regione", "--threshold", "0.0", "--erosion_dilation", "False",
        "--evaluation", "--eval_dir", str(tmp_path / "bench"),
        "--output_dir", str(tmp_path / "res"), "--size_level", "32",
    ])
    out_task = tmp_path / "res" / "TE"
    assert (out_task / "generation" / "k0.png").exists()
    timing = json.load(open(out_task / "time_consuming.json"))
    assert timing["num_item"] == 2 and len(timing["list"]) == 2
    # transcription of the reference merger's read
    # (evaluation/metric_merge.py:20-25): it indexes num_item and
    # ave_time_consuming directly — our output must satisfy it unchanged
    num_prompt, ave_latency = timing["num_item"], timing["ave_time_consuming"]
    assert num_prompt == 2
    assert ave_latency == pytest.approx(
        np.mean(timing["time_consuming_list"]))
    meta = json.load(open(out_task / "metadata.json"))
    assert meta["k1"] == "edit 1"


def test_cli_act_int8_requires_int8():
    """--act_int8 without --int8 must hard-error instead of silently
    running plain bf16 (ADVICE r2)."""
    import argparse
    import pytest
    from regione_tpu.cli import main as cli

    ns = argparse.Namespace(
        backend="step1x-edit", preset="tiny", dev=False, model_path=None,
        seed=0, warmup_step=6, post_step=2, refresh_step="16",
        threshold=0.88, cache_threshold=0.02, erosion_dilation=True,
        use_regione=True, int8=False, act_int8=True)
    with pytest.raises(SystemExit, match="act_int8 requires"):
        cli.build_pipeline(ns)


def test_cli_int4_packs_mods_by_default(monkeypatch):
    """--int4 must request int4 modulation packing (the published
    single-chip 60-block format); --int4_mods false keeps mods int8."""
    import argparse
    import regione_tpu.ops.quant as quant
    from regione_tpu.cli import main as cli

    calls = []
    real = quant.quantize_params

    def spy(params, **kw):
        calls.append(kw)
        return real(params, **kw)

    monkeypatch.setattr(quant, "quantize_params", spy)
    base = dict(
        backend="step1x-edit", preset="tiny", dev=False, model_path=None,
        seed=0, warmup_step=6, post_step=2, refresh_step="16",
        threshold=0.88, cache_threshold=0.02, erosion_dilation=True,
        use_regione=True, int8=False, act_int8=False, int4=True,
        quantize_mods=None)
    cli.build_pipeline(argparse.Namespace(**base, int4_mods=None))
    assert calls[-1]["bits"] == 4 and calls[-1]["int4_mods"] is True
    assert calls[-1]["quantize_mods"] is True
    cli.build_pipeline(argparse.Namespace(**base, int4_mods=False))
    assert calls[-1]["bits"] == 4 and calls[-1]["int4_mods"] is False


def test_cli_int4_demo(tmp_path):
    """--int4 end-to-end through the real CLI (tiny preset): nibble-packed
    weights incl. int4 mods produce a valid image."""
    from PIL import Image
    from regione_tpu.cli import main as cli

    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    cli.main([
        "--use_regione", "--random_weights", "--preset", "tiny",
        "--int4", "--threshold", "0.0", "--erosion_dilation", "False",
        "--image_path", str(tmp_path / "in.png"), "--prompt", "int4",
        "--output_dir", str(tmp_path / "out"), "--size_level", "32",
    ])
    out = np.asarray(Image.open(tmp_path / "out" / "demo_0.png"))
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_cli_w8a8_demo(tmp_path):
    """--int8 --act_int8 end-to-end through the real CLI (tiny preset):
    int8 weights + dynamic activation quant produce a valid image."""
    from PIL import Image
    from regione_tpu.cli import main as cli

    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    cli.main([
        "--use_regione", "--random_weights", "--preset", "tiny",
        "--int8", "--act_int8", "--threshold", "0.0",
        "--erosion_dilation", "False",
        "--image_path", str(tmp_path / "in.png"), "--prompt", "w8a8",
        "--output_dir", str(tmp_path / "out"), "--size_level", "32",
    ])
    out = np.asarray(Image.open(tmp_path / "out" / "demo_0.png"))
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


@pytest.mark.parametrize("backend,preset", [
    ("step1x-edit", "tiny-step1x"),
    ("step1x-edit-v1p2", "tiny-step1x"),
    ("flux-kontext", "tiny-flux"),
    ("qwen-image-edit", "tiny-qwen"),
    ("qwen-image-edit-plus", "tiny-qwen"),
])
def test_cli_all_backends_demo(backend, preset, tmp_path):
    """Every backend through the REAL build_pipeline (random weights, mock
    VAE/encoder) end to end — the integration surface the reference covers
    with its manual per-backend demo runs (SURVEY.md §4.4)."""
    from PIL import Image
    from regione_tpu.cli import main as cli

    img = (np.random.default_rng(0).random((64, 64, 3)) * 255
           ).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    cli.main([
        "--backend", backend, "--preset", preset, "--use_regione",
        "--threshold", "0.0", "--erosion_dilation", "False",
        "--image_path", str(tmp_path / "in.png"), "--prompt", "test edit",
        "--output_dir", str(tmp_path / "out"), "--size_level", "64",
    ])
    outs = list((tmp_path / "out").glob("demo_0.*"))
    assert len(outs) == 1, outs
    arr = np.asarray(Image.open(outs[0]))
    assert arr.shape == (64, 64, 3) and arr.dtype == np.uint8


def test_cli_evaluation_reference_schema(tiny_cli, tmp_path):
    """A dataset preprocessed by the REFERENCE's data/preprocess.py (raw
    items: {"key", "instruction"}, image at img/{key}.png — no
    "image"/"prompt" fields) must run unchanged through our --evaluation
    mode (drop-in interop, the metadata twin of the time_consuming.json
    schema fix)."""
    from PIL import Image
    task = tmp_path / "bench" / "TE"
    (task / "img").mkdir(parents=True)
    with open(task / "metadata.jsonl", "w") as fh:
        for k in range(2):
            img = (np.random.default_rng(k).random((32, 32, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(img).save(task / "img" / f"k{k}.png")
            fh.write(json.dumps({"key": f"k{k}", "instruction": f"edit {k}",
                                 "instruction_language": "en"}) + "\n")
    tiny_cli.main([
        "--use_regione", "--threshold", "0.0", "--erosion_dilation", "False",
        "--evaluation", "--eval_dir", str(tmp_path / "bench"),
        "--output_dir", str(tmp_path / "res"), "--size_level", "32",
    ])
    out_task = tmp_path / "res" / "TE"
    assert (out_task / "generation" / "k0.png").exists()
    meta = json.load(open(out_task / "metadata.json"))
    assert meta == {"k0": "edit 0", "k1": "edit 1"}


def test_cli_demo_reference_schema(tiny_cli, tmp_path):
    """Reference demo data.jsonl lines ({"key": path-sans-ext,
    "instruction"}) run unchanged through --data_jsonl demo mode."""
    from PIL import Image
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255
           ).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "demo_in.png")
    with open(tmp_path / "data.jsonl", "w") as fh:
        fh.write(json.dumps({"key": str(tmp_path / "demo_in"),
                             "instruction": "make it night"}) + "\n")
    tiny_cli.main([
        "--use_regione", "--threshold", "0.0", "--erosion_dilation", "False",
        "--data_jsonl", str(tmp_path / "data.jsonl"),
        "--output_dir", str(tmp_path / "out"), "--size_level", "32",
    ])
    assert (tmp_path / "out" / "demo_0.png").exists()


def test_cli_reference_flag_compat(tmp_path):
    """Reference command lines run unchanged: --device accepted (ignored),
    --image_path as demo data.jsonl and as --evaluation dataset root
    (src/<M>/main.py:34,47,87), --num_inference_steps free for the dense
    baseline but pinned to 28 with --use_regione
    (RegionE/tool/RegionE.py:44)."""
    from PIL import Image
    from regione_tpu.cli import main as cli

    img = (np.random.default_rng(0).random((64, 64, 3)) * 255
           ).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "demo_in.png")
    with open(tmp_path / "data.jsonl", "w") as fh:
        fh.write(json.dumps({"key": str(tmp_path / "demo_in"),
                             "instruction": "demo edit"}) + "\n")
    # demo: reference style --image_path <jsonl> + --device + custom steps
    # + the BARE --erosion_dilation form every reference script/*.sh uses
    # (store_true in src/Step1X-Edit/main.py:27)
    cli.main([
        "--backend", "step1x-edit", "--preset", "tiny-step1x",
        "--device", "cuda", "--num_inference_steps", "6",
        "--erosion_dilation",
        "--image_path", str(tmp_path / "data.jsonl"),
        "--output_dir", str(tmp_path / "out"), "--size_level", "64",
    ])
    assert (tmp_path / "out" / "demo_0.png").exists()

    # evaluation: reference style --image_path <dataset root>
    task = tmp_path / "bench" / "TE"
    (task / "img").mkdir(parents=True)
    Image.fromarray(img).save(task / "img" / "k0.png")
    (task / "metadata.jsonl").write_text(
        json.dumps({"key": "k0", "instruction": "edit"}) + "\n")
    cli.main([
        "--backend", "step1x-edit", "--preset", "tiny-step1x",
        "--evaluation", "--num_inference_steps", "6",
        "--image_path", str(tmp_path / "bench"),
        "--output_dir", str(tmp_path / "res"), "--size_level", "64",
    ])
    assert (tmp_path / "res" / "TE" / "generation" / "k0.png").exists()

    # RegionE mode keeps the reference's 28-step pin
    with pytest.raises(SystemExit, match="28"):
        cli.main([
            "--backend", "step1x-edit", "--preset", "tiny-step1x",
            "--use_regione", "--num_inference_steps", "12",
            "--image_path", str(tmp_path / "demo_in.png"),
            "--prompt", "x", "--output_dir", str(tmp_path / "o2"),
            "--size_level", "64",
        ])


def test_cli_plus_multireference_demo(tmp_path):
    """--ref_image_path feeds extra references into the Plus pipeline's
    multi-reference conditioning path from the CLI."""
    from PIL import Image
    from regione_tpu.cli import main as cli

    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ref = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "in.png")
    Image.fromarray(ref).save(tmp_path / "ref.png")
    cli.main([
        "--backend", "qwen-image-edit-plus", "--preset", "tiny-qwen",
        "--use_regione", "--threshold", "0.0",
        "--erosion_dilation", "False",
        "--image_path", str(tmp_path / "in.png"),
        "--ref_image_path", str(tmp_path / "ref.png"),
        "--prompt", "blend in the reference",
        "--output_dir", str(tmp_path / "out"), "--size_level", "64",
    ])
    outs = list((tmp_path / "out").glob("demo_0.*"))
    assert len(outs) == 1
    arr = np.asarray(Image.open(outs[0]))
    assert arr.shape == (64, 64, 3)


def test_cli_eval_fails_fast_without_dataset_root(tmp_path):
    """--evaluation with a missing/typo'd path must exit BEFORE the
    (minutes-long) pipeline build, with a clear message — not a
    Path(None) TypeError after weight load (round-4 review)."""
    from regione_tpu.cli import main as cli
    with pytest.raises(SystemExit, match="dataset root"):
        cli.main(["--evaluation",
                  "--image_path", str(tmp_path / "not_preprocessed"),
                  "--output_dir", str(tmp_path / "o")])
    with pytest.raises(SystemExit, match="not a directory"):
        cli.main(["--evaluation", "--eval_dir", str(tmp_path / "nope"),
                  "--output_dir", str(tmp_path / "o")])


def test_cli_warmup_runs_in_jsonl_mode(monkeypatch, tmp_path):
    """--num_warmup_runs must fire for reference-style jsonl command
    lines too: the --image_path overload used to null image_path before
    the warmup check, so the first timed image silently included full
    XLA compile time (round-4 review)."""
    from PIL import Image
    from regione_tpu.cli import main as cli
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / "in.png")
    (tmp_path / "data.jsonl").write_text(json.dumps(
        {"key": str(tmp_path / "in"), "instruction": "demo edit"}) + "\n")

    calls = []

    class StubPipe:
        def __call__(self, image, prompt, **kw):
            calls.append(prompt)
            return np.zeros((16, 16, 3), np.uint8), None

    monkeypatch.setattr(cli, "build_pipeline", lambda args: StubPipe())
    cli.main(["--num_warmup_runs", "2",
              "--image_path", str(tmp_path / "data.jsonl"),
              "--output_dir", str(tmp_path / "out")])
    assert len(calls) == 3  # 2 warmup invocations + 1 timed demo image


def test_metadata_resolver_semantics(tmp_path):
    """Shared schema resolver (CLI + VIEScore): an explicit empty prompt
    is a real prompt, relative subdirectories under img/ are preserved
    (not flattened to the basename), and a missing prompt raises."""
    from regione_tpu.utils.metadata import resolve_item
    _, prompt = resolve_item({"image": "a.png", "prompt": ""})
    assert prompt == ""
    path, _ = resolve_item({"image": "sub/a.png", "prompt": "x"},
                           img_dir=tmp_path / "img")
    assert path == str(tmp_path / "img" / "sub" / "a.png")
    with pytest.raises(KeyError):
        resolve_item({"image": "a.png"})


def test_demo_scripts_parse_against_real_cli():
    """Every `python -m regione_tpu.cli.main` invocation in
    scripts/demo/*.sh must parse with the real argument parser, and its
    dataset paths must use the layouts this repo actually produces
    (data/Processed/<bench>/<task> from eval.preprocess, assets/
    data.jsonl) — guards the whole script set against flag/path drift
    (round-4 review found a /en eval path no component ever writes)."""
    import re
    import shlex
    from regione_tpu.cli import main as cli

    repo = Path(__file__).resolve().parent.parent
    scripts = sorted((repo / "scripts" / "demo").glob("*.sh"))
    assert len(scripts) == 5
    parser = cli.make_parser()
    n_cmds = 0
    for sh in scripts:
        text = sh.read_text()
        # join line continuations, then lift each CLI invocation
        joined = re.sub(r"\\\s*\n", " ", text)
        for line in joined.splitlines():
            line = line.strip()
            if not line.startswith("python -m regione_tpu.cli.main"):
                continue
            n_cmds += 1
            argv = shlex.split(line)[3:]
            args = parser.parse_args(argv)  # SystemExit on unknown flag
            if args.evaluation:
                root = Path(args.image_path or args.eval_dir)
                assert root.parts[-2] == "Processed"
                assert root.parts[-1] in ("GEdit-Bench", "Kontext-Bench")
            elif args.image_path and args.image_path.endswith(".jsonl"):
                assert (repo / args.image_path).exists()
    assert n_cmds >= 11  # 5 backends x (demo [+vanilla]) + 5 eval stanzas
