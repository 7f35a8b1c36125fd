"""End-to-end tiny-model tests of the compiled RegionE sampler.

Two gates (SURVEY.md §7.4 minimum slice):
  (a) the dense path is exactly plain flow-match Euler;
  (b) the full accelerated path (static plan + fixed-capacity gathering +
      attention-ready KV cache + AVD) matches the reference-style
      dynamic-shape oracle (tests/oracle.py) to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regione_tpu.core.config import RegionEParams
from regione_tpu.core.gamma import gamma_for
from regione_tpu.core.schedule import build_sigmas, build_stage_plan, calculate_shift
from regione_tpu.models.mmdit import MODE_DENSE, init_mmdit, mmdit_forward
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.base import EditInputs, EditPipelineBase
from tests.oracle import oracle_edit

GRID = 8
S = GRID * GRID
T_TXT = 4


def make_pipe(threshold=0.0, cache_threshold=0.05, erosion_dilation=False,
              refresh=(16,), preset="tiny", seed=0):
    cfg = get_config(preset)
    params = init_mmdit(jax.random.PRNGKey(seed), cfg)
    re = RegionEParams(
        threshold=threshold, cache_threshold=cache_threshold,
        erosion_dilation=erosion_dilation, refresh_step=refresh,
        capacity_granularity=8,
    )
    pipe = EditPipelineBase(cfg, params, re, gamma=gamma_for("step1x-edit"))
    return cfg, params, re, pipe


def make_inputs(cfg, pipe, seed=1):
    rng = np.random.default_rng(seed)
    txt = rng.standard_normal((1, T_TXT, cfg.txt_in_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32)
    cond = rng.standard_normal((1, S, cfg.in_channels)).astype(np.float32) * 0.5
    lat0 = rng.standard_normal((1, S, cfg.in_channels)).astype(np.float32)
    rope_img, rope_txt = pipe.build_rope(GRID, GRID, T_TXT)
    ctx = EditInputs(
        txt=jnp.asarray(txt), cond_latent=jnp.asarray(cond),
        rope_img=rope_img, rope_txt=rope_txt, pooled=jnp.asarray(pooled),
    )
    return ctx, jnp.asarray(lat0), txt, pooled, cond, lat0


def test_dense_path_is_plain_euler():
    cfg, params, re, pipe = make_pipe()
    ctx, lat0, *_ = make_inputs(cfg, pipe)
    got = np.asarray(pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)[0])

    # manual Euler loop, direct model calls (no sampler machinery)
    mu = calculate_shift(S)
    sigmas = build_sigmas(28, mu=mu)
    lat = np.asarray(lat0, np.float32)
    for i in range(28):
        img_in = jnp.concatenate(
            [jnp.asarray(lat, cfg.dtype), ctx.cond_latent.astype(cfg.dtype)], 1)
        v, _ = mmdit_forward(
            params, cfg, img_in, ctx.txt,
            jnp.full((1,), sigmas[i], cfg.dtype),
            ctx.rope_img, ctx.rope_txt, pooled=ctx.pooled, mode=MODE_DENSE)
        lat = lat + float(sigmas[i + 1] - sigmas[i]) * np.asarray(v, np.float32)[:, :S]
    np.testing.assert_allclose(got, lat, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("erosion_dilation,threshold",
                         [(False, 0.0), (True, 0.2)])
def test_regione_matches_reference_oracle(erosion_dilation, threshold):
    cfg, params, re, pipe = make_pipe(
        threshold=threshold, erosion_dilation=erosion_dilation)
    ctx, lat0, txt, pooled, cond, lat0_np = make_inputs(cfg, pipe)

    got, stats = pipe.edit_latents(lat0, ctx, GRID, GRID)
    got = np.asarray(got)

    want, edited = oracle_edit(
        params, cfg, re, gamma_for("step1x-edit"),
        lat0_np, cond, txt, GRID, GRID, pooled=pooled)

    # the partition must be non-degenerate for this test to mean anything
    assert 0 < stats.edited_tokens < S, (
        f"degenerate partition ({stats.edited_tokens}/{S}); tune threshold")
    assert stats.edited_tokens == len(edited)
    assert stats.reuse_steps > 0, "AVD never fired; tune cache_threshold"
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_regione_multi_refresh_matches_oracle():
    cfg, params, re, pipe = make_pipe(refresh=(12, 16))
    ctx, lat0, txt, pooled, cond, lat0_np = make_inputs(cfg, pipe, seed=3)
    got, stats = pipe.edit_latents(lat0, ctx, GRID, GRID)
    want, _ = oracle_edit(
        params, cfg, re, gamma_for("step1x-edit"),
        lat0_np, cond, txt, GRID, GRID, pooled=pooled)
    assert 0 < stats.edited_tokens < S
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_warmup_one_edge_case():
    """warmup_step=1: partition happens at step 0 with no prior dense steps
    (the STS scan is empty)."""
    cfg, params, re, pipe = make_pipe()
    re1 = re.replace(warmup_step=1, refresh_step=(16,))
    pipe2 = EditPipelineBase(cfg, params, re1,
                             gamma=gamma_for("step1x-edit"))
    ctx, lat0, txt, pooled, cond, lat0_np = make_inputs(cfg, pipe2)
    got, stats = pipe2.edit_latents(lat0, ctx, GRID, GRID)
    want, _ = oracle_edit(params, cfg, re1, gamma_for("step1x-edit"),
                          lat0_np, cond, txt, GRID, GRID, pooled=pooled)
    assert 0 < stats.edited_tokens < S
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_post_step_zero_matches_oracle():
    """post_step=0: the final merge fires after the last step and the
    sentinel refresh targets the terminal sigma (=0)."""
    cfg, params, re, pipe = make_pipe()
    re0 = re.replace(post_step=0)
    pipe0 = EditPipelineBase(cfg, params, re0, gamma=gamma_for("step1x-edit"))
    ctx, lat0, txt, pooled, cond, lat0_np = make_inputs(cfg, pipe0, seed=5)
    got, stats = pipe0.edit_latents(lat0, ctx, GRID, GRID)
    want, _ = oracle_edit(params, cfg, re0, gamma_for("step1x-edit"),
                          lat0_np, cond, txt, GRID, GRID, pooled=pooled)
    assert 0 < stats.edited_tokens < S
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_progress_callback_fires_per_step():
    cfg, params, re, pipe = make_pipe()
    ticks = []
    pipe.progress_cb = lambda idx: ticks.append(int(idx))
    ctx, lat0, *_ = make_inputs(cfg, pipe, seed=9)
    out, stats = pipe.edit_latents(lat0, ctx, GRID, GRID)
    jax.block_until_ready(out)
    import time
    time.sleep(0.5)  # callbacks are async
    # every dense/compute step ticks once; each reuse RUN ticks once
    assert len(ticks) >= stats.dense_steps
    assert max(ticks) == 27 and min(ticks) == 0


def test_four_segment_split_structure():
    """The sampler's plan split: warm scan length, SMS tail extraction,
    and the sentinel refresh staying inside _rest (it does the merge)."""
    from regione_tpu.core.schedule import SCHED_REFRESH

    cfg, params, re, pipe = make_pipe()
    sampler = pipe.sampler_for(GRID, GRID, T_TXT, batch_cache=1)
    segs, tail = sampler._segments
    # default plan: warmup 6, post 2, refresh (16,) + sentinel 27 ->
    # SMS tail = the post_step plain dense steps at the very end
    assert [sp.index for sp in tail] == [26, 27]
    assert all(sp.dense and sp.sched_role != SCHED_REFRESH for sp in tail)
    # the mid-run refresh stays inside _rest (the sentinel "merge" is the
    # final scatter at the end of the last rags segment, not a forward)
    rest_steps = [sp for _, steps in segs for sp in steps]
    assert sum(sp.sched_role == SCHED_REFRESH for sp in rest_steps) == 1
    # nothing lost: warm + partition + rest + tail covers all 28 steps
    n_warm = re.warmup_step - 1
    assert n_warm + 1 + len(rest_steps) + len(tail) == 28


def test_four_segment_split_post_zero():
    """post_step=0 -> no SMS tail; the final segment may end on rags."""
    cfg, params, re, pipe = make_pipe()
    re0 = re.replace(post_step=0, refresh_step=(16,)).validate()
    pipe2 = EditPipelineBase(cfg, params, re0, gamma=gamma_for("step1x-edit"))
    sampler = pipe2.sampler_for(GRID, GRID, T_TXT, batch_cache=1)
    segs, tail = sampler._segments
    assert tail == []
    assert sampler._sms_steps == []


def test_caller_latents_survive_sampling():
    """_part donates its latents argument; the caller's array must stay
    valid (defensively copied when warmup_step == 1)."""
    cfg, params, re, pipe = make_pipe()
    re1 = re.replace(warmup_step=1).validate()
    pipe2 = EditPipelineBase(cfg, params, re1, gamma=gamma_for("step1x-edit"))
    ctx, lat0, *_ = make_inputs(cfg, pipe2)
    out, _ = pipe2.edit_latents(lat0, ctx, GRID, GRID)
    # the input buffer must NOT have been donated away
    assert np.isfinite(np.asarray(lat0)).all()
    assert out.shape == lat0.shape


def test_dense_chunked_matches_single_program():
    """dense_chunk splits the baseline scan into bounded-duration programs
    (the remote TPU runtime kills single executions over ~60 s); the
    chunked result must be bit-identical to the one-program scan."""
    cfg, params, re_params, pipe = make_pipe()
    ctx, lat0, *_ = make_inputs(cfg, pipe)
    one, _ = pipe.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)

    cfg2, params2, re2, pipe2 = make_pipe()
    pipe2.dense_chunk = 5  # 28 steps -> 6 programs (last short)
    chunked, _ = pipe2.edit_latents(lat0, ctx, GRID, GRID, dense_only=True)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(chunked))


def test_compiler_options_from_env(monkeypatch):
    """$REGIONE_COMPILER_OPTIONS (JSON dict) -> per-jit compiler options;
    unset -> None (production default).  The option dict must reach the
    backend compiler: an invalid value for a known generic XLA option
    fails the compile rather than being silently dropped."""
    from regione_tpu.core.sampler import compiler_options_from_env

    monkeypatch.delenv("REGIONE_COMPILER_OPTIONS", raising=False)
    assert compiler_options_from_env() is None

    monkeypatch.setenv("REGIONE_COMPILER_OPTIONS",
                       '{"xla_embed_ir_in_executable": false}')
    assert compiler_options_from_env() == {"xla_embed_ir_in_executable": False}

    # delivery: a bad value for a real option must error at compile time
    import jax
    import jax.numpy as jnp
    import pytest
    bad = jax.jit(lambda x: x + 1,
                  compiler_options={"xla_embed_ir_in_executable": "maybe"})
    with pytest.raises(Exception, match="maybe|bool|INVALID"):
        bad(jnp.ones((2,)))

    # end-to-end: sampler built under the env produces identical results
    cfg, params, re_params, pipe = make_pipe()
    ctx, lat0, *_ = make_inputs(cfg, pipe)
    base, _ = pipe.edit_latents(lat0, ctx, GRID, GRID)

    cfg2, params2, re2, pipe2 = make_pipe()
    out2, _ = pipe2.edit_latents(lat0, ctx, GRID, GRID)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out2))
