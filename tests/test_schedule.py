"""Stage-plan tests: verify the host-precomputed static plan reproduces the
reference's interleaved mutable-state control flow, including the hand-traced
default timeline documented in SURVEY.md §3.2."""

import numpy as np
import pytest

from regione_tpu.core.config import RegionEParams, pick_capacity
from regione_tpu.core.gamma import gamma_for
from regione_tpu.core.schedule import (
    AFTER_MERGE,
    AFTER_NONE,
    AFTER_SHRINK,
    KV_CACHE_WRITE,
    KV_NORMAL,
    KV_RAGS,
    SCHED_EULER,
    SCHED_PARTITION,
    SCHED_REFRESH,
    build_sigmas,
    build_stage_plan,
    calculate_shift,
    plan_segments,
)


def default_plan(cache_threshold=0.02, backend="step1x-edit", **kw):
    params = RegionEParams(cache_threshold=cache_threshold, **kw)
    mu = calculate_shift(4096)
    sigmas = build_sigmas(28, mu=mu)
    return params, sigmas, build_stage_plan(params, sigmas, gamma_for(backend))


def test_sigma_schedule_shape_and_monotonicity():
    mu = calculate_shift(4096)
    sigmas = build_sigmas(28, mu=mu)
    assert sigmas.shape == (29,)
    assert sigmas[0] == pytest.approx(np.exp(mu) / (np.exp(mu) + 0.0) if False else sigmas[0])
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # exponential shift of sigma=1 is exactly 1
    assert sigmas[0] == pytest.approx(1.0)


def test_calculate_shift_endpoints():
    assert calculate_shift(256) == pytest.approx(0.5)
    assert calculate_shift(4096) == pytest.approx(1.15)


def test_default_timeline_roles():
    """Defaults: 28 steps, warmup 6, post 2, refresh (16,) -> sentinel 27.
    Expected (SURVEY.md §3.2): dense 0-5 (cache@5, partition@5), rags 6-14,
    dense refresh 15, rags 16-25, dense SMS 26-27."""
    _, _, plan = default_plan()
    assert len(plan) == 28

    for sp in plan[:5]:
        assert sp.dense and sp.kv_phase == KV_NORMAL and sp.sched_role == SCHED_EULER
        assert sp.after == AFTER_NONE and not sp.reuse

    p5 = plan[5]
    assert p5.dense and p5.kv_phase == KV_CACHE_WRITE
    assert p5.sched_role == SCHED_PARTITION
    assert p5.after == AFTER_SHRINK
    assert p5.dt_final == pytest.approx(-p5.sigma)  # sigma_last = 0

    for sp in plan[6:15]:
        assert not sp.dense and sp.kv_phase == KV_RAGS
        assert sp.sched_role == SCHED_EULER
    assert plan[6].reuse is False  # forced: i <= warmup
    assert plan[14].after == AFTER_MERGE
    for sp in plan[6:14]:
        assert sp.after == AFTER_NONE

    p15 = plan[15]
    assert p15.dense and p15.kv_phase == KV_CACHE_WRITE
    assert p15.sched_role == SCHED_REFRESH
    assert p15.after == AFTER_SHRINK
    assert not p15.reuse  # forced at refresh

    for sp in plan[16:26]:
        assert not sp.dense and sp.kv_phase == KV_RAGS
        assert sp.sched_role == SCHED_EULER
    assert plan[25].after == AFTER_MERGE

    for sp in plan[26:]:
        assert sp.dense and sp.kv_phase == KV_NORMAL
        assert sp.sched_role == SCHED_EULER
        assert not sp.reuse
    assert plan[27].after == AFTER_NONE


def test_jump_targets_default():
    _, sigmas, plan = default_plan()
    # partition at 5 jumps unedited to sigma_15
    assert plan[5].dt_jump == pytest.approx(float(sigmas[15] - sigmas[5]))
    # refresh at 15 jumps to sigma_26 (sentinel 27 -> 0-based 26)
    assert plan[15].dt_jump == pytest.approx(float(sigmas[26] - sigmas[15]))


def test_avd_reference_simulation():
    """Replay of the reference loop-top AVD arithmetic
    (RegionE/Step1XEdit/inplace.py:342-360), written independently as an
    oracle, must match the plan's reuse/ratio fields exactly."""
    params, sigmas, plan = default_plan()
    gamma = gamma_for("step1x-edit").astype(np.float64)
    timesteps = sigmas[:28].astype(np.float64) * 1000.0

    # oracle state machine
    warmup, post, steps = params.warmup_step, params.post_step, 28
    refresh_rt = [15, 26]
    prev_refresh = None
    next_refresh = None
    accumulate = 1.0
    for i in range(steps):
        forced = (
            i <= warmup
            or i > steps - post - 1
            or (prev_refresh is not None and i == prev_refresh)
        )
        reuse, ratio = False, 1.0
        if forced:
            accumulate = 1.0
        else:
            r = float(gamma[i - 1]) * (1 + (timesteps[i] - timesteps[i - 1]) / 1000)
            if r >= 1:
                accumulate = 1.0
            else:
                acc = accumulate * r
                if 1 - acc > params.cache_threshold:
                    accumulate = 1.0
                else:
                    reuse, ratio, accumulate = True, r, acc
        assert plan[i].reuse == reuse, f"step {i}"
        if reuse:
            assert plan[i].ratio == pytest.approx(ratio), f"step {i}"
        # scheduler/manager bookkeeping
        if i == warmup - 1:
            prev_refresh = refresh_rt.pop(0)
        elif prev_refresh is not None and i == prev_refresh and refresh_rt:
            next_refresh = refresh_rt.pop(0)
        nxt = i + 1
        if nxt == steps - post:
            prev_refresh = None
        elif prev_refresh is not None and nxt == prev_refresh + 1:
            prev_refresh = next_refresh

    # sanity: with threshold 0.02 some steps do reuse
    assert any(sp.reuse for sp in plan)


def test_zero_cache_threshold_never_reuses():
    _, _, plan = default_plan(cache_threshold=0.0)
    assert not any(sp.reuse for sp in plan)


def test_multi_refresh_plan():
    params = RegionEParams(refresh_step=(12, 16))
    mu = calculate_shift(4096)
    sigmas = build_sigmas(28, mu=mu)
    plan = build_stage_plan(params, sigmas, gamma_for("step1x-edit"))
    # dense refreshes at 0-based 11 and 15
    assert plan[11].sched_role == SCHED_REFRESH and plan[11].dense
    assert plan[15].sched_role == SCHED_REFRESH and plan[15].dense
    assert plan[11].dt_jump == pytest.approx(float(sigmas[15] - sigmas[11]))
    assert plan[15].dt_jump == pytest.approx(float(sigmas[26] - sigmas[15]))
    assert plan[10].after == AFTER_MERGE
    assert plan[11].after == AFTER_SHRINK


def test_validation_rules():
    with pytest.raises(AssertionError):
        RegionEParams(num_inference_steps=30).validate()
    with pytest.raises(AssertionError):
        RegionEParams(refresh_step=(7,)).validate()  # must be > warmup+1
    with pytest.raises(AssertionError):
        RegionEParams(refresh_step=(12, 13)).validate()  # adjacent
    with pytest.raises(AssertionError):
        RegionEParams(refresh_step=(26,)).validate()  # > steps-post-1 = 25
    RegionEParams(refresh_step=(25,)).validate()
    RegionEParams(refresh_step="16").validate()  # comma-string form


def test_plan_segments_default():
    _, _, plan = default_plan()
    segs = plan_segments(plan)
    kinds = [(k, len(s)) for k, s in segs]
    assert kinds == [
        ("dense", 6),   # STS incl. partition
        ("rags", 9),    # 6..14
        ("dense", 1),   # refresh 15
        ("rags", 10),   # 16..25
        ("dense", 2),   # SMS
    ]


def test_pick_capacity():
    assert pick_capacity(1, 4096) == 128
    assert pick_capacity(300, 4096) == 384
    assert pick_capacity(256, 4096) == 256
    assert pick_capacity(5000, 4096) == 4096
    # MXU tile is 128; a 576-token quarter region at a 48x48 grid must not
    # balloon to a 768 bucket (33% padded RAGS rows under granularity 256)
    assert pick_capacity(576, 2304) == 640
    assert pick_capacity(1, 4096, granularity=256) == 256


def test_plan_property_fuzz_vs_reference_simulation():
    """Property test: for many random valid configs, the static plan's AVD
    and bookkeeping fields must match an independent replay of the
    reference's control flow, and segments must tile the step range."""
    rng = np.random.default_rng(0)
    gamma = gamma_for("step1x-edit").astype(np.float64)
    mu = calculate_shift(4096)
    sigmas = build_sigmas(28, mu=mu)
    timesteps = sigmas[:28].astype(np.float64) * 1000.0

    tried = 0
    for _ in range(200):
        warmup = int(rng.integers(1, 10))
        post = int(rng.integers(0, 4))
        hi = 28 - post - 1
        lo = warmup + 2
        if lo > hi:
            continue
        n_ref = int(rng.integers(1, 3))
        refs = sorted(rng.choice(np.arange(lo, hi + 1), size=min(n_ref, hi - lo + 1),
                                 replace=False).tolist())
        if any(abs(refs[i] - refs[i + 1]) == 1 for i in range(len(refs) - 1)):
            continue
        ct = float(rng.choice([0.0, 0.01, 0.02, 0.05, 0.2]))
        params = RegionEParams(warmup_step=warmup, post_step=post,
                               refresh_step=tuple(refs), cache_threshold=ct)
        try:
            params.validate()
        except AssertionError:
            continue
        tried += 1
        plan = build_stage_plan(params, sigmas, gamma)

        # independent replay (transcribed from the reference's loop)
        refresh_rt = [r - 1 for r in params.refresh_with_sentinel]
        prev_r, next_r, acc = None, None, 1.0
        for i in range(28):
            forced = (i <= warmup or i > 28 - post - 1
                      or (prev_r is not None and i == prev_r))
            reuse, ratio = False, 1.0
            if forced:
                acc = 1.0
            else:
                r = float(gamma[i - 1]) * (1 + (timesteps[i] - timesteps[i - 1]) / 1000)
                if r >= 1:
                    acc = 1.0
                else:
                    a2 = acc * r
                    if 1 - a2 > ct:
                        acc = 1.0
                    else:
                        reuse, ratio, acc = True, r, a2
            assert plan[i].reuse == reuse, (warmup, post, refs, ct, i)
            if reuse:
                assert plan[i].ratio == pytest.approx(ratio)
            if i == warmup - 1:
                prev_r = refresh_rt.pop(0)
            elif prev_r is not None and i == prev_r and refresh_rt:
                next_r = refresh_rt.pop(0)
            nxt = i + 1
            if nxt == 28 - post:
                prev_r = None
            elif prev_r is not None and nxt == prev_r + 1:
                prev_r = next_r

        # segments tile the plan exactly
        segs = plan_segments(plan)
        flat = [sp.index for _, ss in segs for sp in ss]
        assert flat == list(range(28))
    assert tried > 50


def test_custom_steps_pad_short_gamma():
    """Dense baselines at any step count (the reference vanilla drivers
    accept e.g. 50 steps): the 27-entry fitted table is padded with 1.0,
    which the AVD branch treats as recompute — the plan builds and
    nothing reuses on padded transitions (round-4 review finding: every
    dense run above 28 steps crashed in build_stage_plan)."""
    params = RegionEParams(num_inference_steps=50, allow_custom_steps=True,
                           warmup_step=1, post_step=0,
                           refresh_step=(3,)).validate()
    sigmas = build_sigmas(50, mu=calculate_shift(4096))
    plan = build_stage_plan(params, sigmas, gamma_for("step1x-edit"))
    assert len(plan) == 50
    assert not any(sp.reuse for sp in plan[27:])
