"""The RegionE denoise driver: STS -> (RAGS <-> refresh)* -> SMS, compiled.

Where the reference interleaves Python control flow, mutable singletons and
device work every step (SURVEY.md §3.2: scalar `t.item()`, `.pop()`
bookkeeping, AVD arithmetic on the host each of 28 iterations), this driver
compiles the whole loop into FOUR device-chained jitted calls per image
with ONE host sync:

  1. `_warm`: the dense stabilization scan.  Cache-free program.
  2. `_part`: the partition split-step (cache-writing forward + edited-mask
     selection).  Ends at the single unavoidable host sync: the edited-token
     count is data-dependent, so the host reads the count once and picks a
     static capacity bucket (multiples of `capacity_granularity`,
     MXU-aligned).
  3. `_rest`: RAGS scans, dense refresh split-steps, and merge/shrink layout
     transitions — traced against the host-precomputed static stage plan
     (regione_tpu.core.schedule).  Uniform compute runs use `lax.scan`;
     adaptive-velocity-decay REUSE runs are statically known and collapse
     to a single closed-form fused multiply-add per run
     (lat += avd * sum(dt_i * ratio_i)) — zero model FLOPs.
  4. `_sms`: the trailing dense smooth scan.  Cache-free program.

The warm/SMS phases get their own programs so the multi-GiB KV cache is
not in their live set: at the 12B-class single-chip scale a cache-carrying
program sits close enough to the HBM limit that XLA's rematerialization
pass re-runs the qkv/MLP projections of every dense step (~30-40% per-step
overhead, measured on the production-width Qwen).

Shape policy: latents stay full-length [B, S_noise, C] in fp32 (the
reference also upcasts in the scheduler, inplace.py:615); the RAGS phase
gathers to a fixed capacity K_cap with sentinel-padded ids (core.masking) —
padded rows are re-zeroed every step so garbage can never compound.

Backends plug in via two hooks (closing over their params/text embeds/rope):

  dense_forward(lat [B,S,C] f32, sigma, cache, ctx, write: bool)
      -> (v [B,S,C], cache)     # model over [noise ‖ condition], CFG done
  rags_forward(lat_act [B,K,C] f32, sigma, cache, edited_ids [K], ctx)
      -> (v_act [B,K,C], cache)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from regione_tpu.core import masking
from regione_tpu.core.config import RegionEParams, pick_capacity
from regione_tpu.core.partition import select_edited_mask
from regione_tpu.core.schedule import (
    SCHED_PARTITION,
    SCHED_REFRESH,
    StepPlan,
    plan_segments,
)


def compiler_options_from_env() -> dict | None:
    """Optional XLA compiler-option overrides for the sampler's jitted
    programs, as a JSON dict in $REGIONE_COMPILER_OPTIONS.

    On remote-attached TPUs, client-side XLA_FLAGS never reach the
    server-side compiler (the local process rejects unknown xla_tpu_*
    flags outright); PJRT `compiler_options` travel inside the
    CompileOptions proto and are validated by the real compiler.  Used
    for perf experiments (e.g. HLO-remat memory-budget tuning) — unset
    in production."""
    import json
    import os
    raw = os.environ.get("REGIONE_COMPILER_OPTIONS")
    return json.loads(raw) if raw else None


@dataclasses.dataclass
class SampleStats:
    """Per-image observability (reference has none; SURVEY.md §5)."""
    edited_tokens: int
    capacity: int
    seq_len: int
    reuse_steps: int
    dense_steps: int
    rags_steps: int
    sts_s: float = 0.0    # wall time of the STS+partition segment (timed=True)
    rest_s: float = 0.0   # wall time of the RAGS/refresh/SMS segment


class RegionESampler:
    """Generic RegionE loop driver, parameterized by backend hooks."""

    def __init__(
        self,
        plan: list[StepPlan],
        params_re: RegionEParams,
        *,
        grid_h: int,
        grid_w: int,
        dense_forward: Callable,
        rags_forward: Callable,
        init_cache: Callable[[], Any],
        progress_cb: Callable[[int], None] | None = None,
        dense_chunk: int | None = None,
    ):
        self.plan = plan
        # Max dense steps per device program (None = whole plan in one).
        # The remote-attached TPU runtime kills any single execution that
        # runs ≳60 s (worker "crashed or restarted"; bisected at Step1X
        # @1024px int4: 21-step dense scan = 53 s OK, 28-step ≈ 71 s dies),
        # so long dense baselines must be split into bounded-duration
        # chunks — numerically identical, same scan body, latents carried
        # between programs.
        self.dense_chunk = dense_chunk
        self.re = params_re
        self.grid_h = grid_h
        self.grid_w = grid_w
        self.dense_forward = dense_forward
        self.rags_forward = rags_forward
        self.init_cache = init_cache
        self.progress_cb = progress_cb
        # FOUR jitted segments, split so that the phases that never touch
        # the KV cache (warm dense scan, SMS tail) compile WITHOUT the
        # O(GB) cache in their live set.  A cache-carrying program close
        # to the HBM limit makes XLA's rematerialization pass re-run the
        # qkv/MLP projection fusions of every dense step (measured: 2.9 s
        # of an 11.3 s production-width Qwen edit, ~30-40% overhead on
        # every dense-mode step inside the old mixed _sts/_rest programs);
        # keeping the cache out of the warm/SMS programs removes the
        # pressure instead of fighting the scheduler.
        #   _warm: dense stabilization scan            (no cache)
        #   _part: partition split-step + cache build  (cache out)
        #   _rest: RAGS runs + refresh split-steps     (cache in/out)
        #   _sms : trailing dense smooth scan          (no cache)
        # _warm takes the CALLER's latents — not donated; every later
        # segment consumes sampler-owned buffers and donates them.
        copts = compiler_options_from_env()
        self._warm_jit = jax.jit(self._warm, compiler_options=copts)
        # progress ticks use async host callbacks: the compiled loop has no
        # natural host boundary (unlike the reference's per-step tqdm,
        # inplace.py:337), so an opt-in jax.debug.callback fires per step.
        self._part_jit = jax.jit(self._part, donate_argnums=(0,),
                                 compiler_options=copts)
        # one jit; retraces automatically per capacity (ids shape).
        # latents + KV cache (args 0, 3) are donated: the cache pytree is
        # O(GB) for the big backbones and is dead after the call.
        self._rest_jit = jax.jit(self._rest, donate_argnums=(0, 3),
                                 compiler_options=copts)
        self._sms_jit = jax.jit(self._sms, donate_argnums=(0,),
                                compiler_options=copts)

    def _tick(self, idx):
        """Async per-step progress tick (opt-in)."""
        if self.progress_cb is not None:
            jax.debug.callback(self.progress_cb, jnp.int32(idx), ordered=False)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def sample(self, latents0: jnp.ndarray, cond_latent: jnp.ndarray, ctx,
               forced_mask: jnp.ndarray | None = None, timed: bool = False,
               ) -> tuple[jnp.ndarray, SampleStats]:
        """Run the full accelerated denoise.  latents0/cond_latent:
        [B, S_noise, C].  `forced_mask` overrides the adaptive partition
        with a fixed edited mask (controlled benchmarking / ablations);
        `timed` records per-segment wall time (adds one device sync).
        Returns (final latents f32, stats)."""
        import time as _time
        s_noise = latents0.shape[1]
        t0 = _time.perf_counter()
        if self.re.warmup_step > 1:
            lat = self._warm_jit(latents0, ctx)
        else:
            # _part donates its latents argument; never donate the CALLER's
            lat = jnp.copy(latents0)
        lat, mask, ids_sorted, cache = self._part_jit(
            lat, cond_latent, ctx, forced_mask)
        # THE one host sync: only the scalar count crosses to the host (to
        # pick the static capacity bucket); the id set itself never leaves
        # the device (ids_sorted is sliced + sentinel-padded inside _rest)
        n_edit = int(jax.device_get(jnp.sum(mask)))
        sts_s = _time.perf_counter() - t0
        cap = self.re.rags_capacity or pick_capacity(
            n_edit, s_noise, self.re.capacity_granularity)
        if n_edit > cap:
            # only possible with a user-pinned rags_capacity; dropping edited
            # tokens silently would diverge from the reference's semantics
            import warnings
            warnings.warn(
                f"edited tokens ({n_edit}) exceed pinned rags_capacity "
                f"({cap}); the highest-index {n_edit - cap} edited tokens "
                "will be treated as unedited", stacklevel=2)
            ids = jnp.asarray(masking.mask_to_padded_ids(
                np.asarray(jax.device_get(mask)), cap))
            mask = jnp.zeros((s_noise,), bool).at[ids].set(True, mode="drop")
            ids_cap = ids
        else:
            ids_cap = jax.lax.slice(ids_sorted, (0,), (cap,))
        t1 = _time.perf_counter()
        lat, _ = self._rest_jit(lat, ids_cap, mask, cache, ctx)
        if self._sms_steps:
            lat = self._sms_jit(lat, ctx)
        rest_s = 0.0
        if timed:
            float(jnp.sum(lat))  # completion barrier (block_until_ready can
            rest_s = _time.perf_counter() - t1  # return early on remote TPU)
        stats = SampleStats(
            edited_tokens=n_edit,
            capacity=cap,
            seq_len=s_noise,
            reuse_steps=sum(sp.reuse for sp in self.plan),
            dense_steps=sum(sp.dense for sp in self.plan),
            rags_steps=sum(not sp.dense for sp in self.plan),
            sts_s=sts_s if timed else 0.0,
            rest_s=rest_s,
        )
        return lat, stats

    def sample_batch(self, latents0_b: jnp.ndarray, cond_b: jnp.ndarray,
                     ctx_b, ctx_axes, forced_masks: jnp.ndarray | None = None,
                     ) -> tuple[jnp.ndarray, list[SampleStats]]:
        """Multi-image batch: vmap the two compiled segments over a request
        axis (throughput serving; the reference is strictly one image at a
        time).  latents0_b/cond_b: [B, 1, S, C]; ctx_b: EditInputs whose
        per-image leaves carry a leading B axis, with `ctx_axes` the
        matching vmap in_axes pytree (0 for per-image leaves, None for
        shared ones — params/rope).  All images share one capacity bucket
        (the max edited count) so a single compiled program serves the
        whole batch.  Returns ([B, 1, S, C], per-image stats list — each
        image's own edited_tokens; capacity/step counts are shared)."""
        s_noise = latents0_b.shape[2]
        fm_axis = None if forced_masks is None else 0
        # cache the vmapped jits (a fresh closure per call would recompile)
        if not hasattr(self, "_batch_jits"):
            self._batch_jits = {}
        tstruct = jax.tree.structure((ctx_axes,))
        if self.re.warmup_step > 1:
            wkey = ("warm", tstruct)
            if wkey not in self._batch_jits:
                self._batch_jits[wkey] = jax.jit(
                    jax.vmap(self._warm, in_axes=(0, ctx_axes)))
            lat_b = self._batch_jits[wkey](latents0_b, ctx_b)
        else:
            # the part segment donates its latents arg; never the caller's
            lat_b = jnp.copy(latents0_b)
        key = ("part", fm_axis, tstruct)
        if key not in self._batch_jits:
            self._batch_jits[key] = jax.jit(
                jax.vmap(self._part, in_axes=(0, 0, ctx_axes, fm_axis)),
                donate_argnums=(0,))
        lat_b, mask_b, _ids_sorted_b, cache_b = self._batch_jits[key](
            lat_b, cond_b, ctx_b, forced_masks)
        counts = np.asarray(jax.device_get(jnp.sum(mask_b, axis=-1)))
        cap = self.re.rags_capacity or pick_capacity(
            int(counts.max()), s_noise, self.re.capacity_granularity)
        masks_np = np.asarray(jax.device_get(mask_b))
        ids_b = jnp.asarray(np.stack(
            [masking.mask_to_padded_ids(m, cap) for m in masks_np]))
        # inherit the request-axis (dp) sharding of the inputs so the rest
        # segment partitions the same way (GSPMD propagates from operands)
        shd = getattr(latents0_b, "sharding", None)
        if (isinstance(shd, jax.sharding.NamedSharding) and shd.spec
                and shd.spec[0] is not None):
            ids_b = jax.device_put(
                ids_b, jax.sharding.NamedSharding(
                    shd.mesh, jax.sharding.PartitionSpec(shd.spec[0])))
        rkey = ("rest", tstruct)
        if rkey not in self._batch_jits:
            self._batch_jits[rkey] = jax.jit(
                jax.vmap(self._rest, in_axes=(0, 0, 0, 0, ctx_axes)),
                donate_argnums=(0, 3))
        lat_b, _ = self._batch_jits[rkey](lat_b, ids_b, mask_b, cache_b,
                                          ctx_b)
        if self._sms_steps:
            skey = ("sms", tstruct)
            if skey not in self._batch_jits:
                self._batch_jits[skey] = jax.jit(
                    jax.vmap(self._sms, in_axes=(0, ctx_axes)),
                    donate_argnums=(0,))
            lat_b = self._batch_jits[skey](lat_b, ctx_b)
        stats = [SampleStats(
            edited_tokens=int(c), capacity=cap, seq_len=s_noise,
            reuse_steps=sum(sp.reuse for sp in self.plan),
            dense_steps=sum(sp.dense for sp in self.plan),
            rags_steps=sum(not sp.dense for sp in self.plan))
            for c in counts]
        return lat_b, stats

    def sample_dense(self, latents0: jnp.ndarray, ctx) -> jnp.ndarray:
        """Vanilla 28-step dense Euler baseline through the same model hook
        (the reference's pinned-resolution `pipeline_call` baseline,
        src/Step1X-Edit/utils.py:106).  With `dense_chunk` set the scan is
        split into several bounded-duration programs (see __init__)."""
        n = len(self.plan)
        ck = self.dense_chunk
        if ck and n > ck:
            lat = latents0
            for a in range(0, n, ck):
                lat = self._dense_chunk_jit(a, min(a + ck, n))(lat, ctx)
            return lat
        return self._dense_jit(latents0, ctx)

    def _dense_chunk_jit(self, a: int, b: int):
        jits = self.__dict__.setdefault("_dense_chunk_jits", {})
        if (a, b) not in jits:
            jits[(a, b)] = jax.jit(
                lambda lat, ctx: self._dense_scan(
                    lat.astype(jnp.float32), self.plan[a:b], ctx),
                compiler_options=compiler_options_from_env())
        return jits[(a, b)]

    @functools.cached_property
    def _dense_jit(self):
        def run(lat, ctx):
            return self._dense_scan(lat.astype(jnp.float32), self.plan, ctx)

        return jax.jit(run, compiler_options=compiler_options_from_env())

    # ------------------------------------------------------------------
    # segment 1: STS + partition
    # ------------------------------------------------------------------

    def _dense_scan(self, lat, steps, ctx):
        """Plain-Euler `lax.scan` over cache-free dense steps — the shared
        body of the warm segment, the SMS segment, and the vanilla dense
        baseline."""
        sig = jnp.array([sp.sigma for sp in steps], jnp.float32)
        dts = jnp.array([sp.dt for sp in steps], jnp.float32)
        idxs = jnp.array([sp.index for sp in steps], jnp.int32)

        def body(l, xs):
            s, dt, idx = xs
            v, _ = self.dense_forward(l, s, None, ctx, False)
            self._tick(idx)
            return l + dt * v.astype(jnp.float32), None

        lat, _ = jax.lax.scan(body, lat, (sig, dts, idxs))
        return lat

    def _warm(self, latents, ctx):
        """Dense stabilization scan (plan steps before the partition).
        Cache-free by construction — compiling it WITHOUT the cache
        argument keeps the big backbones' warm steps out of XLA's
        rematerialization regime (see __init__)."""
        return self._dense_scan(latents.astype(jnp.float32),
                                self.plan[: self.re.warmup_step - 1], ctx)

    def _part(self, latents, cond_latent, ctx, forced_mask=None):
        """Partition split-step: one cache-writing forward, the edited-mask
        selection, and the edited/unedited split-step."""
        part = self.plan[self.re.warmup_step - 1]
        assert part.sched_role == SCHED_PARTITION
        lat = latents.astype(jnp.float32)
        cache = self.init_cache()
        v, cache = self.dense_forward(lat, jnp.float32(part.sigma), cache, ctx, True)
        v = v.astype(jnp.float32)
        # one-step x0 estimate vs reference latent -> edited mask
        # (reference inplace.py:653-656)
        x0 = lat + part.dt_final * v
        if forced_mask is not None:
            mask = forced_mask
        else:
            mask = select_edited_mask(
                x0, cond_latent.astype(jnp.float32), self.re.threshold,
                grid_h=self.grid_h, grid_w=self.grid_w,
                erosion_dilation=self.re.erosion_dilation,
                similarity_type=self.re.similarity_type,
            )
        # split step: edited rows take the normal Euler step, unedited rows
        # long-jump to the refresh sigma (reference inplace.py:653-668)
        lat = masking.where_rows(mask, lat + part.dt * v, lat + part.dt_jump * v)
        self._tick(part.index)
        # device-side id selection: stable argsort puts edited ids first
        # (ascending), so _rest can slice any capacity prefix without the
        # host ever downloading the mask or uploading an id tensor
        ids_sorted = jnp.argsort(~mask, stable=True).astype(jnp.int32)
        return lat, mask, ids_sorted, cache

    # ------------------------------------------------------------------
    # segment 2: RAGS / refresh / SMS
    # ------------------------------------------------------------------

    @functools.cached_property
    def _segments(self):
        """(rest_segments, sms_tail): the post-warmup plan split into the
        cache-phase segments run by _rest and the maximal trailing run of
        plain dense (non-refresh) steps, which _sms runs in a cache-free
        program."""
        segs = plan_segments(self.plan[self.re.warmup_step:])
        tail: list[StepPlan] = []
        if segs and segs[-1][0] == "dense":
            kind, steps = segs[-1]
            n = len(steps)
            while n > 0 and steps[n - 1].sched_role != SCHED_REFRESH:
                n -= 1
            tail = steps[n:]
            if n == 0:
                segs = segs[:-1]
            elif tail:
                segs = segs[:-1] + [(kind, steps[:n])]
        return segs, tail

    @property
    def _sms_steps(self):
        return self._segments[1]

    def _rest(self, lat, ids, mask, cache, ctx):
        s_noise = lat.shape[1]
        # sentinel-pad on device: slots past the edited count become
        # s_noise (an invalid latent row; the pipelines remap it past the
        # cache too).  Host-built id sets arrive already padded — the
        # where() is then an identity.
        count = jnp.sum(mask)
        ids = jnp.where(jnp.arange(ids.shape[0]) < count, ids, s_noise)
        valid = (ids < s_noise)[None, :, None].astype(jnp.float32)
        segs, _ = self._segments
        avd_full = jnp.zeros_like(lat)

        for si, (kind, steps) in enumerate(segs):
            if kind == "rags":
                lat_act = masking.gather_rows(lat, ids)
                avd_act = masking.gather_rows(avd_full, ids)
                cache, lat_act = self._rags_runs(lat_act, avd_act, cache, ids,
                                                 valid, steps, ctx)
                lat = masking.scatter_rows(lat, ids, lat_act)
            else:
                later_rags = any(k == "rags" for k, _ in segs[si + 1:])
                for sp in steps:
                    if sp.sched_role == SCHED_REFRESH:
                        # the sentinel refresh (no RAGS after it) still does
                        # the split-step merge but skips the cache rebuild —
                        # nothing would ever read it
                        if later_rags:
                            v, cache = self.dense_forward(
                                lat, jnp.float32(sp.sigma), cache, ctx, True)
                        else:
                            v, _ = self.dense_forward(
                                lat, jnp.float32(sp.sigma), None, ctx, False)
                        v = v.astype(jnp.float32)
                        lat = masking.where_rows(
                            mask, lat + sp.dt * v, lat + sp.dt_jump * v)
                        avd_full = v
                    else:
                        v, _ = self.dense_forward(
                            lat, jnp.float32(sp.sigma), None, ctx, False)
                        lat = lat + sp.dt * v.astype(jnp.float32)
                    self._tick(sp.index)
        # the final cache is dead to the caller, but RETURNING it lets XLA
        # alias the donated input cache to an output: without a matching
        # output, donation is "not usable", the while-loops copy the cache
        # to get writable buffers, and peak HBM carries the cache twice
        # (observed +4.8 GiB at the 12B-class single-chip scale).
        return lat, cache

    def _sms(self, lat, ctx):
        """Trailing dense smooth steps — cache-free program (see __init__)."""
        return self._dense_scan(lat, self._sms_steps, ctx)

    def _rags_runs(self, lat_act, avd_act, cache, ids, valid, steps, ctx):
        """Run a RAGS segment, split at the (statically known) AVD reuse
        boundaries:

          * a run of consecutive REUSE steps collapses to one fused
            multiply-add — each reuse step contributes
            `dt_i * (avd * ratio_i)` with the UN-decayed cached velocity
            (reference inplace.py:362-366), so the whole run is
            `lat += avd * Σ dt_i·ratio_i`.  Zero model FLOPs, zero loop.
          * a run of consecutive COMPUTE steps is a branch-free lax.scan
            over the transformer.
        """
        i = 0
        n = len(steps)
        while i < n:
            if steps[i].reuse:
                j = i
                const = 0.0
                while j < n and steps[j].reuse:
                    const += steps[j].dt * steps[j].ratio
                    j += 1
                lat_act = (lat_act + jnp.float32(const) * avd_act) * valid
                self._tick(steps[j - 1].index)  # one tick per reuse run
                i = j
            else:
                j = i
                while j < n and not steps[j].reuse:
                    j += 1
                run = steps[i:j]
                sig = jnp.array([sp.sigma for sp in run], jnp.float32)
                dts = jnp.array([sp.dt for sp in run], jnp.float32)
                idxs = jnp.array([sp.index for sp in run], jnp.int32)

                def body(carry, xs):
                    la, cache, _avd = carry
                    s, dt, idx = xs
                    v, cache = self.rags_forward(la, s, cache, ids, ctx)
                    v = v.astype(jnp.float32)
                    la = (la + dt * v) * valid
                    self._tick(idx)
                    return (la, cache, v), None  # AVD cache <- fresh velocity

                (lat_act, cache, avd_act), _ = jax.lax.scan(
                    body, (lat_act, cache, avd_act), (sig, dts, idxs))
                i = j
        return cache, lat_act
