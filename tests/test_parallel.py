"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from regione_tpu.models.mmdit import init_cache, init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.parallel.sharding import (
    cache_specs, make_mesh, param_specs, shard_params)


def test_mesh_and_param_specs():
    mesh = make_mesh(8, dp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}

    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params)
    # column-parallel qkv: stacked [L, in, out] -> shard out on tp
    assert specs["double"]["img_attn"]["q"]["w"] == P(None, None, "tp")
    assert specs["double"]["img_attn"]["q"]["b"] == P(None, "tp")
    # row-parallel out-proj: shard in on tp
    assert specs["double"]["img_attn"]["out"]["w"] == P(None, "tp", None)
    assert specs["single"]["linear1"]["w"] == P(None, None, "tp")
    assert specs["single"]["linear2"]["w"] == P(None, "tp", None)
    # embedders/modulations replicated
    assert specs["x_embedder"]["w"] == P()
    assert specs["double"]["img_mod"]["w"] == P()


def test_sharded_forward_matches_single_device():
    """TP+DP sharded dense forward == unsharded forward (GSPMD inserts the
    collectives; results must be identical up to float assoc)."""
    from regione_tpu.pipelines.base import EditInputs
    from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline
    from regione_tpu.core.config import RegionEParams

    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    pipe = Step1XEditPipeline(cfg, params, RegionEParams(), true_cfg_scale=4.0)
    rng = np.random.default_rng(0)
    grid, t_txt = 4, 8
    s = grid * grid
    rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)
    ctx = EditInputs(
        txt=jnp.asarray(rng.standard_normal((2, t_txt, cfg.txt_in_dim)),
                        jnp.float32),
        cond_latent=jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)),
                                jnp.float32),
        rope_img=rope_img, rope_txt=rope_txt,
        pooled=jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)), jnp.float32),
    )
    lat = jnp.asarray(rng.standard_normal((1, s, cfg.in_channels)), jnp.float32)

    v_ref, _ = jax.jit(
        lambda l, c: pipe.dense_forward(l, 0.9, None, c, False))(lat, ctx)

    mesh = make_mesh(8, dp=2)
    with mesh:
        sp = shard_params(params, mesh)
        ctx_sharded = EditInputs(
            txt=jax.device_put(ctx.txt, NamedSharding(mesh, P("dp"))),
            cond_latent=ctx.cond_latent, rope_img=ctx.rope_img,
            rope_txt=ctx.rope_txt, pooled=ctx.pooled,
            extra={"params": sp},
        )
        v_sh, _ = jax.jit(
            lambda l, c: pipe.dense_forward(l, 0.9, None, c, False))(
                lat, ctx_sharded)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh),
                               rtol=2e-4, atol=2e-4)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_cache_specs_shapes():
    cfg = get_config("tiny")
    cache = init_cache(cfg, 2, 32, 4)
    specs = cache_specs(cache)
    assert specs["dk"] == P(None, "dp", None, "tp")
