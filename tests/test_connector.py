"""Step1X connector (timestep-conditioned text refiner) tests."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.models.connector import ConnectorConfig, connector_apply, init_connector
from regione_tpu.models.mmdit import MODE_DENSE, init_mmdit, mmdit_forward
from regione_tpu.models.presets import get_config


def test_connector_shapes_and_mask():
    cfg = ConnectorConfig(in_dim=16, hidden=16, heads=2, depth=2,
                          pooled_dim=8, time_embed_dim=32,
                          dtype=jnp.float32)
    p = init_connector(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    out, y = connector_apply(p, cfg, feats, jnp.asarray([0.5, 0.5]), mask)
    assert out.shape == (2, 6, 16) and y.shape == (2, 8)
    # masked tokens must not influence real rows
    feats2 = feats.at[0, 4].set(99.0)
    out2, y2 = connector_apply(p, cfg, feats2, jnp.asarray([0.5, 0.5]), mask)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(out2[0, :3]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y2[0]),
                               rtol=1e-5, atol=1e-5)


def test_mmdit_with_connector_is_timestep_dependent():
    base = get_config("tiny")
    cfg = dataclasses.replace(
        base, connector=ConnectorConfig(
            in_dim=base.txt_in_dim, hidden=base.txt_in_dim, heads=2, depth=1,
            pooled_dim=base.pooled_dim, time_embed_dim=32, dtype=jnp.float32))
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    assert "connector" in params
    rng = np.random.default_rng(1)
    from regione_tpu.pipelines.base import EditPipelineBase
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    pipe = EditPipelineBase(cfg, params, RegionEParams(),
                            gamma=gamma_for("step1x-edit"))
    rope_img, rope_txt = pipe.build_rope(4, 4, 4)
    img = jnp.asarray(rng.standard_normal((1, 32, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.txt_in_dim)), jnp.float32)

    def fwd(sig):
        v, _ = mmdit_forward(params, cfg, img, txt, jnp.full((1,), sig),
                             rope_img, rope_txt, mode=MODE_DENSE)
        return np.asarray(v)

    v1, v2 = fwd(0.9), fwd(0.1)
    assert v1.shape == (1, 32, cfg.out_channels)
    assert not np.allclose(v1, v2)  # text path depends on t via the connector
