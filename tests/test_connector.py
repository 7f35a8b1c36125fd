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


def test_connector_matches_torch_oracle_from_checkpoint_naming():
    """Convert a synthesized Step1X Qwen2Connector state dict and check
    connector_apply against an independent torch re-implementation of the
    reference connector forward (token refiner + global projection; invoked
    by the reference at RegionE/Step1XEdit/inplace.py:514-520).  Covers the
    fused-qkv split, LayerNorm affine mapping, gate-only AdaLN, and the
    raw-feature pooled head with (1 + scale_factor) scaling."""
    import torch
    from regione_tpu.models.layers import timestep_embedding
    from regione_tpu.weights.convert import convert_connector
    from tests.test_convert import synth_connector_state

    cfg = ConnectorConfig(in_dim=24, hidden=24, heads=3, depth=2,
                          pooled_dim=8, time_embed_dim=32,
                          dtype=jnp.float32)
    p = init_connector(jax.random.PRNGKey(7), cfg)
    # randomize the norm scales/biases and scale_factor so the mapping of
    # each is actually exercised (init is ones/zeros)
    rng = np.random.default_rng(7)
    p = jax.tree.map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape) * 0.3, jnp.float32), p)
    state = synth_connector_state(p, cfg)
    back = convert_connector(state, cfg)
    back_j = jax.tree.map(jnp.asarray, back)

    feats = rng.standard_normal((2, 6, cfg.in_dim)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    t = np.asarray([0.7, 0.2], np.float32)

    out, y = connector_apply(back_j, cfg, jnp.asarray(feats),
                             jnp.asarray(t), jnp.asarray(mask))

    # --- torch oracle over the SAME torch-naming state dict --------------
    sd = {k: torch.tensor(np.asarray(v, np.float32))
          for k, v in state.items()}

    def lin(name, x):
        return x @ sd[f"connector.{name}.weight"].T + sd[f"connector.{name}.bias"]

    xt = torch.tensor(feats)
    m = torch.tensor(mask.astype(np.float32)).unsqueeze(-1)
    mean_raw = (xt * m).sum(1) / m.sum(1)
    y_ref = lin("global_proj_out",
                mean_raw * (1 + sd["connector.scale_factor"]))

    # frequency embedding is a shared math primitive (flux convention)
    t_freq = torch.tensor(np.asarray(
        timestep_embedding(jnp.asarray(t), cfg.time_embed_dim), np.float32))
    temb = lin("S.t_embedder.mlp.2",
               torch.nn.functional.silu(lin("S.t_embedder.mlp.0", t_freq)))
    cemb = lin("S.c_embedder.linear_2",
               torch.nn.functional.silu(lin("S.c_embedder.linear_1", mean_raw)))
    c = temb + cemb
    h = lin("S.input_embedder", xt)
    hd = cfg.hidden // cfg.heads
    for i in range(cfg.depth):
        b = f"S.individual_token_refiner.blocks.{i}"
        gates = lin(f"{b}.adaLN_modulation.1", torch.nn.functional.silu(c))
        gate_msa, gate_mlp = gates.chunk(2, dim=-1)
        nx = torch.nn.functional.layer_norm(
            h, (cfg.hidden,), sd[f"connector.{b}.norm1.weight"],
            sd[f"connector.{b}.norm1.bias"], eps=1e-6)
        qkv = lin(f"{b}.self_attn_qkv", nx)
        q, k, v = qkv.chunk(3, dim=-1)

        def heads(x):
            bb, s, _ = x.shape
            return x.reshape(bb, s, cfg.heads, hd).transpose(1, 2)

        key_mask = torch.tensor(mask)[:, None, None, :]
        attn = torch.nn.functional.scaled_dot_product_attention(
            heads(q), heads(k), heads(v), attn_mask=key_mask)
        attn = attn.transpose(1, 2).reshape(h.shape)
        h = h + gate_msa.unsqueeze(1) * lin(f"{b}.self_attn_proj", attn)
        nx2 = torch.nn.functional.layer_norm(
            h, (cfg.hidden,), sd[f"connector.{b}.norm2.weight"],
            sd[f"connector.{b}.norm2.bias"], eps=1e-6)
        h = h + gate_mlp.unsqueeze(1) * lin(
            f"{b}.mlp.fc2",
            torch.nn.functional.silu(lin(f"{b}.mlp.fc1", nx2)))

    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    # padded query rows are ignored downstream; compare valid rows only
    out_np, ref_np = np.asarray(out), h.numpy()
    for bi in range(2):
        valid = int(mask[bi].sum())
        np.testing.assert_allclose(out_np[bi, :valid], ref_np[bi, :valid],
                                   rtol=2e-4, atol=2e-4)


def test_txt_bias_masks_text_in_both_streams():
    """Masked text columns must not influence image outputs in dense OR
    rags mode — covers single blocks (txt-in-stream) + double blocks."""
    import dataclasses
    from regione_tpu.models.mmdit import MODE_RAGS, MODE_WRITE, init_cache

    cfg = get_config("tiny")  # has 2 double + 2 single blocks
    params = init_mmdit(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(4)
    from regione_tpu.pipelines.base import EditPipelineBase
    from regione_tpu.core.config import RegionEParams
    from regione_tpu.core.gamma import gamma_for
    pipe = EditPipelineBase(cfg, params, RegionEParams(),
                            gamma=gamma_for("step1x-edit"))
    grid, t_txt = 4, 8
    s = grid * grid
    s_kv = 2 * s
    rope_img, rope_txt = pipe.build_rope(grid, grid, t_txt)
    img = jnp.asarray(rng.standard_normal((1, s_kv, cfg.in_channels)), jnp.float32)
    txt = np.asarray(rng.standard_normal((1, t_txt, cfg.txt_in_dim)), np.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    bias = np.zeros((1, 1, 1, t_txt + s_kv), np.float32)
    bias[..., 4:t_txt] = -1e9  # mask the last 4 text tokens
    t = jnp.full((1,), 0.6)

    def fwd(txt_arr, mode, cache=None, sel=None, rope=rope_img):
        return mmdit_forward(params, cfg, img if mode == MODE_WRITE else img,
                             jnp.asarray(txt_arr), t, rope, rope_txt,
                             pooled=pooled, mode=mode, cache=cache,
                             sel_img_ids=sel, txt_bias=jnp.asarray(bias))

    cache0 = init_cache(cfg, 1, s_kv, t_txt)
    v1, cache1 = fwd(txt, MODE_WRITE, cache=cache0)
    txt2 = txt.copy()
    txt2[0, 5] = 777.0  # perturb a MASKED token
    v2, cache2 = fwd(txt2, MODE_WRITE, cache=cache0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-5, atol=2e-5)

    # rags mode: gathered queries against the cache, same invariance.
    # NOTE: masked-but-perturbed txt rows DO write different K/V rows into
    # the single-block cache, but the bias hides those columns.
    ids = jnp.asarray(np.array([0, 3, 7, s_kv], np.int32))  # 1 pad slot
    from regione_tpu.models.layers import gather_rope
    rope_act = gather_rope(rope_img, ids)
    act = jnp.asarray(rng.standard_normal((1, 4, cfg.in_channels)), jnp.float32)
    r1, _ = mmdit_forward(params, cfg, act, jnp.asarray(txt), t, rope_act,
                          rope_txt, pooled=pooled, mode=MODE_RAGS,
                          cache=cache1, sel_img_ids=ids,
                          txt_bias=jnp.asarray(bias))
    r2, _ = mmdit_forward(params, cfg, act, jnp.asarray(txt2), t, rope_act,
                          rope_txt, pooled=pooled, mode=MODE_RAGS,
                          cache=cache2, sel_img_ids=ids,
                          txt_bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(r1[:, :3]), np.asarray(r2[:, :3]),
                               rtol=2e-5, atol=2e-5)
