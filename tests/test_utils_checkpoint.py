"""Telemetry + orbax checkpoint tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.utils import telemetry
from regione_tpu.weights import checkpoint


def test_stage_timer_and_log(tmp_path):
    t = telemetry.StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("fwd", sync_on=x):
        y = x * 2
    assert "fwd" in t.as_dict() and t.segments["fwd"] >= 0
    telemetry.log_stats(tmp_path / "stats.jsonl",
                        {"speedup": np.float32(2.5), "segments": t.as_dict()})
    rec = json.loads(open(tmp_path / "stats.jsonl").read())
    assert rec["speedup"] == 2.5 and "ts" in rec


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.bfloat16)}}
    checkpoint.save(str(tmp_path / "ckpt"), tree)
    back = checkpoint.load(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    assert back["nested"]["b"].dtype == jnp.bfloat16


def test_checkpoint_restore_with_like(tmp_path):
    tree = {"w": jnp.ones((3, 3), jnp.float32)}
    checkpoint.save(str(tmp_path / "c2"), tree)
    back = checkpoint.load(str(tmp_path / "c2"), like=tree)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.ones((3, 3)))


def test_checkpoint_restore_directly_sharded(tmp_path):
    """load(sharding=...) restores straight into mesh-sharded arrays —
    the multi-GB path where an unsharded host round-trip would OOM
    (checkpoint.py docstring claim; needs the 8-device CPU mesh)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    tree = {"w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
            "b": jnp.ones((8,), jnp.float32)}
    checkpoint.save(str(tmp_path / "c3"), tree)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    shard = {"w": NamedSharding(mesh, P(None, "tp")),
             "b": NamedSharding(mesh, P())}
    back = checkpoint.load(str(tmp_path / "c3"), like=tree, sharding=shard)
    np.testing.assert_array_equal(np.asarray(back["w"]),
                                  np.asarray(tree["w"]))
    assert back["w"].sharding == shard["w"]
    # each addressable shard holds only its 8x2 column slice
    assert {s.data.shape for s in back["w"].addressable_shards} == {(8, 2)}


def test_profiler_trace_smoke(tmp_path):
    with telemetry.trace(str(tmp_path / "prof")):
        x = jnp.ones((16, 16)) @ jnp.ones((16, 16))
        telemetry.device_sync(x)
    # a trace directory with events must exist
    assert any((tmp_path / "prof").rglob("*"))


def test_enable_compile_cache_no_crash():
    telemetry.enable_compile_cache("/tmp/regione_tpu_test_cache")
