"""RegionEHelper facade tests (parity surface of reference
RegionE/tool/RegionE.py:9-51)."""

import jax
import numpy as np
import pytest

from regione_tpu.api import BACKEND_DEFAULTS, RegionEHelper
from regione_tpu.core.config import RegionEParams
from regione_tpu.models.mmdit import init_mmdit
from regione_tpu.models.presets import get_config
from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline


def make_pipe():
    cfg = get_config("tiny")
    params = init_mmdit(jax.random.PRNGKey(0), cfg)
    return Step1XEditPipeline(cfg, params, RegionEParams())


def test_defaults_table_matches_reference():
    # reference RegionE/tool/RegionE.py:1-7
    assert BACKEND_DEFAULTS["step1x-edit"]["threshold"] == 0.88
    assert BACKEND_DEFAULTS["step1x-edit"]["cache_threshold"] == 0.02
    assert BACKEND_DEFAULTS["flux-kontext"]["threshold"] == 0.93
    assert BACKEND_DEFAULTS["flux-kontext"]["cache_threshold"] == 0.04
    assert BACKEND_DEFAULTS["qwen-image-edit"]["threshold"] == 0.80
    assert BACKEND_DEFAULTS["qwen-image-edit"]["cache_threshold"] == 0.03
    for cfg in BACKEND_DEFAULTS.values():
        assert cfg["num_inference_steps"] == 28
        assert cfg["warmup_step"] == 6 and cfg["post_step"] == 2
        assert cfg["refresh_step"] == "16"
        assert cfg["erosion_dilation"] is True


def test_helper_enable_disable_toggles_pipeline():
    pipe = make_pipe()
    helper = RegionEHelper(pipe)
    assert helper.backend == "step1x-edit"
    helper.enable()
    assert pipe._regione_enabled is True
    helper.disable()
    assert pipe._regione_enabled is False


def test_helper_set_params_validation():
    pipe = make_pipe()
    helper = RegionEHelper(pipe)
    helper.set_params(warmup_step=5, refresh_step="14", threshold=0.5)
    assert pipe.re.warmup_step == 5
    assert pipe.re.refresh_step == (14,)
    with pytest.raises(AssertionError):
        helper.set_params(num_inference_steps=30)
    with pytest.raises(AssertionError):
        helper.set_params(refresh_step="12,13")


def test_helper_rejects_unknown_pipeline():
    class Foo:
        pass
    with pytest.raises(ValueError):
        RegionEHelper(Foo())
