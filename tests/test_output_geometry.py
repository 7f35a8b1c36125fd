"""Output-geometry parity (VERDICT r4 item 6).

The reference plugin returns edits at the CALLER's original image
geometry: encode_image carries `img_info` and the decoded image goes
through `_output_process_image(image, img_info)`
(RegionE/Step1XEdit/inplace.py:188,449).  Its experimental mains instead
keep the processed resolution (src/Step1X-Edit/utils.py:449 comments the
post-pass out).  `__call__(resize_to_input=...)` exposes both behaviors,
defaulting to the plugin's."""

import numpy as np
import pytest

from regione_tpu.pipelines.step1x_edit import Step1XEditPipeline
from tests.test_prompt_conditioning import make_pipe


# original geometry deliberately NOT a multiple of the token factor and
# different from any snapped size
IN_H, IN_W = 52, 70
IMG = (np.random.default_rng(5).random((IN_H, IN_W, 3)) * 255
       ).astype(np.uint8)


@pytest.fixture()
def pipe(monkeypatch):
    p, _ = make_pipe(Step1XEditPipeline, "tiny-step1x")
    # tiny-scale stand-in for the production ~1024^2-area policy (the
    # resize-back logic is policy-independent)
    monkeypatch.setattr(type(p), "target_resolution", _area_policy)
    return p


def snapped_area_policy(area):
    """Tiny-scale stand-in for the production ~1024^2-area resolution
    policy (same snapping math, test-sized area).  Shared by the
    output-geometry and serve-geometry tests."""
    def policy(self, width, height):
        ratio = width / height
        f = self.token_factor
        w = int(round((area * ratio) ** 0.5 / f) * f)
        h = int(round((w / ratio) / f) * f)
        return max(f, w), max(f, h)
    return policy


_area_policy = snapped_area_policy(64 * 64)


def test_default_restores_input_geometry(pipe):
    out, _ = pipe(IMG, "make it night", seed=0)
    assert out.shape == (IN_H, IN_W, 3), out.shape
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0


def test_no_resize_keeps_processed_geometry(pipe):
    out, _ = pipe(IMG, "make it night", seed=0, resize_to_input=False)
    pw, ph = _area_policy(pipe, IN_W, IN_H)
    assert out.shape == (ph, pw, 3), (out.shape, (ph, pw))
    assert out.shape[:2] != (IN_H, IN_W)


def test_explicit_size_wins_over_resize_back(pipe):
    out, _ = pipe(IMG, "make it night", seed=0, width=64, height=64)
    assert out.shape == (64, 64, 3)


def test_resize_back_matches_direct_resize_of_processed(pipe):
    """The restored image IS the processed output bilinearly resized —
    no extra normalization or cropping sneaks in."""
    raw, _ = pipe(IMG, "make it night", seed=0, resize_to_input=False)
    restored, _ = pipe(IMG, "make it night", seed=0)
    expect = np.clip(pipe._resize(raw, IN_W, IN_H), 0.0, 1.0)
    np.testing.assert_allclose(restored, expect, atol=1e-6)
