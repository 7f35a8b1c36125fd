"""Golden external fixtures for the two riskiest conventions (VERDICT r1
item 6): the flow-match sigma schedule and the Qwen rotary embedding.

Round 1 validated both against oracles living in this repo — a shared
misunderstanding would have passed.  These tests compare against
INDEPENDENT torch transcriptions of the upstream diffusers code the
reference inherits (diffusers is not installed in this container, so the
transcriptions follow the published implementations line-for-line and are
anchored by hand-computed literal values):

  * FlowMatchEulerDiscreteScheduler.set_timesteps with dynamic shifting:
    sigma' = e^mu / (e^mu + (1/sigma - 1)), sigmas = linspace(1, 1/N, N),
    terminal 0 appended (the reference pipelines pass exactly this —
    src/Step1X-Edit/utils.py calculate_shift + retrieve_timesteps).
  * QwenEmbedRope (diffusers transformer_qwenimage.py): per-image
    (frame=image index, centered height, centered width) positions built
    by splitting pos/neg frequency tables, scale_rope=True; text rows at
    diagonal positions offset by max(h//2, w//2); complex-polar
    frequencies applied on interleaved pairs.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# sigma schedule
# ---------------------------------------------------------------------------

# hand-computed literals: e^1.15 / (e^1.15 + 1/s - 1) for
# s = linspace(1, 1/28, 28)[i] at mu = calculate_shift(4096) = 1.15
SIGMA_GOLDEN_4096 = {
    0: 1.0,
    1: 0.9884086474,
    13: 0.7846715767,
    26: 0.1954545862,
    27: 0.1047208936,
}


def torch_flowmatch_sigmas(num_steps: int, mu: float) -> np.ndarray:
    """diffusers FlowMatchEulerDiscreteScheduler.set_timesteps transcription
    (use_dynamic_shifting=True, exponential time_shift, shift_terminal
    None): the pipeline passes sigmas=linspace(1, 1/N, N)."""
    sigmas = torch.linspace(1.0, 1.0 / num_steps, num_steps,
                            dtype=torch.float64)
    shifted = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    return torch.cat([shifted, torch.zeros(1, dtype=torch.float64)]).numpy()


def test_sigma_schedule_matches_diffusers_transcription():
    from regione_tpu.core.schedule import build_sigmas, calculate_shift
    mu = calculate_shift(4096)
    assert mu == pytest.approx(1.15, abs=1e-9)   # max_shift at 4096 tokens
    ours = np.asarray(build_sigmas(28, mu=mu), np.float64)
    ref = torch_flowmatch_sigmas(28, mu)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    for i, v in SIGMA_GOLDEN_4096.items():
        assert ours[i] == pytest.approx(v, abs=1e-6)


def test_sigma_schedule_matches_at_other_seq_lens():
    from regione_tpu.core.schedule import build_sigmas, calculate_shift
    for seq in (256, 1024, 2304):
        mu = calculate_shift(seq)
        ref = torch_flowmatch_sigmas(28, mu)
        ours = np.asarray(build_sigmas(28, mu=mu), np.float64)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Qwen rope
# ---------------------------------------------------------------------------


class TorchQwenEmbedRope:
    """Transcription of diffusers QwenEmbedRope (scale_rope=True), the
    module the reference's patched Qwen forward indexes into
    (RegionE/QwenImageEdit/inplace.py:530-531)."""

    def __init__(self, theta=10000, axes_dim=(16, 56, 56), max_pos=1024):
        self.theta = theta
        self.axes_dim = axes_dim
        pos = torch.arange(max_pos, dtype=torch.float64)
        neg = torch.arange(-max_pos, 0, dtype=torch.float64)
        self.pos_freqs = torch.cat(
            [self._rope_params(pos, d) for d in axes_dim], dim=1)
        self.neg_freqs = torch.cat(
            [self._rope_params(neg, d) for d in axes_dim], dim=1)

    def _rope_params(self, index, dim):
        freqs = 1.0 / (self.theta ** (
            torch.arange(0, dim, 2, dtype=torch.float64) / dim))
        angles = torch.outer(index, freqs)
        return torch.polar(torch.ones_like(angles), angles)  # complex

    def video_freqs(self, frame_idx, height, width):
        """One image's [h*w, head_dim/2] complex freqs (scale_rope)."""
        splits = [d // 2 for d in self.axes_dim]
        pos = torch.split(self.pos_freqs, splits, dim=1)
        neg = torch.split(self.neg_freqs, splits, dim=1)
        f = pos[0][frame_idx:frame_idx + 1]                     # [1, 8]
        h = torch.cat([neg[1][-(height - height // 2):],
                       pos[1][:height // 2]], dim=0)            # [h, 28]
        w = torch.cat([neg[2][-(width - width // 2):],
                       pos[2][:width // 2]], dim=0)             # [w, 28]
        out = torch.cat([
            f.view(1, 1, 1, -1).expand(1, height, width, -1),
            h.view(1, height, 1, -1).expand(1, height, width, -1),
            w.view(1, 1, width, -1).expand(1, height, width, -1),
        ], dim=-1)
        return out.reshape(height * width, -1)

    def txt_freqs(self, max_vid_index, length):
        return self.pos_freqs[max_vid_index:max_vid_index + length]


def _cos_sin_from_complex(freqs: "torch.Tensor"):
    """complex [S, D/2] -> interleave-repeated (cos, sin) [S, D], the
    use_real/interleaved layout both diffusers apply_rotary_emb_qwen and
    models.layers.apply_rope consume."""
    cos = freqs.real.repeat_interleave(2, dim=-1).numpy()
    sin = freqs.imag.repeat_interleave(2, dim=-1).numpy()
    return cos, sin


def test_qwen_rope_matches_diffusers_transcription():
    from regione_tpu.models.layers import rope_table
    from regione_tpu.models.presets import get_config
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline

    cfg = get_config("qwen-image-edit")
    pipe = QwenImageEditPipeline.__new__(QwenImageEditPipeline)
    pipe.cfg = cfg
    grid_h, grid_w, t_txt = 6, 8, 5
    cond_grids = [(4, 6)]   # a differently-sized reference image
    kv_ids, txt_ids = pipe.rope_position_ids(grid_h, grid_w, t_txt,
                                             cond_grids=cond_grids)
    cos, sin = rope_table(np.asarray(kv_ids), cfg.axes_dims, cfg.rope_theta)
    tcos, tsin = rope_table(np.asarray(txt_ids), cfg.axes_dims,
                            cfg.rope_theta)

    ref = TorchQwenEmbedRope(theta=cfg.rope_theta, axes_dim=cfg.axes_dims)
    ref_img = torch.cat([ref.video_freqs(0, grid_h, grid_w),
                         ref.video_freqs(1, 4, 6)], dim=0)
    rcos, rsin = _cos_sin_from_complex(ref_img)
    np.testing.assert_allclose(np.asarray(cos), rcos, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sin), rsin, atol=2e-6)

    max_vid = max(grid_h // 2, grid_w // 2, 4 // 2, 6 // 2)
    rtcos, rtsin = _cos_sin_from_complex(ref.txt_freqs(max_vid, t_txt))
    np.testing.assert_allclose(np.asarray(tcos), rtcos, atol=2e-6)
    np.testing.assert_allclose(np.asarray(tsin), rtsin, atol=2e-6)


def test_qwen_rope_literal_anchors():
    """Hand-computed spot values pinning the convention independent of any
    implementation: height coordinate of the FIRST row of a 6-row grid is
    -3 (centered, scale_rope), so its first height-axis angle pair is
    cos(-3 * 10000^0) = cos(-3)."""
    from regione_tpu.models.layers import rope_table
    from regione_tpu.models.presets import get_config
    from regione_tpu.pipelines.qwen_image_edit import QwenImageEditPipeline

    cfg = get_config("qwen-image-edit")
    pipe = QwenImageEditPipeline.__new__(QwenImageEditPipeline)
    pipe.cfg = cfg
    kv_ids, _ = pipe.rope_position_ids(6, 8, 4, cond_grids=[(6, 8)])
    # token 0 = (frame 0, y=-3, x=-4)
    np.testing.assert_array_equal(kv_ids[0], [0.0, -3.0, -4.0])
    # center token (y=0, x=0) exists: row 3*8 + 4
    np.testing.assert_array_equal(kv_ids[3 * 8 + 4], [0.0, 0.0, 0.0])
    # condition image tokens carry frame index 1
    assert kv_ids[6 * 8][0] == 1.0
    cos, sin = rope_table(np.asarray(kv_ids), cfg.axes_dims, cfg.rope_theta)
    # frame axis of token 0: angle 0 -> cos 1, sin 0 (first 16 dims)
    np.testing.assert_allclose(np.asarray(cos)[0, :16], 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sin)[0, :16], 0.0, atol=1e-7)
    # height axis first pair of token 0: angle = -3 * 10000^0 = -3
    assert np.asarray(cos)[0, 16] == pytest.approx(math.cos(-3.0), abs=1e-6)
    assert np.asarray(sin)[0, 16] == pytest.approx(math.sin(-3.0), abs=1e-6)
    # width axis first pair: angle -4
    assert np.asarray(cos)[0, 16 + 56] == pytest.approx(
        math.cos(-4.0), abs=1e-6)
