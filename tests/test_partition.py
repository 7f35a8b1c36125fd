"""Token selector / morphology / gather-scatter tests against tiny numpy
oracles (the reference has zero tests — SURVEY.md §4 — so these encode its
behavior from first principles)."""

import numpy as np
import jax.numpy as jnp
import pytest

from regione_tpu.core.masking import (
    gather_rows,
    mask_to_padded_ids,
    padded_ids_valid,
    scatter_rows,
    where_rows,
)
from regione_tpu.core.partition import (
    morphological_dilation,
    morphological_erosion,
    remove_scattered_points,
    select_edited_mask,
    token_similarity,
    _cross_kernel,
    _square_kernel,
)


def test_erosion_oracle():
    m = np.zeros((7, 7), bool)
    m[2:5, 2:5] = True  # 3x3 block
    out = np.asarray(morphological_erosion(jnp.asarray(m), _cross_kernel(3)))
    # only the center survives a 3x3 cross erosion of a 3x3 block
    expected = np.zeros((7, 7), bool)
    expected[3, 3] = True
    np.testing.assert_array_equal(out, expected)


def test_dilation_oracle():
    m = np.zeros((7, 7), bool)
    m[3, 3] = True
    out = np.asarray(morphological_dilation(jnp.asarray(m), _square_kernel(3)))
    expected = np.zeros((7, 7), bool)
    expected[2:5, 2:5] = True
    np.testing.assert_array_equal(out, expected)


def test_remove_scattered_points_kills_isolated_pixel():
    m = np.zeros((8, 8), bool)
    m[1, 1] = True  # isolated point: erosion kills it
    m[4:7, 4:7] = True  # solid blob: survives and is re-expanded
    out = np.asarray(remove_scattered_points(jnp.asarray(m)))
    assert not out[1, 1]
    assert out[5, 5]
    # center of blob erodes to (5,5), 5x5 dilation spans rows/cols 3..7
    expected = np.zeros((8, 8), bool)
    expected[3:8, 3:8] = True
    np.testing.assert_array_equal(out, expected)


def test_cosine_similarity_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 16, 8)).astype(np.float32)
    b = rng.standard_normal((1, 16, 8)).astype(np.float32)
    got = np.asarray(token_similarity(jnp.asarray(a), jnp.asarray(b), "cosine"))
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, (an * bn).sum(-1), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["dot", "mse", "diff_std", "euclidean"])
def test_other_similarities_run(kind):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    out = token_similarity(a, b, kind)
    assert out.shape == (1, 16)


def test_select_edited_mask_threshold_semantics():
    # identical tokens -> cosine 1 -> unedited; orthogonal -> 0 -> edited
    s, d = 16, 4
    x = np.zeros((1, s, d), np.float32)
    ref = np.zeros((1, s, d), np.float32)
    x[..., 0] = 1.0
    ref[..., 0] = 1.0
    # make tokens 0..7 orthogonal to ref (edited)
    x[0, :8, 0] = 0.0
    x[0, :8, 1] = 1.0
    mask = np.asarray(
        select_edited_mask(
            jnp.asarray(x), jnp.asarray(ref), 0.88,
            grid_h=4, grid_w=4, erosion_dilation=False,
        )
    )
    np.testing.assert_array_equal(mask, np.arange(s) < 8)


def test_select_edited_mask_with_morphology_grid():
    # a solid 4x4 edited block inside an 8x8 grid survives; isolated pixel dies
    gh = gw = 8
    s, d = gh * gw, 4
    x = np.tile(np.array([1.0, 0, 0, 0], np.float32), (1, s, 1)).reshape(1, s, d)
    ref = x.copy()
    m = np.zeros((gh, gw), bool)
    m[2:6, 2:6] = True
    m[0, 7] = True  # isolated
    flat = m.reshape(-1)
    x[0, flat, 0] = 0.0
    x[0, flat, 1] = 1.0  # orthogonal -> edited
    mask = np.asarray(
        select_edited_mask(
            jnp.asarray(x), jnp.asarray(ref), 0.5,
            grid_h=gh, grid_w=gw, erosion_dilation=True,
        )
    ).reshape(gh, gw)
    assert not mask[0, 7]
    assert mask[3, 3]


def test_mask_to_padded_ids_and_validity():
    mask = np.array([1, 0, 1, 1, 0, 0, 0, 1], bool)
    ids = mask_to_padded_ids(mask, 6)
    np.testing.assert_array_equal(ids, np.array([0, 2, 3, 7, 8, 8], np.int32))
    valid = np.asarray(padded_ids_valid(jnp.asarray(ids), 8))
    np.testing.assert_array_equal(valid, [1, 1, 1, 1, 0, 0])


def test_gather_scatter_roundtrip_with_padding():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 4)).astype(np.float32)
    ids = jnp.asarray(np.array([1, 3, 6, 8, 8], np.int32))  # 2 padded slots
    g = gather_rows(jnp.asarray(x), ids)
    assert g.shape == (2, 5, 4)
    np.testing.assert_array_equal(np.asarray(g[:, 3:]), 0.0)  # fill
    np.testing.assert_allclose(np.asarray(g[:, 0]), x[:, 1])

    dst = jnp.zeros((2, 8, 4))
    out = np.asarray(scatter_rows(dst, ids, g * 2.0))
    np.testing.assert_allclose(out[:, 1], 2 * x[:, 1])
    np.testing.assert_allclose(out[:, 3], 2 * x[:, 3])
    np.testing.assert_allclose(out[:, 6], 2 * x[:, 6])
    np.testing.assert_array_equal(out[:, 0], 0.0)
    np.testing.assert_array_equal(out[:, 7], 0.0)  # padding dropped


def test_where_rows():
    mask = jnp.asarray(np.array([1, 0, 1], bool))
    a = jnp.ones((1, 3, 2))
    b = jnp.zeros((1, 3, 2))
    out = np.asarray(where_rows(mask, a, b))
    np.testing.assert_array_equal(out[0, :, 0], [1, 0, 1])
