"""VAE shape/roundtrip and token-packing tests."""

import numpy as np
import jax
import jax.numpy as jnp

from regione_tpu.models import vae as V

TINY = V.VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                   norm_num_groups=4, layers_per_block=1)


def test_encode_decode_shapes():
    params = V.init_vae(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                      jnp.float32)
    z = V.encode(params["encoder"], TINY, img)
    assert z.shape == (1, 16, 16, 4)  # /2 per downsample (1 downsample here)
    out = V.decode(params["decoder"], TINY, z)
    assert out.shape == (1, 32, 32, 3)


def test_latent_normalization_roundtrip():
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 4, 4)),
                    jnp.float32)
    zn = V.normalize_latents(TINY, z)
    np.testing.assert_allclose(np.asarray(V.denormalize_latents(TINY, zn)),
                               np.asarray(z), rtol=1e-5, atol=1e-6)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    tokens = V.pack_latents(z)
    assert tokens.shape == (2, 4 * 6, 64)
    back = V.unpack_latents(tokens, 4, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z))


def test_pack_spatial_order():
    # token (i, j) must contain the 2x2 patch at rows 2i:2i+2, cols 2j:2j+2
    z = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    t = V.pack_latents(z)
    # token 0 = patch (0:2, 0:2) = values 0,1,4,5 in order (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(np.asarray(t[0, 0]), [0, 1, 4, 5])
    # token 1 = patch (0:2, 2:4)
    np.testing.assert_array_equal(np.asarray(t[0, 1]), [2, 3, 6, 7])
