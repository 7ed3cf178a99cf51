"""Fused Pallas anti-alias-snake kernel vs. the jnp composition.

On CPU the kernel runs in interpreter mode — same program, same numbers."""

import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.nn.snake import downsample2x, snake, upsample2x
from seedvc_tpu.ops.pallas.anti_alias import anti_alias_snake


def composition(x, alpha, beta, logscale=True):
    h = upsample2x(x)
    h = snake(h, alpha, beta, logscale)
    return downsample2x(h)


@pytest.mark.parametrize("B,T,C", [(1, 512, 128), (2, 333, 24), (1, 40, 64),
                                   (1, 1500, 48), (1, 1024, 24),
                                   (2, 96, 96)])
def test_fused_matches_composition(B, T, C):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    alpha = (rng.standard_normal(C) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(C) * 0.3).astype(np.float32)

    ref = np.asarray(composition(jnp.asarray(x), jnp.asarray(alpha),
                                 jnp.asarray(beta)))
    fused = np.asarray(anti_alias_snake(jnp.asarray(x), jnp.asarray(alpha),
                                        jnp.asarray(beta), tile_t=128))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)


def test_fused_nonlogscale():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 100, 32)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(32)).astype(np.float32) + 0.5
    beta = np.abs(rng.standard_normal(32)).astype(np.float32) + 0.5
    ref = np.asarray(composition(jnp.asarray(x), jnp.asarray(alpha),
                                 jnp.asarray(beta), logscale=False))
    fused = np.asarray(anti_alias_snake(jnp.asarray(x), jnp.asarray(alpha),
                                        jnp.asarray(beta), logscale=False,
                                        tile_t=64))
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)
