"""Parity tests for the custom DiT attention kernel
(seedvc_tpu/ops/pallas/attention.py) vs the jnp reference — CPU interpret
mode (same kernel code path the TPU compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.nn.layers import apply_rope, rope_cache, rope_full_cache
from seedvc_tpu.ops.pallas.attention import (dit_attention,
                                             dit_attention_fused,
                                             dit_attention_reference)


@pytest.mark.parametrize("lens", [None, (200, 256)])
def test_dit_attention_parity_f32(lens):
    rng = np.random.default_rng(0)
    B, H, T, d = 2, 3, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3))
    lens_arr = None if lens is None else jnp.asarray(lens)
    out = dit_attention(q, k, v, lens_arr, block_q=128)
    ref = dit_attention_reference(q, k, v, lens_arr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dit_attention_bf16_close():
    rng = np.random.default_rng(1)
    B, H, T, d = 1, 2, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.bfloat16)
               for _ in range(3))
    lens = jnp.array([250])
    out = dit_attention(q, k, v, lens, block_q=128).astype(jnp.float32)
    ref = dit_attention_reference(q, k, v, lens).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_dit_attention_masked_ignores_padded_keys():
    """Changing key/value content beyond lens must not change the output."""
    rng = np.random.default_rng(2)
    B, H, T, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    lens = jnp.array([128])
    out1 = dit_attention(q, k, v, lens, block_q=128)
    k2 = k.at[:, :, 128:].set(99.0)
    v2 = v.at[:, :, 128:].set(-99.0)
    out2 = dit_attention(q, k2, v2, lens, block_q=128)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_dit_attention_rejects_bad_block():
    q = jnp.zeros((1, 1, 100, 64))
    with pytest.raises(ValueError):
        dit_attention(q, q, q, None, block_q=64)


def _fused_reference(q, k, v, lens, base=10000.0):
    """apply_rope + materialised-logits attention on (B, H, T, d) inputs."""
    T, d = q.shape[2], q.shape[3]
    freqs = jnp.asarray(rope_cache(T, d, base))
    # apply_rope expects (B, T, H, d)
    qr = apply_rope(q.transpose(0, 2, 1, 3), freqs).transpose(0, 2, 1, 3)
    kr = apply_rope(k.transpose(0, 2, 1, 3), freqs).transpose(0, 2, 1, 3)
    return dit_attention_reference(qr, kr, v, lens)


@pytest.mark.parametrize("lens", [None, (200, 256)])
def test_dit_attention_fused_parity_f32(lens):
    """Fused kernel (in-kernel RoPE, deferred normalisation) vs the unfused
    apply_rope + attention composition."""
    rng = np.random.default_rng(3)
    B, H, T, d = 2, 4, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3))
    cos, sin = (jnp.asarray(a) for a in rope_full_cache(T, d))
    lens_arr = None if lens is None else jnp.asarray(lens)
    out = dit_attention_fused(q, k, v, cos, sin, lens_arr, block_q=128)
    ref = _fused_reference(q, k, v, lens_arr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dit_attention_fused_bf16_close():
    rng = np.random.default_rng(4)
    B, H, T, d = 1, 2, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.bfloat16)
               for _ in range(3))
    cos, sin = (jnp.asarray(a) for a in rope_full_cache(T, d))
    lens = jnp.array([250])
    out = dit_attention_fused(q, k, v, cos, sin, lens,
                              block_q=128).astype(jnp.float32)
    ref = _fused_reference(q, k, v, lens).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)


def test_dit_attention_fused_masked_ignores_padded_keys():
    rng = np.random.default_rng(5)
    B, H, T, d = 1, 2, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3))
    cos, sin = (jnp.asarray(a) for a in rope_full_cache(T, d))
    lens = jnp.array([128])
    out1 = dit_attention_fused(q, k, v, cos, sin, lens, block_q=128)
    k2 = k.at[:, :, 128:].set(99.0)
    v2 = v.at[:, :, 128:].set(-99.0)
    out2 = dit_attention_fused(q, k2, v2, cos, sin, lens, block_q=128)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_fused_reference_matches_kernel_forward():
    rng = np.random.default_rng(5)
    B, H, T, d = 1, 2, 256, 64
    from seedvc_tpu.ops.pallas.attention import dit_attention_fused_reference

    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3))
    cos, sin = (jnp.asarray(a) for a in rope_full_cache(T, d))
    lens = jnp.array([200])
    out = dit_attention_fused(q, k, v, cos, sin, lens, block_q=128)
    ref = dit_attention_fused_reference(q, k, v, cos, sin, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_attention_is_differentiable():
    """Training through the kernel path (custom_vjp recompute backward):
    gradients match differentiating the jnp reference."""
    rng = np.random.default_rng(6)
    B, H, T, d = 1, 2, 256, 64
    from seedvc_tpu.ops.pallas.attention import (
        dit_attention_diff, dit_attention_fused_diff,
        dit_attention_fused_reference)

    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3))
    cos, sin = (jnp.asarray(a) for a in rope_full_cache(T, d))
    lens = jnp.array([200])

    def loss_kernel(q, k, v):
        return jnp.sum(dit_attention_fused_diff(q, k, v, cos, sin, lens,
                                                block_q=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dit_attention_fused_reference(q, k, v, cos, sin,
                                                     lens) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # plain (post-RoPE) kernel too
    def loss_plain(q, k, v):
        return jnp.sum(dit_attention_diff(q, k, v, lens, block_q=128) ** 2)

    g = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
