"""WavLM x-vector extractor: parity vs HF WavLMForXVector (random weights).

The reference eval harness scores SECS with microsoft/wavlm-base-plus-sv
(``eval.py:293-303``); this checks our from-scratch JAX port + converter
reproduce the torch forward exactly (gated relative position bias, post-LN
layers, weighted layer sum, TDNN + stats pooling head).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.convert.wavlm_sv import convert_wavlm_sv
from seedvc_tpu.models.wavlm_sv import (WavLMSV, WavLMSVConfig,
                                        relative_position_buckets)


def tiny_torch_wavlm():
    import torch
    from transformers.models.wavlm.configuration_wavlm import WavLMConfig
    from transformers.models.wavlm.modeling_wavlm import WavLMForXVector

    cfg = WavLMConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, conv_dim=(16,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=False, feat_extract_norm="group", do_stable_layer_norm=False,
        num_buckets=40, max_bucket_distance=80, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, use_weighted_layer_sum=True,
        tdnn_dim=(24, 24, 24, 24, 48), tdnn_kernel=(5, 3, 3, 1, 1),
        tdnn_dilation=(1, 2, 3, 1, 1), xvector_output_dim=20,
        layerdrop=0.0, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, final_dropout=0.0,
        mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    model = WavLMForXVector(cfg).eval()
    # make layer weights / gates non-trivial so the test exercises them
    with torch.no_grad():
        model.layer_weights.copy_(torch.tensor([0.2, 1.0, -0.5]))
        for layer in model.wavlm.encoder.layers:
            layer.attention.gru_rel_pos_const.uniform_(0.5, 1.5)
    return model


def jax_cfg():
    return WavLMSVConfig(
        conv_dim=16, d_model=48, n_layers=2, n_heads=4, ffn_dim=96,
        num_buckets=40, max_distance=80, pos_conv_kernel=16,
        pos_conv_groups=4, tdnn_dims=(24, 24, 24, 24, 48),
        tdnn_kernels=(5, 3, 3, 1, 1), tdnn_dilations=(1, 2, 3, 1, 1),
        xvector_dim=20)


def test_relative_position_buckets_match_torch():
    import torch
    from transformers.models.wavlm.modeling_wavlm import WavLMAttention

    attn = WavLMAttention(embed_dim=48, num_heads=4, num_buckets=40,
                          max_distance=80)
    T = 37
    ctx = torch.arange(T)[:, None]
    mem = torch.arange(T)[None, :]
    ref = attn._relative_positions_bucket(mem - ctx).numpy()
    ours = relative_position_buckets(T, 40, 80)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_wavlm_sv_forward_parity():
    import torch

    tm = tiny_torch_wavlm()
    params = convert_wavlm_sv(tm.state_dict(), n_layers=2)

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 12000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wave)).embeddings.numpy()

    model = WavLMSV(jax_cfg())
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wave),
                                  normalize=False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    # init'able from scratch too (eval harness without a checkpoint)
    p2 = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8000)))["params"]
    chex_tree = jax.tree_util.tree_structure(p2)
    assert chex_tree == jax.tree_util.tree_structure(params)


@pytest.mark.slow
def test_wavlm_sv_padded_masked_parity():
    """Zero-padded waves with ``lengths`` must match HF's attention_mask
    path (normalization, attention and stats pooling all ignore padding) —
    the eval harness pads to 5 s buckets (``apps/eval.py``)."""
    import torch

    tm = tiny_torch_wavlm()
    params = convert_wavlm_sv(tm.state_dict(), n_layers=2)

    rng = np.random.default_rng(1)
    lens = [9000, 12000]
    T = 16000
    wave = np.zeros((2, T), np.float32)
    mask = np.zeros((2, T), np.int64)
    for i, ln in enumerate(lens):
        wave[i, :ln] = (rng.standard_normal(ln) * 0.1).astype(np.float32)
        mask[i, :ln] = 1
    with torch.no_grad():
        ref = tm(torch.from_numpy(wave),
                 attention_mask=torch.from_numpy(mask)).embeddings.numpy()

    model = WavLMSV(jax_cfg())
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(wave), normalize=False,
        lengths=jnp.asarray(lens, jnp.int32)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    # and the masked padded forward equals the unpadded forward per sample
    for i, ln in enumerate(lens):
        solo = np.asarray(model.apply(
            {"params": params}, jnp.asarray(wave[i:i + 1, :ln]),
            normalize=False))
        np.testing.assert_allclose(ours[i:i + 1], solo, atol=2e-4, rtol=1e-3)
