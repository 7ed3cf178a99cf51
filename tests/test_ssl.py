"""SSL encoder parity vs HF Wav2Vec2Model (random-init, layer-norm/stable
variant as used by XLS-R and HuBERT-large)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.ssl import SSLConfig, SSLEncoder


@pytest.mark.slow
def test_ssl_parity_wav2vec2():
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32] * 7,
        feat_extract_norm="layer", do_stable_layer_norm=True,
        conv_bias=True, num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16, feat_proj_dropout=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    tm = Wav2Vec2Model(hf_cfg).eval()

    from seedvc_tpu.convert.ssl import convert_ssl

    params = convert_ssl(tm.state_dict(), n_layers=2)
    cfg = SSLConfig(conv_dim=32, d_model=64, n_layers=2, n_heads=4,
                    ffn_dim=128, apply_final_norm=True)
    model = SSLEncoder(cfg)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    # HF feature extractor normalisation equivalent
    wn = (wave - wave.mean()) / np.sqrt(wave.var() + 1e-7)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wn)).last_hidden_state.numpy()

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wave)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)


@pytest.mark.slow
def test_ssl_truncated_no_final_norm():
    """XLSR-style truncation: first N layers, final norm still applied by HF
    Wav2Vec2Model (encoder.layer_norm) — verify we can match both modes."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32] * 7,
        feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(1)
    tm = Wav2Vec2Model(hf_cfg).eval()
    tm.encoder.layers = tm.encoder.layers[:2]  # reference truncation

    from seedvc_tpu.convert.ssl import convert_ssl

    params = convert_ssl(tm.state_dict(), n_layers=2)
    cfg = SSLConfig(conv_dim=32, d_model=64, n_layers=2, n_heads=4,
                    ffn_dim=128, apply_final_norm=True)
    model = SSLEncoder(cfg)

    wave = (np.random.default_rng(2).standard_normal((1, 8000)) * 0.1).astype(np.float32)
    wn = (wave - wave.mean()) / np.sqrt(wave.var() + 1e-7)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wn)).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wave)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)
