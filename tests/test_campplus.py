"""CAMPPlus + kaldi-fbank tests.

Parity is checked against the actual reference implementation imported
read-only from /root/reference (golden-generation only — no code is copied).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.dsp.fbank import kaldi_fbank, kaldi_mel_banks, povey_window
from seedvc_tpu.models.campplus import CAMPPlus

REF = "/root/reference"


def test_fbank_shapes_and_determinism():
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    feat = kaldi_fbank(jnp.asarray(wave))
    assert feat.shape == (2, 1 + (16000 - 400) // 160, 80)
    feat2 = kaldi_fbank(jnp.asarray(wave))
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(feat2))


def test_fbank_matches_independent_numpy():
    """Independent numpy implementation of the Kaldi fbank pipeline."""
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(8000).astype(np.float32) * 0.1)

    win, hop, padded = 400, 160, 512
    n = 1 + (len(wave) - win) // hop
    frames = np.stack([wave[i * hop:i * hop + win].copy() for i in range(n)])
    frames -= frames.mean(-1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], -1)
    frames = frames - 0.97 * pre
    frames = frames * povey_window(win)
    frames = np.pad(frames, ((0, 0), (0, padded - win)))
    spec = np.fft.rfft(frames, padded)
    power = np.abs(spec) ** 2
    mel = power @ kaldi_mel_banks(80, padded, 16000.0).T
    ref = np.log(np.maximum(mel, np.finfo(np.float32).eps))

    ours = np.asarray(kaldi_fbank(jnp.asarray(wave)))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_mel_banks_basic_properties():
    banks = kaldi_mel_banks(80, 512, 16000.0)
    assert banks.shape == (80, 257)
    assert (banks >= 0).all()
    assert banks[:, -1].max() == 0.0  # nyquist column empty
    # every filter has nonzero support and peaks <= 1
    assert (banks.max(axis=1) > 0).all()
    assert banks.max() <= 1.0 + 1e-6


def test_campplus_shapes():
    model = CAMPPlus(feat_dim=80, embedding_size=192)
    x = jnp.zeros((1, 150, 80))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 192)


@pytest.mark.slow
def test_campplus_parity_with_reference():
    """Convert random torch weights -> JAX; outputs must match the torch
    reference forward allclose."""
    import torch

    sys.path.insert(0, REF)
    try:
        from modules.campplus.DTDNN import CAMPPlus as TorchCAMPPlus
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    tm = TorchCAMPPlus(feat_dim=80, embedding_size=192)
    tm.eval()
    # randomize BN running stats so parity actually tests them
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    from seedvc_tpu.convert.campplus import convert_campplus

    params = convert_campplus(tm.state_dict())
    model = CAMPPlus(feat_dim=80, embedding_size=192)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 230, 80)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
