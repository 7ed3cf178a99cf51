"""RMVPE parity vs reference torch implementation (random weights)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.dsp.mel import mel_filterbank
from seedvc_tpu.models.rmvpe import RMVPE_E2E, decode_f0, rmvpe_mel

REF = "/root/reference"


def test_rmvpe_mel_matches_torch():
    import torch

    from conftest import import_reference

    MelSpectrogram = import_reference("modules.rmvpe").MelSpectrogram

    tm = MelSpectrogram(False, 128, 16000, 1024, 160, None, 30, 8000)
    wave = (np.random.default_rng(0).standard_normal((1, 8000)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wave), center=True).numpy()  # (B, 128, T)
    ours = np.asarray(rmvpe_mel(jnp.asarray(wave)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_rmvpe_e2e_parity():
    import torch

    from conftest import import_reference

    E2E = import_reference("modules.rmvpe").E2E

    torch.manual_seed(0)
    tm = E2E(4, 1, (2, 2)).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    from seedvc_tpu.convert.rmvpe import convert_rmvpe

    params = convert_rmvpe(tm.state_dict())
    model = RMVPE_E2E()

    mel = (np.random.default_rng(1).standard_normal((1, 128, 32)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()  # input (B, n_mels, T)
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(mel.transpose(0, 2, 1))))
    assert ours.shape == ref.shape == (1, 32, 360)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)


def test_decode_f0():
    sal = np.zeros((5, 360), np.float32)
    sal[0, 100] = 1.0          # strong peak
    sal[1, :] = 0.001          # below threshold -> unvoiced
    sal[2, 200] = 0.5
    f0 = decode_f0(sal, thred=0.03)
    cents = 20 * 100 + 1997.3794084376191
    assert abs(f0[0] - 10 * 2 ** (cents / 1200)) < 1.0
    assert f0[1] == 0.0
    assert f0[3] == 0.0 and f0[4] == 0.0
