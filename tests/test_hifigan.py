"""HiFT generator parity vs reference torch implementation.

Randomness (sine phase, NSF noise) is stubbed to zero on both sides so the
comparison is deterministic."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.hifigan import (
    ConvRNNF0Predictor, HiFTConfig, HiFTGenerator, sine_source)

REF = "/root/reference"


@pytest.mark.slow
def test_hift_parity(monkeypatch):
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.hifigan.f0_predictor import ConvRNNF0Predictor as TorchF0
    from modules.hifigan.generator import HiFTGenerator as TorchHiFT

    cfg = HiFTConfig()
    torch.manual_seed(0)
    tf0 = TorchF0()
    tm = TorchHiFT(f0_predictor=tf0)
    tm.eval()
    with torch.no_grad():
        for name, prm in tm.named_parameters():
            if "activations" in name and name.endswith("alpha"):
                prm.uniform_(0.5, 1.5)

    # stub torch randomness: zero phase + zero noise
    monkeypatch.setattr(
        "modules.hifigan.generator.Uniform",
        lambda low, high: type("U", (), {
            "sample": lambda self, sample_shape: torch.zeros(*sample_shape)
        })())
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    # stub jax randomness similarly
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape, **kw: jnp.zeros(shape))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, **kw: jnp.zeros(shape))

    from seedvc_tpu.convert.hifigan import convert_hift

    params = convert_hift(tm.state_dict(), cfg)
    model = HiFTGenerator(cfg)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 20)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()

    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(mel.transpose(0, 2, 1)),
                                  jax.random.PRNGKey(0)))
    assert ours.shape == ref.shape == (1, 20 * 256)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-2)


def test_sine_source_shapes():
    cfg = HiFTConfig()
    f0 = jnp.full((1, 1024), 220.0)
    sines, uv = sine_source(jax.random.PRNGKey(0), f0, cfg)
    assert sines.shape == (1, 1024, 9)
    assert uv.shape == (1, 1024, 1)
    assert float(uv.min()) == 1.0  # 220 Hz is voiced
