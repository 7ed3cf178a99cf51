"""v1 DiT/CFM + regulator checkpoint conversion parity.

Builds the actual reference DiT (modules/diffusion_transformer.py) and
InterpolateRegulator with random weights, converts them, and checks the JAX
forward matches the torch forward — the gate for using published
checkpoints (SURVEY §7.2 step 8)."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, WavenetConfig)
from seedvc_tpu.models.cfm import CFM
from seedvc_tpu.models.regulator import InterpolateRegulator


def _ref_args(final_layer="wavenet"):
    return SimpleNamespace(
        DiT=SimpleNamespace(
            hidden_dim=64, num_heads=4, depth=5, class_dropout_prob=0.1,
            block_size=1024, in_channels=8, style_condition=True,
            final_layer_type=final_layer, target="mel", content_dim=16,
            content_codebook_size=32, content_type="continuous",
            f0_condition=False, n_f0_bins=32, content_codebooks=1,
            is_causal=False, long_skip_connection=True,
            zero_prompt_speech_token=False, time_as_token=False,
            style_as_token=False, uvit_skip_connection=True,
            add_resblock_in_transformer=False),
        wavenet=SimpleNamespace(hidden_dim=64, num_layers=2, kernel_size=5,
                                dilation_rate=1, p_dropout=0.0,
                                style_condition=True),
        style_encoder=SimpleNamespace(dim=24),
        reg_loss_type="l1",
        dit_type="DiT",
    )


def _my_params(final_layer="wavenet"):
    return ModelParams(
        DiT=DiTConfig(hidden_dim=64, num_heads=4, depth=5, in_channels=8,
                      final_layer_type=final_layer, content_dim=16,
                      long_skip_connection=True, uvit_skip_connection=True),
        wavenet=WavenetConfig(hidden_dim=64, num_layers=2, kernel_size=5,
                              dilation_rate=1, p_dropout=0.0),
        style_encoder=__import__(
            "seedvc_tpu.core.config", fromlist=["StyleEncoderConfig"]
        ).StyleEncoderConfig(dim=24),
    )


@pytest.mark.slow
@pytest.mark.parametrize("final_layer", ["wavenet", "mlp"])
def test_dit_conversion_parity(final_layer):
    import torch

    from conftest import import_reference

    ref_mod = import_reference("modules.diffusion_transformer")

    torch.manual_seed(0)
    args = _ref_args(final_layer)
    tm = ref_mod.DiT(args).eval()
    tm.setup_caches(1, 64)

    from seedvc_tpu.convert.dit import convert_dit

    sd = {f"estimator.{k}": v for k, v in tm.state_dict().items()}
    mp = _my_params(final_layer)
    params = convert_dit(sd, mp)

    B, C, T = 1, 8, 24
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    prompt = rng.standard_normal((B, C, T)).astype(np.float32)
    cond = rng.standard_normal((B, T, 16)).astype(np.float32)
    style = rng.standard_normal((B, 24)).astype(np.float32)
    t = np.array([0.4], np.float32)
    lens = torch.LongTensor([T])

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(prompt), lens,
                 torch.from_numpy(t), torch.from_numpy(style),
                 torch.from_numpy(cond), False).numpy()

    cfm = CFM(mp)
    ours = np.asarray(cfm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(prompt.transpose(0, 2, 1)),
        jnp.array([T]), jnp.asarray(t), jnp.asarray(style), jnp.asarray(cond),
        method=cfm.estimate))
    assert ours.shape == (B, T, C)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4,
                               rtol=1e-2)


@pytest.mark.slow
def test_regulator_conversion_parity():
    import torch

    from conftest import import_reference

    ref_mod = import_reference("modules.length_regulator")

    torch.manual_seed(0)
    tm = ref_mod.InterpolateRegulator(
        channels=32, sampling_ratios=(1, 1), is_discrete=False,
        in_channels=16, vector_quantize=False, f0_condition=False).eval()

    from seedvc_tpu.convert.dit import convert_regulator

    lr_cfg = LengthRegulatorConfig(channels=32, is_discrete=False,
                                   in_channels=16, sampling_ratios=(1, 1))
    mp = ModelParams(length_regulator=lr_cfg)
    params = convert_regulator(tm.state_dict(), mp)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 10, 16)).astype(np.float32)
    with torch.no_grad():
        ref, *_ = tm(torch.from_numpy(x), ylens=torch.LongTensor([20]))

    model = InterpolateRegulator(lr_cfg)
    ours = model.apply({"params": params}, jnp.asarray(x),
                       jnp.array([20]), 20)[0]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5,
                               rtol=1e-3)
