"""v2 DiT (AdaLN-Zero) + v2 regulator checkpoint conversion parity.

Builds the actual reference v2 DiT (``modules/v2/dit_wrapper.py`` over
``modules/v2/dit_model.py``) and v2 InterpolateRegulator
(``modules/v2/length_regulator.py``) with random weights, converts them
with ``seedvc_tpu/convert/dit_v2.py``, and checks the JAX forwards match
torch — the gate for using the published v2 checkpoints
(``v2/cfm_small.pth``, SURVEY §2.4/§7.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import LengthRegulatorConfig
from seedvc_tpu.models.dit_v2 import DiTV2, DiTV2Config
from seedvc_tpu.models.regulator import InterpolateRegulator

CFG = DiTV2Config(hidden_dim=32, depth=3, num_heads=4, in_channels=8,
                  content_dim=16, style_encoder_dim=24,
                  use_flash_attention=False)


@pytest.mark.slow
def test_dit_v2_conversion_parity():
    import torch

    from conftest import import_reference

    ref_mod = import_reference("modules.v2.dit_wrapper")

    torch.manual_seed(0)
    tm = ref_mod.DiT(
        time_as_token=True, style_as_token=True, uvit_skip_connection=False,
        block_size=256, depth=CFG.depth, num_heads=CFG.num_heads,
        hidden_dim=CFG.hidden_dim, in_channels=CFG.in_channels,
        content_dim=CFG.content_dim, style_encoder_dim=CFG.style_encoder_dim,
        class_dropout_prob=0.1, dropout_rate=0.0, attn_dropout_rate=0.0,
    ).eval()

    from seedvc_tpu.convert.dit_v2 import convert_dit_v2

    params = convert_dit_v2(tm.state_dict(), CFG)

    B, C, T = 1, CFG.in_channels, 24
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    prompt = rng.standard_normal((B, C, T)).astype(np.float32)
    cond = rng.standard_normal((B, T, CFG.content_dim)).astype(np.float32)
    style = rng.standard_normal((B, CFG.style_encoder_dim)).astype(np.float32)
    t = np.array([0.4], np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(prompt),
                 torch.LongTensor([T]), torch.from_numpy(t),
                 torch.from_numpy(style), torch.from_numpy(cond)).numpy()

    model = DiTV2(CFG)
    ours = np.asarray(model.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(prompt.transpose(0, 2, 1)),
        jnp.array([T]), jnp.asarray(t), jnp.asarray(style),
        jnp.asarray(cond)))
    assert ours.shape == (B, T, C)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4,
                               rtol=1e-2)


@pytest.mark.slow
@pytest.mark.parametrize("ratios,identity_out", [((1, 1), False), ((), True)])
def test_regulator_v2_conversion_parity(ratios, identity_out):
    import torch

    from conftest import import_reference

    ref_mod = import_reference("modules.v2.length_regulator")

    torch.manual_seed(0)
    channels = 16
    # channels == out_channels -> reference appends nn.Identity, exercising
    # the converter's synthesised identity out_proj
    tm = ref_mod.InterpolateRegulator(
        channels=channels, sampling_ratios=ratios, is_discrete=True,
        codebook_size=32).eval()

    from seedvc_tpu.convert.dit_v2 import convert_regulator_v2

    lr = LengthRegulatorConfig(channels=channels, is_discrete=True,
                               content_codebook_size=32,
                               sampling_ratios=ratios)
    params = convert_regulator_v2(tm.state_dict(), lr)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 32, (1, 10))
    ylen = 20 if ratios else 10  # no interpolation when ratios == ()
    with torch.no_grad():
        ref, _ = tm(torch.from_numpy(tokens), ylens=torch.LongTensor([ylen]))

    model = InterpolateRegulator(lr)
    ours = model.apply({"params": params}, jnp.asarray(tokens),
                       jnp.array([ylen]), ylen)[0]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-3)