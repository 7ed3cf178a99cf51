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

@pytest.mark.slow
def test_convert_checkpoint_cli_v2(tmp_path):
    """``apps/convert_checkpoint --v2-cfm/--v2-ar`` converts checkpoints with
    the reference's on-disk structure ({'net': {'cfm'|'ar',
    'length_regulator'}}, ``modules/v2/vc_wrapper.py:259-290``) into the
    pkl names VoiceConverterV2 loads (dit/cfm_reg/ar/ar_reg)."""
    import pickle

    import torch

    from conftest import import_reference

    from seedvc_tpu.pipelines.convert_v2 import V2Config

    vcfg = V2Config()
    ref_dit_mod = import_reference("modules.v2.dit_wrapper")
    ref_cfm_mod = import_reference("modules.v2.cfm")
    ref_lr_mod = import_reference("modules.v2.length_regulator")
    ref_ar_mod = import_reference("modules.v2.ar")

    torch.manual_seed(0)
    t_dit = ref_dit_mod.DiT(
        time_as_token=vcfg.dit.time_as_token,
        style_as_token=vcfg.dit.style_as_token, uvit_skip_connection=False,
        block_size=256, depth=vcfg.dit.depth, num_heads=vcfg.dit.num_heads,
        hidden_dim=vcfg.dit.hidden_dim, in_channels=vcfg.dit.in_channels,
        content_dim=vcfg.dit.content_dim,
        style_encoder_dim=vcfg.dit.style_encoder_dim,
        class_dropout_prob=0.1, dropout_rate=0.0, attn_dropout_rate=0.0)
    t_cfm = ref_cfm_mod.CFM(t_dit)
    t_cfm_reg = ref_lr_mod.InterpolateRegulator(
        channels=vcfg.dit.content_dim, sampling_ratios=(1, 1, 1, 1),
        is_discrete=True, codebook_size=vcfg.wide.codebook_size)
    torch.save({"net": {"cfm": t_cfm.state_dict(),
                        "length_regulator": t_cfm_reg.state_dict()}},
               tmp_path / "cfm_small.pth")

    t_ar = ref_ar_mod.NaiveWrapper(ref_ar_mod.NaiveTransformer(
        ref_ar_mod.NaiveModelArgs(
            n_layer=vcfg.ar.n_layer, n_head=vcfg.ar.n_head,
            dim=vcfg.ar.dim, head_dim=vcfg.ar.head_dim,
            n_local_heads=vcfg.ar.n_local_heads,
            intermediate_size=vcfg.ar.intermediate_size,
            vocab_size=vcfg.ar.vocab_size)))
    t_ar_reg = ref_lr_mod.InterpolateRegulator(
        channels=vcfg.ar.dim, sampling_ratios=(),
        is_discrete=True, codebook_size=vcfg.narrow.codebook_size)
    torch.save({"net": {"ar": t_ar.state_dict(),
                        "length_regulator": t_ar_reg.state_dict()}},
               tmp_path / "ar_base.pth")

    from seedvc_tpu.apps.convert_checkpoint import main

    out = tmp_path / "out"
    main(["--out", str(out),
          "--v2-cfm", str(tmp_path / "cfm_small.pth"),
          "--v2-ar", str(tmp_path / "ar_base.pth")])

    for name, key in (("dit", "cond_projection"), ("cfm_reg", "embedding"),
                      ("ar", "layers_0"), ("ar_reg", "out_proj")):
        with open(out / f"{name}.pkl", "rb") as f:
            tree = pickle.load(f)
        assert key in tree, f"{name}.pkl missing {key}"
