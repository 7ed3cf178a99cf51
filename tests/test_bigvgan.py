"""BigVGAN parity tests against the reference torch implementation
(imported read-only from /root/reference for golden generation)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.bigvgan import AMPBlock1, BigVGAN, BigVGANConfig
from seedvc_tpu.nn.snake import downsample2x, snake, upsample2x

REF = "/root/reference"


def _import_ref():
    from conftest import import_reference

    ref_bigvgan = import_reference("modules.bigvgan.bigvgan")
    from modules.bigvgan.env import AttrDict

    return ref_bigvgan, AttrDict


def _tiny_h(AttrDict):
    return AttrDict(
        num_mels=8,
        upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4],
        upsample_initial_channel=32,
        resblock="1",
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        activation="snakebeta",
        snake_logscale=True,
        use_cuda_kernel=False,
        use_bias_at_final=True,
        use_tanh_at_final=True,
    )


def test_snake_matches_reference_formula():
    import torch

    x = np.random.default_rng(0).standard_normal((2, 16, 4)).astype(np.float32)
    alpha = np.random.default_rng(1).standard_normal(4).astype(np.float32) * 0.1
    beta = np.random.default_rng(2).standard_normal(4).astype(np.float32) * 0.1

    ours = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
                            logscale=True))
    xt = torch.from_numpy(x)
    a = torch.exp(torch.from_numpy(alpha))
    b = torch.exp(torch.from_numpy(beta))
    ref = xt + (1.0 / (b + 1e-9)) * torch.sin(xt * a) ** 2
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_up_down_sample_match_torch():
    from conftest import import_reference

    resample_mod = import_reference(
        "modules.bigvgan.alias_free_activation.torch.resample")
    DownSample1d, UpSample1d = resample_mod.DownSample1d, resample_mod.UpSample1d
    import torch

    x = np.random.default_rng(3).standard_normal((1, 4, 64)).astype(np.float32)  # B,C,T
    with torch.no_grad():
        up_ref = UpSample1d(2)(torch.from_numpy(x)).numpy()
        down_ref = DownSample1d(2)(torch.from_numpy(x)).numpy()

    x_cl = jnp.asarray(x.transpose(0, 2, 1))  # (B, T, C)
    up = np.asarray(upsample2x(x_cl)).transpose(0, 2, 1)
    down = np.asarray(downsample2x(x_cl)).transpose(0, 2, 1)
    np.testing.assert_allclose(up, up_ref, atol=1e-5)
    np.testing.assert_allclose(down, down_ref, atol=1e-5)


@pytest.mark.slow
def test_bigvgan_full_parity():
    import torch

    ref_bigvgan, AttrDict = _import_ref()
    h = _tiny_h(AttrDict)
    torch.manual_seed(0)
    tm = ref_bigvgan.BigVGAN(h)
    tm.eval()
    # randomize snake params away from init
    with torch.no_grad():
        for name, prm in tm.named_parameters():
            if name.endswith("alpha") or name.endswith("beta"):
                prm.uniform_(-0.3, 0.3)

    from seedvc_tpu.convert.bigvgan import convert_bigvgan

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), use_bias_at_final=True,
        use_tanh_at_final=True)
    params = convert_bigvgan(tm.state_dict(), cfg)

    mel = np.random.default_rng(4).standard_normal((1, 8, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()  # (B, 1, T)

    model = BigVGAN(cfg)
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(mel.transpose(0, 2, 1))))
    assert ours.shape == (1, 20 * 4)
    np.testing.assert_allclose(ours, ref[:, 0, :], atol=5e-5, rtol=1e-4)


def test_bigvgan_bf16_stages_opt_in_runs_close():
    """bf16_stages is an explicit opt-in (measured 24.3 dB SNR at the
    full-size config — rejected for presets; see BigVGANConfig): defaults
    stay f32 and the staged variant still produces a waveform close to
    the f32 one on a tiny config."""
    import dataclasses

    import jax

    from seedvc_tpu.models.bigvgan import BIGVGAN_22K_80, BigVGANConfig

    assert BIGVGAN_22K_80.bf16_stages == 0
    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    voc = BigVGAN(cfg)
    params = jax.jit(voc.init)(jax.random.PRNGKey(0), mel)["params"]
    ref = np.asarray(voc.apply({"params": params}, mel))
    staged = BigVGAN(dataclasses.replace(cfg, bf16_stages=1))
    out = np.asarray(staged.apply({"params": params}, mel))
    assert np.isfinite(out).all() and out.shape == ref.shape
    denom = np.linalg.norm(out) * np.linalg.norm(ref)
    assert float(out.ravel() @ ref.ravel()) / max(denom, 1e-9) > 0.99
