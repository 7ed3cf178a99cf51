"""Tests for the generative core: layers, DiT estimator, CFM loss/sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import (
    DiTConfig,
    LengthRegulatorConfig,
    ModelParams,
    WavenetConfig,
)
from seedvc_tpu.models.cfm import CFM, euler_solve
from seedvc_tpu.models.dit import DiT
from seedvc_tpu.models.regulator import InterpolateRegulator, f0_to_coarse
from seedvc_tpu.nn.layers import RMSNorm, apply_rope, rope_cache


def tiny_params(final_layer="mlp", **dit_kw) -> ModelParams:
    kw = dict(
        hidden_dim=64, num_heads=4, depth=4, in_channels=8,
        final_layer_type=final_layer, content_dim=16,
        long_skip_connection=True, uvit_skip_connection=True,
        class_dropout_prob=0.1,
    )
    kw.update(dit_kw)
    dit = DiTConfig(**kw)
    return ModelParams(
        DiT=dit,
        wavenet=WavenetConfig(hidden_dim=64, num_layers=2, kernel_size=5,
                              dilation_rate=1, p_dropout=0.0),
    )


def test_rmsnorm_matches_torch():
    import torch

    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    m = RMSNorm(16)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(variables, jnp.asarray(x))
    xt = torch.from_numpy(x)
    ref = xt * torch.rsqrt((xt * xt).mean(-1, keepdim=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_rope_matches_torch_reference():
    """Parity with the gpt-fast interleaved-pair rotary embedding
    (reference ``diffusion_transformer.py:288-312``)."""
    import torch

    T, H, D = 6, 2, 8
    x = np.random.default_rng(1).standard_normal((1, T, H, D)).astype(np.float32)

    freqs = 1.0 / (10000.0 ** (torch.arange(0, D, 2)[: D // 2].float() / D))
    ang = torch.outer(torch.arange(T), freqs)
    fc = torch.stack([torch.cos(ang), torch.sin(ang)], dim=-1)
    xt = torch.from_numpy(x).reshape(1, T, H, D // 2, 2)
    fcr = fc.view(1, T, 1, D // 2, 2)
    ref = torch.stack(
        [xt[..., 0] * fcr[..., 0] - xt[..., 1] * fcr[..., 1],
         xt[..., 1] * fcr[..., 0] + xt[..., 0] * fcr[..., 1]], -1
    ).flatten(3).numpy()

    ours = apply_rope(jnp.asarray(x), jnp.asarray(rope_cache(T, D)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("final_layer", ["mlp", "wavenet"])
def test_dit_forward_shapes(final_layer):
    mp = tiny_params(final_layer)
    B, T = 2, 16
    model = DiT(mp)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, 8))
    cond = jnp.zeros((B, T, 16))
    style = jnp.zeros((B, 192))
    lens = jnp.array([16, 12])
    variables = model.init(rng, x, x, lens, jnp.zeros((B,)), style, cond)
    out = model.apply(variables, x, x, lens, jnp.full((B,), 0.5), style, cond)
    assert out.shape == (B, T, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_tokens_variant():
    """style_as_token + time_as_token path (xlsr-tiny layout)."""
    mp = tiny_params("mlp", time_as_token=True, style_as_token=True,
                     long_skip_connection=False)
    B, T = 2, 12
    model = DiT(mp)
    x = jnp.zeros((B, T, 8))
    cond = jnp.zeros((B, T, 16))
    style = jnp.ones((B, 192))
    lens = jnp.array([12, 8])
    variables = model.init(jax.random.PRNGKey(0), x, x, lens, jnp.zeros((B,)),
                           style, cond)
    out = model.apply(variables, x, x, lens, jnp.full((B,), 0.3), style, cond)
    assert out.shape == (B, T, 8)


def test_dit_padding_invariance():
    """Outputs on valid frames must not depend on padding frames."""
    mp = tiny_params("mlp")
    model = DiT(mp)
    B, T, L = 1, 16, 10
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, 8)).astype(np.float32)
    cond = rng.standard_normal((B, T, 16)).astype(np.float32)
    style = rng.standard_normal((B, 192)).astype(np.float32)
    lens = jnp.array([L])
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                           lens, jnp.zeros((B,)), jnp.asarray(style),
                           jnp.asarray(cond))

    out1 = model.apply(variables, jnp.asarray(x), jnp.asarray(x), lens,
                       jnp.full((B,), 0.5), jnp.asarray(style), jnp.asarray(cond))
    x2, cond2 = x.copy(), cond.copy()
    x2[:, L:] = 99.0
    cond2[:, L:] = -99.0
    out2 = model.apply(variables, jnp.asarray(x2), jnp.asarray(x2), lens,
                       jnp.full((B,), 0.5), jnp.asarray(style), jnp.asarray(cond2))
    np.testing.assert_allclose(
        np.asarray(out1)[:, :L], np.asarray(out2)[:, :L], atol=2e-5)


def test_dit_static_cond_cache_matches_direct():
    """estimate with a precomputed static_cond must equal the direct call
    (the Euler sampler hoists this out of its scan)."""
    for kw in ({}, dict(time_as_token=True, style_as_token=True,
                        long_skip_connection=False)):
        mp = tiny_params("wavenet" if not kw else "mlp", **kw)
        model = DiT(mp)
        B, T = 2, 16
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
        style = jnp.asarray(rng.standard_normal((B, 192)), jnp.float32)
        lens = jnp.array([16, 12])
        t = jnp.full((B,), 0.4)
        variables = model.init(jax.random.PRNGKey(0), x, x, lens,
                               jnp.zeros((B,)), style, cond)
        direct = model.apply(variables, x, x, lens, t, style, cond)
        static = model.apply(variables, x, x, lens, t, style, cond,
                             return_static=True)
        cached = model.apply(variables, x, x, lens, t, style, cond,
                             static_cond=static)
        np.testing.assert_allclose(np.asarray(direct), np.asarray(cached),
                                   atol=1e-6)


def test_dit_lens_none_matches_full_lens():
    """x_lens=None (static unmasked path) must equal x_lens == T."""
    mp = tiny_params("wavenet")
    model = DiT(mp)
    B, T = 2, 16
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((B, 192)), jnp.float32)
    t = jnp.full((B,), 0.6)
    variables = model.init(jax.random.PRNGKey(0), x, x, jnp.full((B,), T),
                           jnp.zeros((B,)), style, cond)
    full = model.apply(variables, x, x, jnp.full((B,), T), t, style, cond)
    none = model.apply(variables, x, x, None, t, style, cond)
    np.testing.assert_allclose(np.asarray(full), np.asarray(none), atol=1e-6)


def test_euler_solve_precompute_matches_plain():
    """euler_solve with precompute_fn must reproduce the plain solver."""
    mp = tiny_params("mlp")
    B, T = 1, 16
    cfm = CFM(mp)
    rng = np.random.default_rng(9)
    mu = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((B, 192)), jnp.float32)
    prompt = jnp.zeros((B, T, 8))
    variables = cfm.init(jax.random.PRNGKey(0), prompt, prompt,
                         jnp.full((B,), T), jnp.zeros((B,)), style, mu,
                         method=cfm.estimate)

    def estimate_fn(x, p, l, t, s, m, sc=None):
        return cfm.apply(variables, x, p, l, t, s, m, static_cond=sc,
                         method=cfm.estimate)

    def precompute_fn(x, p, l, s, m):
        return cfm.apply(variables, x, p, l, s, m,
                         method=cfm.precompute_cond)

    key = jax.random.PRNGKey(5)
    plain = euler_solve(estimate_fn, key, mu, None, prompt, 4, style,
                        n_mels=8, n_timesteps=3, cfg_rate=0.7)
    hoisted = euler_solve(estimate_fn, key, mu, None, prompt, 4, style,
                          n_mels=8, n_timesteps=3, cfg_rate=0.7,
                          precompute_fn=precompute_fn)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(hoisted),
                               atol=1e-6)


def test_cfm_loss_and_sampler():
    mp = tiny_params("mlp")
    B, T = 2, 16
    cfm = CFM(mp)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8))
    mu = jax.random.normal(jax.random.PRNGKey(2), (B, T, 16))
    style = jax.random.normal(jax.random.PRNGKey(3), (B, 192))
    x_lens = jnp.array([16, 12])
    prompt_lens = jnp.array([4, 6])

    variables = cfm.init(rng, x1, x_lens, prompt_lens, mu, style,
                         rng_t=jax.random.PRNGKey(4),
                         rng_noise=jax.random.PRNGKey(5))
    loss, out = cfm.apply(variables, x1, x_lens, prompt_lens, mu, style,
                          rng_t=jax.random.PRNGKey(6),
                          rng_noise=jax.random.PRNGKey(7))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert out.shape == x1.shape

    def estimate_fn(x, p, lens, t, s, m):
        return cfm.apply(variables, x, p, lens, t, s, m, method=cfm.estimate)

    prompt = jnp.where(jnp.arange(T)[None, :, None] < 4, x1, 0.0)
    mel = euler_solve(estimate_fn, jax.random.PRNGKey(8), mu, x_lens, prompt,
                      4, style, n_mels=8, n_timesteps=3, cfg_rate=0.7)
    assert mel.shape == (B, T, 8)
    # prompt region zeroed, generated region nonzero
    assert np.abs(np.asarray(mel)[:, :4]).max() == 0.0
    assert np.abs(np.asarray(mel)[:, 4:12]).max() > 0.0


def test_f0_to_coarse_matches_torch():
    import torch

    f0 = np.array([[0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0]], np.float32)
    ours = np.asarray(f0_to_coarse(jnp.asarray(f0), 256))

    f0t = torch.from_numpy(f0)
    f0_mel_min = 1127 * np.log(1 + 50.0 / 700)
    f0_mel_max = 1127 * np.log(1 + 1100.0 / 700)
    f0_mel = 1127 * (1 + f0t / 700).log()
    a = (256 - 2) / (f0_mel_max - f0_mel_min)
    b = f0_mel_min * a - 1.0
    f0_mel = torch.where(f0_mel > 0, f0_mel * a - b, f0_mel)
    fc = torch.round(f0_mel).long()
    fc = fc * (fc > 0)
    fc = fc + ((fc < 1) * 1)
    fc = fc * (fc < 256)
    fc = fc + ((fc >= 256) * 255)
    np.testing.assert_array_equal(ours, fc.numpy())


def test_regulator_shapes_and_interp():
    cfg = LengthRegulatorConfig(channels=32, is_discrete=False, in_channels=16,
                                sampling_ratios=(1, 1), f0_condition=True,
                                n_f0_bins=64)
    reg = InterpolateRegulator(cfg)
    B, T_in, T_out = 2, 10, 20
    x = jnp.ones((B, T_in, 16))
    ylens = jnp.array([20, 15])
    f0 = jnp.full((B, T_in), 220.0)
    variables = reg.init(jax.random.PRNGKey(0), x, ylens, T_out, f0)
    out, olens, codes, commit, cb = reg.apply(variables, x, ylens, T_out, f0)
    assert out.shape == (B, T_out, 32)
    assert codes is None and commit is None and cb is None
    # masked beyond ylens
    assert np.abs(np.asarray(out)[1, 15:]).max() == 0.0
    # f0=None path uses the learned mask token
    out2 = reg.apply(variables, x, ylens, T_out, None)[0]
    assert out2.shape == (B, T_out, 32)


def test_regulator_quantizer_dropout_gates_codebooks():
    """Multi-codebook gating (reference length_regulator.py:92-100): with
    n_quantizers=1, extra codebooks contribute nothing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvc_tpu.core.config import LengthRegulatorConfig
    from seedvc_tpu.models.regulator import (InterpolateRegulator,
                                             random_n_quantizers)

    cfg = LengthRegulatorConfig(channels=16, is_discrete=True,
                                content_codebook_size=8, n_codebooks=3,
                                sampling_ratios=(1,), quantizer_dropout=0.5)
    reg = InterpolateRegulator(cfg)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 8, (2, 3, 12)))
    ylens = jnp.array([10, 8])
    params = reg.init(jax.random.PRNGKey(0), x, ylens, 12)["params"]

    out_full = reg.apply({"params": params}, x, ylens, 12)[0]
    out_one = reg.apply({"params": params}, x, ylens, 12,
                        n_quantizers=jnp.array([1, 1]))[0]
    out_one2 = reg.apply(
        {"params": params},
        x.at[:, 1:].set(jnp.zeros_like(x[:, 1:])), ylens, 12,
        n_quantizers=jnp.array([1, 1]))[0]
    assert not np.allclose(np.asarray(out_full), np.asarray(out_one))
    # with one active codebook the extra token values are irrelevant
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_one2),
                               atol=1e-6)

    nq = random_n_quantizers(jax.random.PRNGKey(1), 8, 3, 0.5)
    assert np.asarray(nq[4:]).tolist() == [3, 3, 3, 3]
    assert ((np.asarray(nq[:4]) >= 1) & (np.asarray(nq[:4]) <= 3)).all()


def test_regulator_vector_quantize_bottleneck():
    """VQ bottleneck (reference length_regulator.py:88,136-139): 5-tuple
    with codes and commitment/codebook losses; straight-through gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvc_tpu.core.config import LengthRegulatorConfig
    from seedvc_tpu.models.regulator import InterpolateRegulator

    cfg = LengthRegulatorConfig(channels=16, is_discrete=False, in_channels=8,
                                content_codebook_size=32,
                                sampling_ratios=(1,), vector_quantize=True)
    reg = InterpolateRegulator(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 8)),
                    jnp.float32)
    ylens = jnp.array([12, 10])
    params = reg.init(jax.random.PRNGKey(0), x, ylens, 12)["params"]
    out, olens, codes, commit, cb = reg.apply({"params": params}, x, ylens, 12)
    assert out.shape == (2, 12, 16)
    assert codes.shape == (2, 12)
    assert float(commit) >= 0 and float(cb) >= 0

    def loss(p):
        o, *_ = reg.apply({"params": p}, x, ylens, 12)
        return jnp.sum(o ** 2)

    grads = jax.grad(loss)(params)
    g = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in g)


def test_load_reference_yaml_presets():
    """All 5 shipped reference YAML presets load into typed configs with the
    right preprocessing/model fields (reference configs/presets/*.yml via
    modules/commons.py:482-488 munch loading)."""
    import glob

    from seedvc_tpu.core.config import get_preset, load_preset

    paths = sorted(glob.glob("/root/reference/configs/presets/*.yml"))
    assert len(paths) == 5
    for path in paths:
        cfg = load_preset(path)
        assert cfg.preprocess_params.sr in (22050, 44100)
        assert cfg.model_params.DiT.hidden_dim in (384, 512, 768)
        assert cfg.model_params.DiT.depth in (9, 13, 17)

    # the small-wavenet YAML must agree with the built-in preset
    yml = load_preset("/root/reference/configs/presets/"
                      "config_dit_mel_seed_uvit_whisper_small_wavenet.yml")
    built = get_preset("whisper_small_wavenet")
    assert yml.model_params.DiT.hidden_dim == built.model_params.DiT.hidden_dim
    assert yml.model_params.DiT.depth == built.model_params.DiT.depth
    assert (yml.preprocess_params.spect_params.hop_length
            == built.preprocess_params.spect_params.hop_length)
