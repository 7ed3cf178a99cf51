"""Trainer with the OpenVoice perturbation path (tiny random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.openvoice import OpenVoiceConfig, ToneColorConverter


@pytest.mark.slow
def test_trainer_openvoice_perturb(tmp_path):
    from tests_helpers_tiny import tiny_cfg
    from seedvc_tpu.apps.audio_io import save_wav
    from seedvc_tpu.models.whisper import WhisperEncoderConfig
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer import Trainer, TrainerConfig

    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        save_wav(str(d / f"a{i}.wav"),
                 (rng.standard_normal(33000) * 0.1).astype(np.float32), 22050)

    ov = ToneColorConverter(OpenVoiceConfig())
    ov_params = jax.jit(
        lambda k: ov.init(
            k, jnp.zeros((1, 40, 513)), jnp.array([40]),
            jnp.zeros((1, 256)), jnp.zeros((1, 256)),
            jnp.zeros((1, 40, 192)), 0.3,
            method=ov.voice_conversion)
    )(jax.random.PRNGKey(0))["params"]
    # ref_enc params are a separate code path; init and merge
    ref_params = jax.jit(
        lambda k: ov.init(k, jnp.zeros((1, 40, 513)), method=ov.extract_se)
    )(jax.random.PRNGKey(1))["params"]
    ov_params = {**ref_params, **ov_params}

    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=48, n_layers=1, n_heads=4, ffn_dim=96)
    tcfg = TrainerConfig(data_path=str(d), run_dir="", batch_size=2, epochs=1,
                         max_steps=1, log_interval=1, mel_bucket=64)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4,
                      openvoice_params=ov_params)
    ds = FTDataset(str(d), 22050, batch_size=2)
    final = trainer.train(ds)
    assert final == 1
    assert np.isfinite(trainer.ema_loss)
