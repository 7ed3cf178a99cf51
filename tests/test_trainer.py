"""Trainer end-to-end on tiny models + synthetic data, incl. checkpoint
save/restore on the virtual CPU mesh."""

import os

import numpy as np
import pytest

from seedvc_tpu.apps.audio_io import save_wav
from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, PreprocessConfig,
    SeedVCConfig, SpectConfig, WavenetConfig)
from seedvc_tpu.models.whisper import WhisperEncoderConfig
from seedvc_tpu.train.dataset import FTDataset
from seedvc_tpu.train.trainer import Trainer, TrainerConfig


def tiny_cfg():
    return SeedVCConfig(
        preprocess_params=PreprocessConfig(
            sr=22050, spect_params=SpectConfig(n_fft=1024, win_length=1024,
                                               hop_length=256, n_mels=80)),
        model_params=ModelParams(
            length_regulator=LengthRegulatorConfig(
                channels=16, is_discrete=False, in_channels=32,
                sampling_ratios=(1,)),
            DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=80,
                          final_layer_type="mlp", content_dim=16,
                          long_skip_connection=False,
                          uvit_skip_connection=False),
            wavenet=WavenetConfig(hidden_dim=32, num_layers=1),
        ),
    )


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i in range(4):
        wave = (rng.standard_normal(22050 + i * 2000) * 0.1).astype(np.float32)
        save_wav(str(d / f"a{i}.wav"), wave, 22050)
    # one bad file (too short) exercising deterministic replacement
    save_wav(str(d / "short.wav"), np.zeros(1000, np.float32), 22050)
    return str(d)


def test_dataset_scan_and_batches(wav_dir):
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    assert len(ds.files) == 5
    batches = list(ds.batches(shuffle=False))
    assert len(batches) == 2
    b = batches[0]
    assert b.waves.shape[0] == 2
    assert (b.wave_lengths > 22050 * 0.9).all()  # short.wav was replaced


@pytest.mark.slow
def test_trainer_steps_and_checkpoint(wav_dir, tmp_path):
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    run_dir = str(tmp_path / "run")
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=run_dir, batch_size=2, epochs=1,
        max_steps=2, log_interval=1, save_interval=100, mel_bucket=64)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    final = trainer.train(ds)
    assert final == 2
    assert trainer.ema_loss is not None and np.isfinite(trainer.ema_loss)
    assert os.path.isdir(run_dir)

    # resume path
    trainer2 = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    assert trainer2.restore_latest()
    assert int(trainer2.state.step) == 2


def test_trainer_validate_and_early_stop(wav_dir, tmp_path):
    """validate() returns a finite loss; persistent plateau triggers early
    stop (reference train.py:1034-1141)."""
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=str(tmp_path / "run"), batch_size=2,
        epochs=50, max_steps=100, log_interval=100, save_interval=1000,
        mel_bucket=64, validation_interval=1, val_batches=1,
        early_stop_patience=2)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)

    val = trainer.validate(ds)
    assert np.isfinite(val)
    # deterministic validate: same params -> same loss.  The first call
    # fills the device feature cache, the second hits it; the perturbed
    # branch then runs through a different XLA program (B-batch alt-only vs
    # 2B fused pair) with ~1e-7 same-math float noise — the precise cache
    # contract is pinned in tests/test_feat_cache.py, and early stopping
    # compares at 1e-4, so equality here is to float noise, not bitwise.
    assert abs(trainer.validate(ds) - val) < 1e-5

    # force permanent plateau so the early-stop path fires quickly
    trainer.best_val_loss = -1e9
    final = trainer.train(ds, val_dataset=ds)
    assert final == 2  # stopped after patience=2 validations
    assert trainer.val_patience == 2


def test_trainer_weight_ema(wav_dir, tmp_path):
    """weight_ema_decay maintains a param EMA in the train state and
    checkpoints it (the reference ships _ema.pth weights; commons.py:423)."""
    import jax

    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=str(tmp_path / "run"), batch_size=2,
        epochs=1, max_steps=2, log_interval=100, save_interval=2,
        mel_bucket=64, weight_ema_decay=0.5)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]).copy()
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    trainer.train(ds)
    leaves_p = jax.tree_util.tree_leaves(trainer.state.params)
    leaves_e = jax.tree_util.tree_leaves(trainer.state.ema_params)
    assert len(leaves_p) == len(leaves_e)
    p2 = np.asarray(leaves_p[0])
    e2 = np.asarray(leaves_e[0])
    # EMA lags the raw params but has moved off the init value
    assert not np.allclose(e2, p2)
    assert not np.allclose(e2, p0)

    # restore round-trips the EMA
    trainer2 = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    assert trainer2.restore_latest()
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state.ema_params)[0]),
        e2)

    # export_serving writes the EMA weights as a VoiceConverter-loadable
    # vc.pkl (reference final ft_model.pth, train.py:1217-1234)
    import pickle

    path = trainer.export_serving()
    assert path.endswith("vc.pkl")
    with open(path, "rb") as f:
        tree = pickle.load(f)
    assert (jax.tree_util.tree_structure(tree)
            == jax.tree_util.tree_structure(trainer.state.params))
    np.testing.assert_array_equal(jax.tree_util.tree_leaves(tree)[0], e2)
    path_raw = trainer.export_serving(use_ema=False)
    with open(path_raw, "rb") as f:
        tree_raw = pickle.load(f)
    np.testing.assert_array_equal(jax.tree_util.tree_leaves(tree_raw)[0], p2)


def test_multi_optimizer_per_module_clipping():
    """make_multi_optimizer clips each module's gradient norm independently
    (reference train.py:889-894 clips per module, not globally)."""
    import jax
    import jax.numpy as jnp
    import optax

    from seedvc_tpu.train.optim import make_multi_optimizer

    params = {"cfm": {"w": jnp.zeros(4)},
              "length_regulator": {"w": jnp.zeros(4)}}
    # cfm gradient is huge (clipped to norm 10), regulator tiny (untouched)
    grads = {"cfm": {"w": jnp.full(4, 1000.0)},
             "length_regulator": {"w": jnp.full(4, 0.001)}}
    opt = make_multi_optimizer(1.0, grad_clip=10.0, weight_decay=0.0)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    # adam normalises magnitudes, so instead verify clipping via the chain
    # directly: run only the clip part by inspecting global norms pre-adam
    clipped_cfm = optax.clip_by_global_norm(10.0).update(
        grads["cfm"], optax.clip_by_global_norm(10.0).init(params["cfm"]))[0]
    assert float(optax.global_norm(clipped_cfm)) <= 10.0 + 1e-4
    # end-to-end: both modules get finite, nonzero updates
    for mod in ("cfm", "length_regulator"):
        u = jax.tree_util.tree_leaves(updates[mod])[0]
        assert jnp.isfinite(u).all() and (jnp.abs(u) > 0).all()


def test_trainer_with_multi_optimizer(wav_dir, tmp_path):
    """Trainer(optimizer_kind='multi') trains with the per-module optimizer."""
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=str(tmp_path / "run"), batch_size=2,
        epochs=1, max_steps=1, log_interval=1, save_interval=100,
        mel_bucket=64, optimizer_kind="multi")
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    final = trainer.train(ds)
    assert final == 1 and np.isfinite(trainer.ema_loss)


def test_lr_scale_reaches_compiled_step():
    """The LR multiplier lives in opt_state, so a JITTED step sees every
    halving (the reference halves at runtime, train.py:1122-1141; a Python
    closure would be baked in at trace time)."""
    import jax
    import jax.numpy as jnp
    import optax

    from seedvc_tpu.train.optim import (get_lr_scale, set_lr_scale,
                                        with_lr_scale)

    opt = with_lr_scale(optax.sgd(1.0))
    params = {"w": jnp.ones(4)}
    opt_state = opt.init(params)
    grads = {"w": jnp.full(4, 2.0)}

    @jax.jit
    def step(opt_state):
        updates, new_state = opt.update(grads, opt_state, params)
        return updates, new_state

    u1, opt_state = step(opt_state)
    assert get_lr_scale(opt_state) == 1.0
    opt_state = set_lr_scale(opt_state, 0.5)
    u2, opt_state = step(opt_state)  # SAME compiled program, new scale
    assert get_lr_scale(opt_state) == 0.5
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(u1["w"]) / 2)


def test_trainer_plateau_halves_lr_in_opt_state(wav_dir, tmp_path):
    """Forced plateau -> lr scale halves, read back from opt_state."""
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir="", batch_size=2, epochs=1,
        max_steps=3, log_interval=1, save_interval=1000, mel_bucket=64,
        lr_halve_patience=1)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    assert trainer.lr_scale == 1.0
    trainer.best_ema = -1e9  # every EMA reading counts as a plateau
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    trainer.train(ds)
    # 3 steps, log_interval 1, patience 1 -> halved at least twice, and the
    # value is read from the (donated, device-side) opt_state itself
    assert trainer.lr_scale <= 0.25


def test_vector_quantize_preset_trains(wav_dir):
    """A vector_quantize=True preset must train (crashed in round 1: 5-tuple
    vs 2-tuple unpack) and the 0.05/0.15 commitment/codebook losses must be
    consumed: the codebook gets a NONZERO gradient only through the 0.15
    codebook-loss term (straight-through bypasses it otherwise)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg()
    lr_cfg = dataclasses.replace(cfg.model_params.length_regulator,
                                 vector_quantize=True,
                                 content_codebook_size=32)
    cfg = dataclasses.replace(
        cfg, model_params=dataclasses.replace(cfg.model_params,
                                              length_regulator=lr_cfg))
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(data_path=wav_dir, run_dir="", batch_size=2,
                         epochs=1, max_steps=1, log_interval=10,
                         save_interval=1000, mel_bucket=64)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    rng = np.random.default_rng(0)
    batch = next(iter(ds.batches(shuffle=False, epoch=0)))
    feats = trainer.prepare_batch(batch, rng)

    from seedvc_tpu.models.vc import VCModel

    model = VCModel(cfg.model_params)

    def loss_fn(params):
        loss, _ = model.apply(
            {"params": params}, feats["s_alt"], feats["s_ori"], feats["mels"],
            feats["mel_lens"], feats["style"],
            rngs_dict={k: jax.random.PRNGKey(i) for i, k in
                       enumerate(("prompt", "t", "noise", "drop"))},
            deterministic=True)
        return loss

    grads = jax.grad(loss_fn)(trainer.state.params)
    cb_grad = grads["length_regulator"]["vq"]["codebook"]
    assert float(jnp.abs(cb_grad).sum()) > 0

    # and a full train step runs end-to-end
    final = trainer.train(ds)
    assert final == 1 and np.isfinite(trainer.ema_loss)


def test_trainer_save_dedupe_at_max_steps(wav_dir, tmp_path):
    """save_interval hitting exactly at max_steps must not raise Orbax
    StepAlreadyExists (the default train_v2 CLI config tripped this)."""
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=str(tmp_path / "run"), batch_size=2,
        epochs=1, max_steps=2, log_interval=10, save_interval=2,
        mel_bucket=64)
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    final = trainer.train(ds)  # step 2: save_interval save + max_steps save
    assert final == 2
    assert trainer._ckpt_mgr.latest_step() == 2


def test_trainer_ema_restore_from_non_ema_ckpt(wav_dir, tmp_path):
    """Resuming an EMA-enabled run from a checkpoint written WITHOUT EMA
    re-seeds ema_params from the restored params instead of failing or
    silently disabling EMA."""
    import jax

    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    run = str(tmp_path / "run")
    tcfg0 = TrainerConfig(data_path=wav_dir, run_dir=run, batch_size=2,
                          epochs=1, max_steps=1, log_interval=10,
                          save_interval=100, mel_bucket=64,
                          weight_ema_decay=0.0)
    t0 = Trainer(cfg, tcfg0, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    t0.train(ds)

    tcfg1 = TrainerConfig(data_path=wav_dir, run_dir=run, batch_size=2,
                          epochs=1, max_steps=2, log_interval=10,
                          save_interval=100, mel_bucket=64,
                          weight_ema_decay=0.5)
    t1 = Trainer(cfg, tcfg1, whisper_cfg=wcfg, n_model=4)
    assert t1.restore_latest()
    assert t1.state.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t1.state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0]))
    # and it keeps training with EMA active
    t1.train(ds)
    assert t1.state.ema_params is not None


def test_trainer_bf16_compute(wav_dir, tmp_path):
    """compute_dtype='bfloat16': bf16 model compute with f32 master weights
    (the TPU analogue of the reference's fp16 autocast, train_v2.py:700) —
    the step runs, loss is finite, and params/opt-state stay f32."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(
        data_path=wav_dir, run_dir=str(tmp_path / "run"), batch_size=2,
        epochs=1, max_steps=2, log_interval=1, save_interval=100,
        mel_bucket=64, compute_dtype="bfloat16")
    trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
    ds = FTDataset(wav_dir, 22050, batch_size=2)
    final = trainer.train(ds)
    assert final == 2
    assert trainer.ema_loss is not None and np.isfinite(trainer.ema_loss)
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype == jnp.float32


@pytest.mark.slow
def test_trainer_prefetch_matches_synchronous(wav_dir, tmp_path):
    """Prefetched feature prep (worker thread, train/prefetch.py) reproduces
    the synchronous schedule exactly: same rng consumption order, same
    deterministic step picks -> identical loss trajectory."""
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    emas = []
    for depth in (0, 2):
        tcfg = TrainerConfig(
            data_path=wav_dir, run_dir=str(tmp_path / f"run{depth}"),
            batch_size=2, epochs=2, max_steps=4, log_interval=100,
            save_interval=1000, mel_bucket=64, prefetch=depth)
        trainer = Trainer(cfg, tcfg, whisper_cfg=wcfg, n_model=4)
        ds = FTDataset(wav_dir, 22050, batch_size=2)
        assert trainer.train(ds) == 4
        emas.append(trainer.ema_loss)
    assert emas[0] == emas[1]
