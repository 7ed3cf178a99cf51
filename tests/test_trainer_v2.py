"""v2 trainer: AR CE + CFM losses, one sharded step on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.ar import ARConfig, ARTransformer
from seedvc_tpu.models.ar_train import ar_loss
from seedvc_tpu.models.astral import AstralConfig
from seedvc_tpu.models.dit_v2 import DiTV2Config
from seedvc_tpu.models.ssl import SSLConfig
from seedvc_tpu.pipelines.convert_v2 import V2Config
from seedvc_tpu.train.dataset import Batch
from seedvc_tpu.train.trainer_v2 import TrainerV2, TrainerV2Config


def test_ar_loss_matches_manual():
    """CE over the packed sequence: verify labels/ignore structure by
    comparing against an explicit per-sample computation."""
    cfg = ARConfig(dim=32, n_layer=1, n_head=4, n_local_heads=2, head_dim=8,
                   intermediate_size=64, vocab_size=17, max_seq_len=64)
    model = ARTransformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                           jnp.arange(4)[None],
                           jnp.tril(jnp.ones((4, 4), bool))[None, None],
                           method=model.init_all)

    B, C_max, X_max = 2, 6, 5
    rng = np.random.default_rng(0)
    cond_emb = jnp.asarray(rng.standard_normal((B, C_max, 32)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 16, (B, X_max)))
    cond_lens = jnp.array([6, 3])
    target_lens = jnp.array([5, 2])

    loss = ar_loss(model, variables, cond_emb, cond_lens, targets, target_lens)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # CE over a 17-vocab should be near log(17) at random init
    assert abs(float(loss) - np.log(17)) < 1.5


def tiny_v2cfg():
    return V2Config(
        dit=DiTV2Config(hidden_dim=32, depth=2, num_heads=4, in_channels=80,
                        content_dim=32, style_encoder_dim=24),
        ar=ARConfig(dim=32, n_layer=2, n_head=4, n_local_heads=2, head_dim=8,
                    intermediate_size=64, vocab_size=33, max_seq_len=1024),
        ssl=SSLConfig(conv_dim=16, d_model=32, n_layers=1, n_heads=4, ffn_dim=64),
        narrow=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                            input_dim=32, codebook_size=8),
        wide=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                          input_dim=32, codebook_size=32),
    )


@pytest.mark.slow
def test_trainer_v2_step():
    trainer = TrainerV2(tiny_v2cfg(),
                        TrainerV2Config(batch_size=2, mel_bucket=64,
                                        token_bucket=32),
                        n_model=4)
    rng = np.random.default_rng(0)
    B, T = 2, 33000
    waves = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    w16 = waves[:, :24000]
    batch = Batch(waves, w16, np.array([T, T - 4000], np.int32),
                  np.array([24000, 21000], np.int32))
    m1 = trainer.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(m1["loss"])
    assert "loss_ar" in m1 and "loss_cfm" in m1
    m2 = trainer.train_step(batch, jax.random.PRNGKey(2))
    assert int(trainer.state.step) == 2
    assert np.isfinite(m2["loss"])


@pytest.mark.slow
def test_trainer_v2_checkpoint_roundtrip(tmp_path):
    """save() + restore_latest() via Orbax (reference train_v2.py:845-900
    resume semantics: params/opt-state/step restored exactly)."""
    tcfg = TrainerV2Config(batch_size=2, mel_bucket=64, token_bucket=32,
                           run_dir=str(tmp_path / "run"), max_steps=3)
    trainer = TrainerV2(tiny_v2cfg(), tcfg, n_model=4)
    rng = np.random.default_rng(0)
    B, T = 2, 33000
    waves = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    batch = Batch(waves, waves[:, :24000], np.array([T, T - 4000], np.int32),
                  np.array([24000, 21000], np.int32))
    trainer.train_step(batch, jax.random.PRNGKey(1))
    trainer.save(1)
    leaf_before = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0]).copy()

    trainer2 = TrainerV2(tiny_v2cfg(), tcfg, n_model=4)
    assert trainer2.restore_latest()
    assert int(trainer2.state.step) == 1
    leaf_after = np.asarray(
        jax.tree_util.tree_leaves(trainer2.state.params)[0])
    np.testing.assert_array_equal(leaf_before, leaf_after)
    # training resumes from restored state
    m = trainer2.train_step(batch, jax.random.PRNGKey(2))
    assert np.isfinite(m["loss"]) and int(trainer2.state.step) == 2


def _mk_batch(B=2, T=33000, seed=0):
    rng = np.random.default_rng(seed)
    waves = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    return Batch(waves, waves[:, :24000], np.array([T, T - 4000], np.int32),
                 np.array([24000, 21000], np.int32))


@pytest.mark.slow
def test_trainer_v2_true_freezing():
    """train_ar=False must leave AR params BIT-IDENTICAL (no update, no
    weight decay) — the reference sets requires_grad=False
    (train_v2.py:260-271); plain AdamW would still decay them."""
    trainer = TrainerV2(tiny_v2cfg(),
                        TrainerV2Config(batch_size=2, mel_bucket=64,
                                        token_bucket=32, train_ar=False),
                        n_model=4)
    ar0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                 trainer.state.params["ar"])
    arreg0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    trainer.state.params["ar_reg"])
    dit0 = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params["dit"])[0]).copy()
    batch = _mk_batch()
    for i in range(2):
        m = trainer.train_step(batch, jax.random.PRNGKey(i))
        assert "loss_ar" not in m and "loss_cfm" in m
    for before, after in zip(
            jax.tree_util.tree_leaves(ar0) + jax.tree_util.tree_leaves(arreg0),
            jax.tree_util.tree_leaves(trainer.state.params["ar"])
            + jax.tree_util.tree_leaves(trainer.state.params["ar_reg"])):
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # trained module moved
    dit1 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params["dit"])[0])
    assert not np.array_equal(dit0, dit1)


@pytest.mark.slow
def test_trainer_v2_validate_and_early_stop(tmp_path):
    """validate() + patience early stop (reference train_v2.py:551-586,
    :643-654)."""
    import os

    from seedvc_tpu.apps.audio_io import save_wav
    from seedvc_tpu.train.dataset import FTDataset

    d = tmp_path / "wavs"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(4):
        save_wav(str(d / f"a{i}.wav"),
                 (rng.standard_normal(33000 + 1000 * i) * 0.1).astype(np.float32),
                 22050)
    ds = FTDataset(str(d), 22050, batch_size=2)

    tcfg = TrainerV2Config(batch_size=2, mel_bucket=64, token_bucket=32,
                           max_steps=100, epochs=50, log_interval=100,
                           save_interval=1000, validation_interval=1,
                           val_batches=1, early_stop_patience=2)
    trainer = TrainerV2(tiny_v2cfg(), tcfg, n_model=4)
    val = trainer.validate(ds)
    assert np.isfinite(val)
    assert trainer.validate(ds) == val  # deterministic

    trainer.best_val_loss = -1e9  # force permanent plateau
    final = trainer.train(ds, val_dataset=ds)
    assert final == 2
    assert trainer.patience_counter == 2


@pytest.mark.slow
def test_trainer_v2_distillation():
    """Loss-level KD (train_v2.py:717-742): 0.5*(cfm-t_cfm)^2 +
    0.3*(ar-t_ar)^2 added to the loss when distill flags are on."""
    base = TrainerV2(tiny_v2cfg(),
                     TrainerV2Config(batch_size=2, mel_bucket=64,
                                     token_bucket=32),
                     n_model=4)
    teacher = jax.tree_util.tree_map(lambda x: x, base.state.params)

    trainer = TrainerV2(tiny_v2cfg(),
                        TrainerV2Config(batch_size=2, mel_bucket=64,
                                        token_bucket=32, distill_ar=True,
                                        distill_cfm=True, seed=999),
                        n_model=4, teacher_params=teacher)
    batch = _mk_batch()
    m = trainer.train_step(batch, jax.random.PRNGKey(1))
    assert "loss_distill" in m and np.isfinite(m["loss_distill"])
    assert m["loss_distill"] >= 0
    np.testing.assert_allclose(
        m["loss"], m["loss_cfm"] + m["loss_ar"] + m["loss_distill"],
        rtol=1e-5)

    # teacher == student params + same rng -> zero distill loss
    t2 = TrainerV2(tiny_v2cfg(),
                   TrainerV2Config(batch_size=2, mel_bucket=64,
                                   token_bucket=32, distill_ar=True,
                                   distill_cfm=True),
                   n_model=4)
    t2.teacher_params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t2.state.params)
    m2 = t2.train_step(batch, jax.random.PRNGKey(1))
    assert m2["loss_distill"] < 1e-9


def test_trainer_v2_save_dedupe(tmp_path):
    trainer = TrainerV2(tiny_v2cfg(),
                        TrainerV2Config(batch_size=2, mel_bucket=64,
                                        token_bucket=32,
                                        run_dir=str(tmp_path / "run")),
                        n_model=4)
    trainer.save(1)
    trainer.save(1)  # must be a silent no-op, not StepAlreadyExists
    assert trainer._ckpt_mgr.latest_step() == 1


@pytest.mark.slow
def test_v2_data_sharded_prep_matches_replicated():
    """TrainerV2._put ships prep inputs sharded over `data`: the frozen
    SSL/quantizer/mel/style programs run SPMD on a multi-device mesh.
    Sharded prep must equal the replicated fallback exactly."""
    trainer = TrainerV2(tiny_v2cfg(),
                        TrainerV2Config(batch_size=2, mel_bucket=64,
                                        token_bucket=32),
                        n_model=4)
    rng = np.random.default_rng(3)
    B, T = 2, 33000
    waves = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    batch = Batch(waves, waves[:, :24000], np.array([T, T - 4000], np.int32),
                  np.array([24000, 21000], np.int32))

    feats, dims = trainer.prepare_batch(batch)
    assert "data" in tuple(feats["style"].sharding.spec)

    trainer._put = lambda x: jnp.asarray(x)  # replicated fallback
    feats_rep, dims_rep = trainer.prepare_batch(batch)
    assert dims == dims_rep
    for key in ("style", "mels", "wide_idx", "ar_cond_idx", "token_lens"):
        np.testing.assert_allclose(np.asarray(feats[key]),
                                   np.asarray(feats_rep[key]),
                                   rtol=0, atol=1e-6, err_msg=key)
