"""Device feature-cache correctness (VERDICT r4 weak #6 / next #5).

``Trainer._feat_cache`` changes the compute path on cache hits (restacked
cached rows + alt-only whisper program vs the fused pair program,
``train/trainer.py::prepare_batch``) and claims bit-identity with the
uncached path.  These tests PIN that claim: a cache-warm prepare_batch must
produce bit-identical features (and therefore bit-identical losses under the
same per-step RNG) to ``feat_cache_bytes=0``, in both the default
(warp-perturbation) branch and the OpenVoice branch, and a partial cache
(budget eviction mid-fill, ``trainer.py:489-497``) must fall back to the
full recompute path without corruption."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.train.trainer import Trainer, TrainerConfig

from test_trainer_features import WCFG, make_batch, tiny_cfg


def _with_ids(batch, ids):
    return dataclasses.replace(batch, ids=np.asarray(ids, np.int64))


def _prep_pair(trainer, batch, *, cache_bytes, seeds=(0, 1)):
    """prepare_batch twice (fill epoch, then measured epoch) under the given
    cache budget; returns the second epoch's features."""
    trainer._feat_cache.clear()
    trainer._feat_cache_used = 0
    trainer.tcfg = dataclasses.replace(trainer.tcfg,
                                       feat_cache_bytes=cache_bytes)
    trainer.prepare_batch(batch, np.random.default_rng(seeds[0]), step=0)
    return trainer.prepare_batch(batch, np.random.default_rng(seeds[1]),
                                 step=1)


def _assert_feats_equal(a, b):
    # Cached ROWS (s_ori, style) must be BIT-identical: a cache hit restacks
    # the very arrays the fill step computed.  s_alt recomputes through a
    # different XLA program (B-batch alt-only vs 2B-batch fused pair), so
    # same-math float noise (~5e-7 measured) is expected there.
    for k in ("s_ori", "style", "mels"):
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]),
            err_msg=f"cached-path feature {k!r} diverged from uncached path")
    np.testing.assert_allclose(
        np.asarray(a["s_alt"]), np.asarray(b["s_alt"]), atol=1e-5, rtol=0,
        err_msg="cached-path s_alt diverged from uncached path")


@pytest.fixture(scope="module")
def trainer():
    tcfg = TrainerConfig(run_dir="", batch_size=2, mel_bucket=64)
    return Trainer(tiny_cfg(), tcfg, whisper_cfg=WCFG, n_model=4)


def test_cache_hit_bit_identical_default_branch(trainer):
    """Cache-warm epoch == feat_cache_bytes=0 epoch, bitwise, and the
    cached path really engaged (all rows cached)."""
    batch = _with_ids(make_batch(), [0, 1])
    warm = _prep_pair(trainer, batch, cache_bytes=2 << 30)
    assert len(trainer._feat_cache) == 2  # hit path was exercised
    cold = _prep_pair(trainer, batch, cache_bytes=0)
    assert len(trainer._feat_cache) == 0
    _assert_feats_equal(warm, cold)
    # same features + same step RNG -> losses equal to float noise
    l_warm = trainer.eval_fn(trainer.state.params, warm,
                             jax.random.PRNGKey(7))
    l_cold = trainer.eval_fn(trainer.state.params, cold,
                             jax.random.PRNGKey(7))
    assert abs(float(l_warm) - float(l_cold)) < 1e-5


def test_partial_cache_falls_back_and_stays_correct(trainer):
    """A budget that fits only ONE row stops the fill (eviction mid-fill)
    and the next epoch takes the full recompute path: outputs must still
    equal the cache-disabled run and the cache must not grow past budget."""
    batch = _with_ids(make_batch(), [0, 1])
    row_bytes = None
    # budget sized from one real row: fill caches row 0, rejects row 1
    probe = _prep_pair(trainer, batch, cache_bytes=2 << 30)
    del probe
    row_bytes = trainer._feat_cache_used // 2
    partial = _prep_pair(trainer, batch, cache_bytes=row_bytes + 8)
    assert len(trainer._feat_cache) == 1
    assert trainer._feat_cache_used <= row_bytes + 8
    cold = _prep_pair(trainer, batch, cache_bytes=0)
    _assert_feats_equal(partial, cold)


@pytest.mark.slow
def test_cache_hit_bit_identical_openvoice_branch():
    """Same pin for the OpenVoice perturbation branch: cached s_ori/style
    rows are restacked while s_alt reruns the OV conversion + whisper —
    the rng draw order must line up so both paths consume identical
    augmentation streams."""
    from seedvc_tpu.models.openvoice import OpenVoiceConfig, ToneColorConverter

    ov = ToneColorConverter(OpenVoiceConfig())
    ov_params = jax.jit(
        lambda k: ov.init(
            k, jnp.zeros((1, 40, 513)), jnp.array([40]),
            jnp.zeros((1, 256)), jnp.zeros((1, 256)),
            jnp.zeros((1, 40, 192)), 0.3,
            method=ov.voice_conversion)
    )(jax.random.PRNGKey(0))["params"]
    ref_params = jax.jit(
        lambda k: ov.init(k, jnp.zeros((1, 40, 513)), method=ov.extract_se)
    )(jax.random.PRNGKey(1))["params"]
    ov_params = {**ref_params, **ov_params}

    tcfg = TrainerConfig(run_dir="", batch_size=2, mel_bucket=64)
    tr = Trainer(tiny_cfg(), tcfg, whisper_cfg=WCFG, n_model=4,
                 openvoice_params=ov_params)
    batch = _with_ids(make_batch(), [0, 1])
    warm = _prep_pair(tr, batch, cache_bytes=2 << 30)
    assert len(tr._feat_cache) == 2
    cold = _prep_pair(tr, batch, cache_bytes=0)
    _assert_feats_equal(warm, cold)
