"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.parallel.mesh import make_mesh
from seedvc_tpu.parallel.sharding import logical_to_sharding


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_sharding_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "layers_0": {
            "attention": {"wqkv": {"kernel": jnp.zeros((64, 192))},
                          "wo": {"kernel": jnp.zeros((64, 64))}},
            "feed_forward": {"w1": {"kernel": jnp.zeros((64, 256))},
                             "w2": {"kernel": jnp.zeros((256, 64))}},
        },
        "other": {"kernel": jnp.zeros((7, 3))},
    }
    sh = logical_to_sharding(params, mesh)
    assert sh["layers_0"]["attention"]["wqkv"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["layers_0"]["attention"]["wo"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["layers_0"]["feed_forward"]["w2"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    # non-divisible / unmatched -> replicated
    assert sh["other"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_fsdp_spec_augmentation():
    """fsdp_axis shards the largest unsharded dim of large params over the
    data axis, composing with the TP rules (ZeRO-3 analogue)."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "layers_0": {
            "attention": {"wqkv": {"kernel": jnp.zeros((64, 192))}},
            "feed_forward": {"w2": {"kernel": jnp.zeros((256, 64))}},
        },
        "embed": {"kernel": jnp.zeros((128, 64))},
        "tiny": {"bias": jnp.zeros((64,))},
    }
    sh = logical_to_sharding(params, mesh, fsdp_axis="data",
                             fsdp_min_elems=1024)
    # TP out-dim split stays; FSDP takes the remaining (in) dim
    assert sh["layers_0"]["attention"]["wqkv"]["kernel"].spec == P("data", "model")
    # row-parallel w2: model on dim 0, data goes to dim 1
    assert sh["layers_0"]["feed_forward"]["w2"]["kernel"].spec == P("model", "data")
    # unmatched large param: largest divisible dim sharded
    assert sh["embed"]["kernel"].spec == P("data", None)
    # small params stay replicated
    assert sh["tiny"]["bias"].spec == P()


def test_fsdp_train_step_matches_replicated():
    """One fully-sharded (FSDP) train step produces the same new params as
    the replicated-weights step: the sharding is a pure layout choice, XLA
    inserts the weight all-gathers / gradient reduce-scatters."""
    import optax

    from seedvc_tpu.core.config import (DiTConfig, LengthRegulatorConfig,
                                        ModelParams)
    from seedvc_tpu.models.vc import VCModel
    from seedvc_tpu.train.step import (init_state, make_sharded_train_step,
                                       shard_state)

    mp = ModelParams(
        length_regulator=LengthRegulatorConfig(channels=16, is_discrete=False,
                                               in_channels=32,
                                               sampling_ratios=(1,)),
        DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=80,
                      final_layer_type="mlp", content_dim=16,
                      long_skip_connection=False, uvit_skip_connection=False),
    )
    model = VCModel(mp)
    optimizer = optax.adamw(1e-3)
    rng = jax.random.PRNGKey(0)
    B, Ts, Tm = 4, 8, 16
    batch = {
        "s_alt": jax.random.normal(rng, (B, Ts, 32)),
        "s_ori": jax.random.normal(jax.random.PRNGKey(1), (B, Ts, 32)),
        "mels": jax.random.normal(jax.random.PRNGKey(2), (B, Tm, 80)),
        "mel_lens": jnp.full((B,), Tm, jnp.int32),
        "style": jax.random.normal(jax.random.PRNGKey(3), (B, 192)),
    }
    mesh = make_mesh(n_data=4, n_model=2)
    outs = {}
    for fsdp in (False, True):
        # fresh state per run: the jitted step donates its input state
        state = shard_state(init_state(model, optimizer, rng, batch), mesh,
                            fsdp=fsdp, fsdp_min_elems=512)
        if fsdp:
            # the FSDP placement must actually scatter something
            specs = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda a: "data" in str(a.sharding.spec),
                                       state.params))
            assert any(specs)
        step = make_sharded_train_step(model, optimizer, mesh)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss"]))
        outs[fsdp] = jax.tree_util.tree_map(np.asarray, new_state.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5),
        outs[False], outs[True])


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    res = compiled(*args)
    assert res.shape == (2, 256, 80)


def test_distributed_initialize_single_process_noop(monkeypatch):
    """Without a coordinator configured, initialize() is a no-op returning
    False; is_coordinator() still answers."""
    import seedvc_tpu.parallel.distributed as D

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    D._initialized = False
    assert D.initialize() is False
    assert D.is_coordinator() is True  # single process == rank 0


def test_cfg_branch_sharded_sampler_matches_unsharded():
    """euler_solve(shard_axis='data') splits the CFG-stacked batch across
    the mesh and produces the same mel as the single-device run (SURVEY
    §2.10 CFG-branch sharding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvc_tpu.core.config import (DiTConfig, LengthRegulatorConfig,
                                        ModelParams)
    from seedvc_tpu.models.cfm import CFM, euler_solve
    from seedvc_tpu.parallel.mesh import make_mesh

    mp = ModelParams(
        length_regulator=LengthRegulatorConfig(channels=32, is_discrete=False,
                                               in_channels=32,
                                               sampling_ratios=(1,)),
        DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=16,
                      final_layer_type="mlp", content_dim=32,
                      long_skip_connection=False, uvit_skip_connection=False),
    )
    cfm = CFM(mp)
    B, T, C, D = 1, 24, 16, 32
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (B, T, D))
    lens = jnp.full((B,), T, jnp.int32)
    prompt = jnp.zeros((B, T, C))
    style = jax.random.normal(key, (B, 192))
    variables = cfm.init(key, jnp.zeros((B, T, C)), prompt, lens,
                         jnp.zeros((B,)), style, mu, method=cfm.estimate)

    def estimate(x, p, l, t, s, m):
        return cfm.apply(variables, x, p, l, t, s, m, method=cfm.estimate)

    def run(shard_axis):
        return euler_solve(estimate, key, mu, lens, prompt, 4, style,
                           n_mels=C, n_timesteps=3, cfg_rate=0.7,
                           shard_axis=shard_axis)

    base = np.asarray(jax.jit(lambda: run(None))())

    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        sharded = np.asarray(jax.jit(lambda: run("data"))())
    np.testing.assert_allclose(base, sharded, atol=2e-5)


def test_v2_multicfg_sharded_sampler_matches_unsharded():
    """euler_solve_multicfg(shard_axis='cfg') splits the 3-way CFG stack
    [full / text-only / unconditional] across the mesh and matches the
    single-device run (SURVEY §2.10; mirrors v1 euler_solve sharding)."""
    from seedvc_tpu.models.cfm_v2 import euler_solve_multicfg
    from seedvc_tpu.models.dit_v2 import DiTV2, DiTV2Config

    cfg = DiTV2Config(hidden_dim=32, depth=2, num_heads=4, in_channels=16,
                      content_dim=32, style_encoder_dim=24)
    dit = DiTV2(cfg)
    B, T, C, D = 1, 24, 16, 32
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (B, T, D))
    lens = jnp.full((B,), T, jnp.int32)
    prompt = jnp.zeros((B, T, C))
    style = jax.random.normal(key, (B, 24))
    variables = dit.init(key, jnp.zeros((B, T, C)), prompt, lens,
                         jnp.zeros((B,)), style, mu)

    def estimate(x, p, l, t, s, m):
        return dit.apply(variables, x, p, l, t, s, m)

    def run(shard_axis, seq_shard_axis=None):
        # both rates nonzero -> the full 3-way MegaTTS3 stack
        return euler_solve_multicfg(estimate, key, mu, lens, prompt, 4,
                                    style, n_mels=C, n_timesteps=3,
                                    cfg_rates=(0.6, 0.4),
                                    shard_axis=shard_axis,
                                    seq_shard_axis=seq_shard_axis)

    base = np.asarray(jax.jit(lambda: run(None))())

    # 3 CFG branches: shard over an axis the stack divides into is not
    # required — XLA pads uneven shards; use the data axis like v1.
    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        sharded = np.asarray(jax.jit(lambda: run("data"))())
        seq = np.asarray(jax.jit(lambda: run("data", "model"))())
    np.testing.assert_allclose(base, sharded, atol=2e-5)
    np.testing.assert_allclose(base, seq, atol=2e-5)


def test_seq_sharded_sampler_matches_unsharded():
    """euler_solve(seq_shard_axis=...) shards the TIME axis of the sampler
    activations over the mesh (SURVEY §5.7's sequence-parallel stretch
    goal): XLA inserts the attention all-gathers and WaveNet conv halo
    exchanges; output matches the unsharded run.  Composed with the CFG
    branch split (shard_axis) on the other mesh axis."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvc_tpu.core.config import (DiTConfig, LengthRegulatorConfig,
                                        ModelParams, WavenetConfig)
    from seedvc_tpu.models.cfm import CFM, euler_solve
    from seedvc_tpu.parallel.mesh import make_mesh

    # wavenet head so the k=5 convs exercise halo partitioning over T
    mp = ModelParams(
        length_regulator=LengthRegulatorConfig(channels=32, is_discrete=False,
                                               in_channels=32,
                                               sampling_ratios=(1,)),
        DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=16,
                      final_layer_type="wavenet", content_dim=32,
                      long_skip_connection=False, uvit_skip_connection=False),
        wavenet=WavenetConfig(hidden_dim=32, num_layers=2, kernel_size=5,
                              p_dropout=0.0),
    )
    cfm = CFM(mp)
    B, T, C, D = 1, 32, 16, 32
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (B, T, D))
    lens = jnp.full((B,), T, jnp.int32)
    prompt = jnp.zeros((B, T, C))
    style = jax.random.normal(key, (B, 192))
    variables = cfm.init(key, jnp.zeros((B, T, C)), prompt, lens,
                         jnp.zeros((B,)), style, mu, method=cfm.estimate)

    def estimate(x, p, l, t, s, m):
        return cfm.apply(variables, x, p, l, t, s, m, method=cfm.estimate)

    def run(shard_axis, seq_shard_axis):
        return euler_solve(estimate, key, mu, lens, prompt, 4, style,
                           n_mels=C, n_timesteps=3, cfg_rate=0.7,
                           shard_axis=shard_axis,
                           seq_shard_axis=seq_shard_axis)

    base = np.asarray(jax.jit(lambda: run(None, None))())

    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        seq_only = np.asarray(jax.jit(lambda: run(None, "model"))())
        both = np.asarray(jax.jit(lambda: run("data", "model"))())
    np.testing.assert_allclose(base, seq_only, atol=2e-5)
    np.testing.assert_allclose(base, both, atol=2e-5)


def test_data_sharded_feature_prep_matches_replicated():
    """On-the-fly feature prep shards its host->device inputs over the
    data axis (Trainer._put): on a multi-chip mesh the frozen-encoder
    programs (whisper/warp/mel/style) run SPMD over `data` — the
    documented path past the single-chip on-the-fly ceiling.  The sharded
    prep must equal the replicated prep bit-for-bit (per-sample math only
    crosses the batch dim at the shard boundary)."""
    from tests.test_trainer import tiny_cfg
    from seedvc_tpu.models.whisper import WhisperEncoderConfig
    from seedvc_tpu.train.dataset import Batch
    from seedvc_tpu.train.trainer import Trainer, TrainerConfig

    wcfg = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)
    tcfg = TrainerConfig(data_path="", run_dir="", batch_size=2,
                         mel_bucket=64, prefetch=0, feat_cache_bytes=0)
    trainer = Trainer(tiny_cfg(), tcfg, whisper_cfg=wcfg, n_model=4)
    assert trainer._n_data == 2

    rng = np.random.default_rng(0)
    waves = (rng.standard_normal((2, 22050)) * 0.1).astype(np.float32)
    w16 = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    batch = Batch(waves, w16, np.array([22050, 20000], np.int32),
                  np.array([16000, 14500], np.int32))

    feats = trainer.prepare_batch(batch, np.random.default_rng(1), step=0)
    # the whisper features and mels actually landed sharded over `data`
    for key in ("s_ori", "mels"):
        spec = feats[key].sharding.spec
        assert "data" in tuple(spec), (key, spec)

    # forcing the replicated fallback must give identical features
    trainer._n_data = 1
    feats_rep = trainer.prepare_batch(batch, np.random.default_rng(1), step=0)
    for key in ("s_ori", "s_alt", "style", "mels"):
        np.testing.assert_allclose(np.asarray(feats[key]),
                                   np.asarray(feats_rep[key]),
                                   rtol=0, atol=1e-6, err_msg=key)

    # and the sharded feats drive one finite sharded train step
    trainer._n_data = 2
    state, metrics = trainer.step_fn(trainer.state, feats,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
