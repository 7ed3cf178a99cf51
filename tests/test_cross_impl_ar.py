"""Cross-implementation parity for the v2 AR decode path.

The AR converter (``seedvc_tpu/convert/ar.py``) and the batched while_loop
decode (``seedvc_tpu/models/ar.py``) previously had NO test against the
reference — only a self-consistency row-independence test.  Here a tiny
reference ``NaiveTransformer``/``NaiveWrapper`` (``modules/v2/ar.py``) is
built in torch, its weights converted with ``convert_ar``, and

1. the packed-prefill logits are compared against the reference
   ``forward_generate`` on the exact ``generate`` sequence layout
   ``[sep ‖ cond ‖ sep ‖ target-prefix]`` with restarting rope positions
   (``ar.py:389-395``) — pinning the converter and the forward pass;
2. GREEDY token streams are compared end-to-end: with the exponential race
   noise forced to 1 on both sides (``multinomial_sample_one_no_sync``,
   ``ar.py:723-727`` / ``models/ar.py::sample_token``), sampling reduces to
   argmax over the top-p/penalty-filtered distribution, so the reference's
   Python decode loop (``ar.py:382-421``) and the repo's single compiled
   while_loop must emit IDENTICAL tokens — including the repetition-penalty
   scope (the reference's ``previous_tokens[0]`` scalar quirk, penalizing
   only the first generated token, ``ar.py:434-436``), the 10-token EOS
   suppression, and the left-padded B=2 batched decode vs two B=1
   reference runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DIM, N_LAYER, N_HEAD, N_KV, VOCAB, MAX_SEQ = 32, 2, 4, 2, 33, 256
TEMP, TOP_P, REP_PEN = 0.7, 0.7, 1.5


def _build_both():
    import torch

    from conftest import import_reference

    ref_ar = import_reference("modules.v2.ar")

    torch.manual_seed(3)
    t_cfg = ref_ar.NaiveModelArgs(
        dim=DIM, n_layer=N_LAYER, n_head=N_HEAD, n_local_heads=N_KV,
        intermediate_size=64, vocab_size=VOCAB, max_seq_len=MAX_SEQ)
    t_model = ref_ar.NaiveTransformer(t_cfg)
    t_wrap = ref_ar.NaiveWrapper(t_model).eval()
    t_wrap.setup_caches(1, MAX_SEQ, dtype=torch.float32, device="cpu")

    from seedvc_tpu.convert.ar import convert_ar
    from seedvc_tpu.models.ar import ARConfig, ARTransformer

    cfg = ARConfig(dim=DIM, n_layer=N_LAYER, n_head=N_HEAD,
                   n_local_heads=N_KV, head_dim=DIM // N_HEAD,
                   intermediate_size=64, vocab_size=VOCAB,
                   max_seq_len=MAX_SEQ)
    model = ARTransformer(cfg)
    params = {"params": convert_ar(t_wrap.state_dict(), n_layers=N_LAYER)}
    return t_wrap, model, params, ref_ar


def _ref_positions(cl: int, pl: int) -> np.ndarray:
    # generate's input_pos layout (ar.py:389-395):
    # [0..cl] (sep+cond) ‖ [0] (2nd sep) ‖ [1..pl] (target prefix)
    return np.concatenate([np.arange(cl + 1), [0], np.arange(pl) + 1])


@pytest.mark.slow
def test_convert_ar_prefill_logits_match_reference():
    import torch

    t_wrap, model, params, _ = _build_both()
    rng = np.random.default_rng(5)
    cl, pl = 12, 7
    cond = rng.standard_normal((1, cl, DIM)).astype(np.float32)
    tokens = rng.integers(0, VOCAB - 1, (1, pl))

    with torch.no_grad():
        sep = t_wrap.sep_token_emb.expand(1, 1, -1)
        tok_emb = t_wrap.model.embed_base(
            torch.from_numpy(tokens.copy()), torch.LongTensor([pl]))[1]
        emb_seq = torch.cat(
            [sep, torch.from_numpy(cond), sep, tok_emb], dim=1)
        L = emb_seq.size(1)
        input_pos = torch.from_numpy(_ref_positions(cl, pl)).long()
        kv_pos = torch.arange(L)
        ref_logits = t_wrap.model.forward_generate(
            emb_seq, input_pos, kv_pos).logits[0, -1].numpy()

    cfg = model.cfg
    apply = lambda *a, **kw: model.apply(params, *a, **kw)  # noqa: E731
    sep_j = apply(method=lambda m: m.sep_token)
    tok_emb_j = apply(jnp.asarray(tokens), method=model.embed_tokens)
    emb_j = jnp.concatenate(
        [sep_j[None, None], jnp.asarray(cond), sep_j[None, None], tok_emb_j],
        axis=1)
    pos_j = jnp.asarray(_ref_positions(cl, pl))[None]
    mask = (jnp.arange(cfg.max_seq_len)[None, :]
            <= jnp.arange(L)[:, None])[None, None]
    k0 = jnp.zeros((cfg.n_layer, 1, cfg.max_seq_len, cfg.n_local_heads,
                    cfg.head_dim), jnp.float32)
    our_logits, _, _ = apply(emb_j, pos_j, mask, k0, jnp.zeros_like(k0),
                             method=model.prefill)
    our_logits = np.asarray(our_logits[0])

    np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4, atol=2e-4)


def _greedy_patches(monkeypatch):
    """Force the exponential race noise to 1 on BOTH sides: argmax(probs/1)
    == greedy over the filtered distribution, making the stochastic decode
    deterministic and comparable."""
    import torch

    def fake_exponential_(self, lambd=1, *, generator=None):
        return self.fill_(1.0)

    monkeypatch.setattr(torch.Tensor, "exponential_", fake_exponential_)

    real_split = jax.random.split  # keep PRNG plumbing working

    def fake_exponential(key, shape=(), dtype=jnp.float32):
        return jnp.ones(shape, dtype)

    monkeypatch.setattr(jax.random, "exponential", fake_exponential)
    assert jax.random.split is real_split


@pytest.mark.slow
def test_greedy_decode_tokens_match_reference(monkeypatch):
    import torch

    from seedvc_tpu.models.ar import make_generate_fn

    t_wrap, model, params, ref_ar = _build_both()
    _greedy_patches(monkeypatch)

    # with greedy (noise=1) sampling the tiny random model may never emit
    # EOS; bound the reference's 4000-iteration loop (ar.py:404) so it
    # cannot outrun its KV cache — truncating its stream at MAX_NEW is
    # enough for the comparison
    import itertools

    monkeypatch.setattr(
        ref_ar, "tqdm", lambda it: itertools.islice(it, MAX_NEW))

    rng = np.random.default_rng(6)
    MAX_NEW = 32
    cond_lens = [24, 17]
    prompt_lens = [16, 11]
    B, C_max, P_max = 2, max(cond_lens), max(prompt_lens)
    cond = rng.standard_normal((B, C_max, DIM)).astype(np.float32)
    tokens = rng.integers(0, VOCAB - 1, (B, P_max))

    # --- reference: two B=1 generate calls (its loop is B=1 Python) ---
    ref_streams = []
    with torch.no_grad():
        for b in range(B):
            cl, pl = cond_lens[b], prompt_lens[b]
            # fresh caches per run (generate mutates them in place)
            t_wrap.model.max_seq_len = -1
            t_wrap.model.max_batch_size = -1
            t_wrap.setup_caches(1, MAX_SEQ, dtype=torch.float32,
                                device="cpu")
            out = t_wrap.generate(
                torch.from_numpy(cond[b: b + 1, :cl].copy()),
                torch.from_numpy(tokens[b: b + 1, :pl].copy()),
                temperature=TEMP, top_p=TOP_P, repetition_penalty=REP_PEN)
            ref_streams.append(out.flatten().numpy()[:MAX_NEW])

    # --- repo: ONE batched left-padded compiled decode ---
    gen = make_generate_fn(model, max_new_tokens=MAX_NEW, temperature=TEMP,
                           top_p=TOP_P, repetition_penalty=REP_PEN)
    toks, n_tok = gen(params, jnp.asarray(cond),
                      jnp.asarray(cond_lens, jnp.int32),
                      jnp.asarray(tokens), jnp.asarray(prompt_lens, jnp.int32),
                      jax.random.PRNGKey(0))
    toks, n_tok = np.asarray(toks), np.asarray(n_tok)

    for b in range(B):
        n = int(n_tok[b])
        ref = ref_streams[b]
        assert n > 0
        np.testing.assert_array_equal(
            toks[b, :n], ref[:n],
            err_msg=f"row {b}: greedy token stream diverged")
        if n < MAX_NEW:
            # our row stopped on EOS — the reference must have stopped at
            # the same length (its stream has no more tokens)
            assert len(ref) == n, (
                f"row {b}: ours stopped at {n}, reference emitted {len(ref)}")
