"""AR training loss: packed-sequence cross-entropy.

Re-design of the reference NaiveWrapper.forward (``modules/v2/ar.py:339-363``)
without per-sample Python loops.  Packed layout per sample (valid region):

    [sep, cond[0..cl), sep, emb(x[0..xl))]      (second sep at index cl+1)

- RoPE positions restart at the second sep (``ar.py:355-362``),
- labels (``ar.py:283-310``): position p in [cl+1, cl+xl] predicts
  x[p-(cl+1)] (next token; the second sep predicts x[0]), position cl+xl+1
  predicts EOS, everything else is ignored (-100),
- x is padded with EOS beyond its length before embedding
  (``embed_base``, ``ar.py:186-192``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from seedvc_tpu.models.ar import ARTransformer


def ar_loss(model: ARTransformer, params, cond_emb: jax.Array,
            cond_lens: jax.Array, targets: jax.Array, target_lens: jax.Array):
    """cond_emb: (B, C_max, D) regulated narrow-token embeddings;
    targets: (B, X_max) wide tokens.  Returns mean CE over valid labels."""
    cfg = model.cfg
    B, C_max, D = cond_emb.shape
    X_max = targets.shape[1]
    L = 2 + C_max + X_max
    idx = jnp.arange(L)[None, :]                      # (1, L) -> broadcast B
    second_sep = (cond_lens + 1)[:, None]             # (B, 1)

    pos_x = jnp.arange(X_max)[None, :]
    x_tok = jnp.where(pos_x < target_lens[:, None], targets, cfg.eos)
    tok_emb = model.apply(params, x_tok, method=model.embed_tokens)
    sep = model.apply(params, method=lambda m: m.sep_token)

    cond_gather = jnp.broadcast_to(
        jnp.clip(idx - 1, 0, C_max - 1)[..., None], (B, L, D))
    tok_gather = jnp.broadcast_to(
        jnp.clip(idx - second_sep - 1, 0, X_max - 1)[..., None], (B, L, D))
    is_sep = (idx == 0) | (idx == second_sep)
    emb = jnp.where(
        is_sep[..., None], sep[None, None, :],
        jnp.where((idx < second_sep)[..., None],
                  jnp.take_along_axis(cond_emb, cond_gather, axis=1),
                  jnp.take_along_axis(tok_emb, tok_gather, axis=1)))

    pos = jnp.where(idx <= cond_lens[:, None], idx, idx - second_sep)
    valid_len = (2 + cond_lens + target_lens)[:, None]

    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    key_valid = (idx < valid_len)[:, None, None, :]
    mask = causal & key_valid

    logits = model.apply(params, emb, pos, mask)  # (B, L, vocab)

    tgt_region = (idx >= second_sep) & (idx < second_sep + target_lens[:, None])
    eos_pos = idx == (second_sep + target_lens[:, None])
    shift = jnp.clip(idx - second_sep, 0, X_max - 1)
    labels = jnp.where(tgt_region,
                       jnp.take_along_axis(x_tok, shift, axis=1),
                       jnp.where(eos_pos, cfg.eos, -100))

    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
