"""v2 AR token-to-token transformer with TPU-native incremental decode.

Re-design of ``modules/v2/ar.py`` (gpt-fast style NaiveTransformer/
NaiveWrapper): decoder-only LM (768d/12L/12H, GQA with 2 KV heads, vocab
2049 = 2048 wide codes + EOS) over sequences

    [sep ‖ cond(narrow embeds) ‖ sep ‖ target wide tokens]

with per-segment restarting RoPE positions (``ar.py:339-363``) and global KV
positions.  The reference decodes with a Python loop over
``forward_generate`` + KV-cache mutation (``ar.py:404-421``); here decode is
ONE compiled ``lax.while_loop`` with:

- explicit KV cache arrays (functional update via dynamic_update_slice),
- top-p + repetition-penalty + temperature sampling (``ar.py:730-763``)
  with the exponential-race trick for multinomial sampling
  (``ar.py:723-727``); the penalty scope matches the reference's RUNTIME
  behaviour (first generated token only — see ``make_generate_fn``),
- EOS suppressed for the first 10 tokens (``vc_wrapper`` behaviour,
  ``ar.py:405``), loop exits on EOS or max_new_tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.nn.layers import RMSNorm, apply_rope, rope_cache


@dataclass(frozen=True)
class ARConfig:
    dim: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_local_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 2304
    vocab_size: int = 2049
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 4096

    @property
    def eos(self) -> int:
        return self.vocab_size - 1


class ARAttention(nn.Module):
    cfg: ARConfig

    @nn.compact
    def __call__(self, x, freqs, mask, kv_write_pos=None, k_cache=None,
                 v_cache=None):
        """x: (B, S, D); freqs: (B, S, hd//2, 2) per-position rope.

        Full-sequence mode (kv_write_pos None): standard attention with mask.
        Decode mode: S==1; k/v written into caches at kv_write_pos; attention
        over the whole cache with `mask` (B, 1, 1, max_seq).
        Returns (out, k_cache, v_cache).
        """
        c = self.cfg
        B, S, _ = x.shape
        kv_size = c.n_local_heads * c.head_dim
        qkv = nn.Dense((c.n_head + 2 * c.n_local_heads) * c.head_dim,
                       use_bias=False, name="wqkv", dtype=x.dtype)(x)
        q, k, v = jnp.split(qkv, [c.n_head * c.head_dim,
                                  c.n_head * c.head_dim + kv_size], axis=-1)
        q = q.reshape(B, S, c.n_head, c.head_dim)
        k = k.reshape(B, S, c.n_local_heads, c.head_dim)
        v = v.reshape(B, S, c.n_local_heads, c.head_dim)

        q = _apply_rope_batched(q, freqs)
        k = _apply_rope_batched(k, freqs)

        if kv_write_pos is not None:
            # decode: write this step's k/v into the cache.
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k, (0, kv_write_pos, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v, (0, kv_write_pos, 0, 0))
            k_all, v_all = k_cache, v_cache
        else:
            k_all, v_all = k, v

        # GQA via grouped einsum — NO jnp.repeat: repeating the KV cache
        # materializes a (B, max_seq, n_head, hd) copy in HBM per layer per
        # decode step (6x the cache), which dominated decode latency.  The
        # grouped contraction reads each KV entry once.
        rep = c.n_head // c.n_local_heads
        qg = q.reshape(B, S, c.n_local_heads, rep, c.head_dim)
        scale = c.head_dim ** -0.5
        logits = jnp.einsum("bsgrd,bkgd->bgrsk", qg, k_all,
                            preferred_element_type=jnp.float32) * scale
        # mask: (B, 1, S|1, K) -> broadcast over (g, r)
        logits = jnp.where(mask[:, :, None], logits,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bgrsk,bkgd->bsgrd", probs, v_all,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, S, c.n_head * c.head_dim)
        out = nn.Dense(c.dim, use_bias=False, name="wo", dtype=x.dtype)(out)
        return out, k_cache, v_cache


def _apply_rope_batched(x, freqs):
    """x: (B, S, H, D); freqs: (B, S, D//2, 2) — per-batch positions."""
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = freqs[:, :, None, :, 0]
    sin = freqs[:, :, None, :, 1]
    out = jnp.stack(
        [xf[..., 0] * cos - xf[..., 1] * sin,
         xf[..., 1] * cos + xf[..., 0] * sin], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class ARBlock(nn.Module):
    cfg: ARConfig

    @nn.compact
    def __call__(self, x, freqs, mask, kv_write_pos=None, k_cache=None,
                 v_cache=None):
        c = self.cfg
        h = RMSNorm(c.dim, c.norm_eps, name="attention_norm")(x)
        attn, k_cache, v_cache = ARAttention(c, name="attention")(
            h, freqs, mask, kv_write_pos, k_cache, v_cache)
        x = x + attn
        h = RMSNorm(c.dim, c.norm_eps, name="ffn_norm")(x)
        h1 = nn.Dense(c.intermediate_size, use_bias=False, name="feed_forward_w1",
                      dtype=x.dtype)(h)
        h3 = nn.Dense(c.intermediate_size, use_bias=False, name="feed_forward_w3",
                      dtype=x.dtype)(h)
        h = nn.Dense(c.dim, use_bias=False, name="feed_forward_w2",
                     dtype=x.dtype)(nn.silu(h1) * h3)
        return x + h, k_cache, v_cache


class ARTransformer(nn.Module):
    cfg: ARConfig

    def setup(self):
        c = self.cfg
        self.embeddings = nn.Embed(c.vocab_size, c.dim, name="embeddings")
        self.blocks = [ARBlock(c, name=f"layers_{i}") for i in range(c.n_layer)]
        self.norm = RMSNorm(c.dim, c.norm_eps, name="norm")
        self.output = nn.Dense(c.vocab_size, use_bias=False, name="output")
        self.sep_token = self.param("sep_token_emb",
                                    nn.initializers.normal(1.0), (c.dim,))

    def _freqs(self, input_pos):
        """input_pos: (B, S) -> (B, S, hd//2, 2)."""
        table = jnp.asarray(rope_cache(self.cfg.max_seq_len, self.cfg.head_dim,
                                       self.cfg.rope_base))
        return table[input_pos]

    def embed_tokens(self, tokens):
        return self.embeddings(tokens)

    def init_all(self, tokens, input_pos, attn_mask):
        """Init entry point touching every submodule (setup-lazy params are
        only created for code paths exercised during init)."""
        emb = self.embed_tokens(tokens) + self.sep_token
        return self(emb, input_pos, attn_mask)

    def __call__(self, emb_seq, input_pos, attn_mask):
        """Full-sequence forward (training / prefill without cache).

        emb_seq: (B, S, D); input_pos: (B, S); attn_mask: (B, 1, S, S) bool.
        Returns logits (B, S, vocab).
        """
        freqs = self._freqs(input_pos)
        x = emb_seq
        for blk in self.blocks:
            x, _, _ = blk(x, freqs, attn_mask)
        return self.output(self.norm(x))

    def prefill(self, emb_seq, input_pos, attn_mask, k_caches, v_caches):
        """Full-sequence forward that also fills the KV caches.

        k_caches/v_caches: (L, B, max_seq, n_kv, hd).  Returns
        (logits_last (B, vocab), k_caches, v_caches)."""
        freqs = self._freqs(input_pos)
        x = emb_seq
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            x, kc, vc = blk(x, freqs, attn_mask, kv_write_pos=0,
                            k_cache=k_caches[i], v_cache=v_caches[i])
            new_k.append(kc)
            new_v.append(vc)
        logits = self.output(self.norm(x[:, -1]))
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    def decode_step(self, x_emb, input_pos, kv_pos, k_caches, v_caches,
                    min_key=None):
        """One-token decode.  x_emb: (B, 1, D); input_pos/kv_pos: (B,)/scalar.

        Attention mask: positions <= kv_pos valid (causal over global kv);
        ``min_key`` (B,) additionally excludes cache slots below a per-row
        start (left-padded batched decode never reads pad slots).
        Returns (logits (B, vocab), k_caches, v_caches)."""
        c = self.cfg
        freqs = self._freqs(input_pos[:, None])
        keys = jnp.arange(c.max_seq_len)[None, None, None, :]
        valid = keys <= kv_pos
        if min_key is not None:
            valid = valid & (keys >= min_key[:, None, None, None])
        x = x_emb
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            x, kc, vc = blk(x, freqs, valid, kv_write_pos=kv_pos,
                            k_cache=k_caches[i], v_cache=v_caches[i])
            new_k.append(kc)
            new_v.append(vc)
        logits = self.output(self.norm(x[:, 0]))
        return logits, jnp.stack(new_k), jnp.stack(new_v)


def sample_token(key, logits, penal_mask, *, temperature=0.7, top_p=0.7,
                 repetition_penalty=1.5, suppress_eos=False, eos=2048):
    """Reference ``logits_to_probs`` + exponential-race multinomial
    (``ar.py:723-763``).  logits: (vocab,); penal_mask: (vocab,) bool —
    which vocab entries receive the repetition penalty.  temperature/
    top_p/repetition_penalty may be traced scalars (no recompile per
    setting)."""
    logits = logits.astype(jnp.float32)  # fp32 sampling under bf16 decode
    penal = jnp.where(logits < 0, logits * repetition_penalty,
                      logits / repetition_penalty)
    logits = jnp.where(penal_mask, penal, logits)
    logits = jnp.where(
        (jnp.arange(logits.shape[0]) == eos) & suppress_eos,
        -jnp.inf, logits)

    # top-p on the pre-temperature distribution (reference order).
    sort_idx = jnp.argsort(-logits)
    sorted_logits = logits[sort_idx]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits), axis=-1)
    remove_sorted = cum > top_p
    remove_sorted = remove_sorted.at[0].set(False)
    remove = jnp.zeros_like(remove_sorted).at[sort_idx].set(remove_sorted)
    logits = jnp.where(remove, -jnp.inf, logits)

    logits = logits / jnp.maximum(temperature, 1e-5)
    probs = jax.nn.softmax(logits)
    q = jax.random.exponential(key, probs.shape)
    return jnp.argmax(probs / q).astype(jnp.int32)


class DecodeState(NamedTuple):
    step: jax.Array         # global decode step (scalar)
    steps: jax.Array        # (B,) tokens generated per row
    kv_pos: jax.Array       # next kv write position (scalar: rows aligned)
    input_pos: jax.Array    # (B,) next rope position (restarting segment)
    last_token: jax.Array   # (B,)
    tokens: jax.Array       # (B, max_new) output buffer
    presence: jax.Array     # (B, vocab) bool, for repetition penalty
    k_caches: jax.Array
    v_caches: jax.Array
    key: jax.Array
    done: jax.Array         # (B,)


def make_generate_fn(model: ARTransformer, max_new_tokens: int = 1024,
                     temperature: float = 0.7, top_p: float = 0.7,
                     repetition_penalty: float = 1.5,
                     penalty_scope: str = "first"):
    """Build a jittable generate(params, cond_emb, cond_lens, prompt_tokens,
    prompt_lens, key[, temperature, top_p, repetition_penalty])
    -> (tokens (B, max_new), n_tokens (B,)).

    The sampling knobs are TRACED arguments of the returned fn (one compile
    covers every setting); the make-time values are just call defaults.

    penalty_scope selects what the repetition penalty applies to:

    - ``"first"`` (default): ONLY the first token generated in this call —
      the reference's actual runtime behaviour: ``generate`` passes the
      1-D ``torch.cat(pred_codes)`` and ``decode_one_token_ar`` indexes
      ``previous_tokens[0]`` (``ar.py:737``, ``:434-436``), a scalar, so
      ``logits_to_probs`` gathers/scatters exactly one vocab entry
      (``ar.py:744-751``).  Cross-impl-pinned by
      ``tests/test_cross_impl_ar.py``.
    - ``"all"``: every token emitted so far (a presence set) — the
      fish-speech-style semantics the reference code APPEARS to intend
      (the ``[0]`` selects codebook 0 of a multi-codebook layout that is
      1-D here).  Kept as an opt-in knob.

    cond_emb: (B, C_max, D) narrow-token embeddings (regulated), padded;
    prompt_tokens: (B, P_max) target-prefix wide tokens, padded;
    cond_lens/prompt_lens: scalar or (B,) true lengths.
    Sequence layout matches the reference generate (``ar.py:382-421``):
    [sep ‖ cond ‖ sep ‖ prompt_target] with rope positions restarting at the
    second sep; kv positions are global cache slots.

    TPU-first batched decode (the reference loop is B=1 Python,
    ``ar.py:404-421``): rows are LEFT-padded inside the packed prefill so
    every row's last valid token lands on the same cache slot — decode then
    writes all rows at one scalar kv position per step (no per-row scatter),
    and per-row EOS flags mask finished rows.  The v2 pipeline batches the
    1500-token chunks of one utterance through this (``convert_v2.py``).
    """
    cfg = model.cfg
    if penalty_scope not in ("first", "all"):
        raise ValueError(f"penalty_scope {penalty_scope!r}")

    def generate(params, cond_emb, cond_lens, prompt_tokens, prompt_lens,
                 key, temperature=temperature, top_p=top_p,
                 repetition_penalty=repetition_penalty):
        B, C_max, D = cond_emb.shape
        P_max = prompt_tokens.shape[1]
        S_max = cfg.max_seq_len
        cond_lens = jnp.broadcast_to(jnp.asarray(cond_lens, jnp.int32), (B,))
        prompt_lens = jnp.broadcast_to(jnp.asarray(prompt_lens, jnp.int32),
                                       (B,))

        # Token-by-token decode is weight-streaming bound (one forward per
        # token): bf16 params halve the HBM traffic per step on TPU.  The
        # reference runs the AR in fp16 on GPU; logits/sampling stay fp32.
        if jax.default_backend() == "tpu":
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            cond_emb = cond_emb.astype(jnp.bfloat16)

        apply = partial(model.apply, params)
        sep = apply(method=lambda m: m.sep_token)  # (D,)
        tok_emb = apply(prompt_tokens, method=model.embed_tokens)  # (B,P,D)

        # Packed prefill sequence, static length 2 + C_max + P_max, LEFT-
        # padded per row: [pad… ‖ sep ‖ cond[:cl] ‖ sep ‖ tok[:pl]] so the
        # last valid token sits at slot L_pre-1 for every row.
        L_pre = 2 + C_max + P_max
        valid_len = 2 + cond_lens + prompt_lens           # (B,)
        off = (L_pre - valid_len)[:, None]                # (B, 1) row starts
        idx = jnp.arange(L_pre)[None, :]                  # (1, L_pre)
        rel = idx - off                                   # (B, L_pre)
        second_sep = (cond_lens + 1)[:, None]
        is_sep = (rel == 0) | (rel == second_sep)
        in_cond = (rel > 0) & (rel < second_sep)
        cond_gather = jnp.clip(rel - 1, 0, C_max - 1)
        tok_gather = jnp.clip(rel - second_sep - 1, 0, P_max - 1)
        emb = jnp.where(
            is_sep[..., None], sep[None, None, :],
            jnp.where(in_cond[..., None],
                      jnp.take_along_axis(cond_emb, cond_gather[..., None],
                                          axis=1),
                      jnp.take_along_axis(tok_emb, tok_gather[..., None],
                                          axis=1)))
        # rope positions restart at the second sep (reference ar.py:414-419):
        # [0..cond_len] ‖ [0] ‖ [1..prompt_len]; pad positions clamp to 0.
        pos = jnp.where(rel < second_sep, jnp.maximum(rel, 0),
                        rel - second_sep)

        # prefill causal mask per row: off <= key <= query (pad queries self-
        # attend to avoid all-masked softmax rows; their outputs are unused).
        keys = jnp.arange(S_max)[None, None, None, :]
        q_idx = idx[:, :, None]                           # (B, L_pre, 1)
        mask = ((keys[:, 0] <= q_idx) &
                ((keys[:, 0] >= off[..., None]) | (keys[:, 0] == q_idx))
                )[:, None]                                # (B,1,L_pre,S_max)

        k0 = jnp.zeros((cfg.n_layer, B, S_max, cfg.n_local_heads,
                        cfg.head_dim), cond_emb.dtype)
        v0 = jnp.zeros_like(k0)
        logits, kc, vc = apply(emb, pos, mask, k0, v0, method=model.prefill)
        # left padding => prefill's final-row logits ARE the last valid
        # token's logits for every row (no fix-up decode step needed).

        min_key = off[:, 0]  # decode never reads pad slots
        presence0 = jnp.zeros((B, cfg.vocab_size), bool)
        tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)

        def sample_batch(key, logits, penal_mask, suppress_eos):
            subs = jax.random.split(key, B)
            return jax.vmap(
                lambda k, lg, pm: sample_token(
                    k, lg, pm, temperature=temperature, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                    suppress_eos=suppress_eos, eos=cfg.eos)
            )(subs, logits, penal_mask)

        key, sub = jax.random.split(key)
        first_tok = sample_batch(sub, logits, presence0,
                                 suppress_eos=jnp.asarray(True))
        rows = jnp.arange(B)
        state = DecodeState(
            step=jnp.asarray(1, jnp.int32),
            steps=jnp.ones((B,), jnp.int32),
            kv_pos=jnp.asarray(L_pre, jnp.int32),
            input_pos=prompt_lens + 1,
            last_token=first_tok,
            tokens=tokens0.at[rows, 0].set(first_tok),
            presence=presence0.at[rows, first_tok].set(True),
            k_caches=kc, v_caches=vc, key=key,
            done=jnp.zeros((B,), bool),
        )

        def cond_fn(s: DecodeState):
            return (~jnp.all(s.done)) & (s.step < max_new_tokens)

        def body_fn(s: DecodeState):
            emb1 = apply(s.last_token[:, None], method=model.embed_tokens)
            logits, kc, vc = apply(
                emb1, s.input_pos, s.kv_pos, s.k_caches, s.v_caches,
                min_key=min_key, method=model.decode_step)
            key, sub = jax.random.split(s.key)
            if penalty_scope == "first":
                # reference runtime semantics: penalize pred_codes[0] only
                # (ar.py:434-436 previous_tokens[0] is a scalar)
                penal_mask = jax.nn.one_hot(
                    s.tokens[:, 0], cfg.vocab_size, dtype=bool)
            else:
                penal_mask = s.presence
            tok = sample_batch(sub, logits, penal_mask,
                               suppress_eos=s.step < 10)
            is_eos = tok == cfg.eos
            active = ~s.done
            write = active & ~is_eos
            tokens = s.tokens.at[rows, s.steps].set(
                jnp.where(write, tok, s.tokens[rows, s.steps]))
            presence = s.presence.at[rows, tok].set(
                s.presence[rows, tok] | write)
            return DecodeState(
                step=s.step + 1,
                steps=s.steps + write.astype(jnp.int32),
                kv_pos=s.kv_pos + 1,
                input_pos=s.input_pos + 1,
                last_token=jnp.where(active, tok, s.last_token),
                tokens=tokens,
                presence=presence,
                k_caches=kc, v_caches=vc, key=key,
                done=s.done | is_eos,
            )

        final = jax.lax.while_loop(cond_fn, body_fn, state)
        return final.tokens, final.steps

    return generate
