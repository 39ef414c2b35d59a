"""BLIP caption decoder — the reference's BLIP_Decoder / BertLMHeadModel
capability (blip.py:78-169, med.py:825-969). Unused by the CIR pipelines but
part of the BLIP family the reference code carries; provided so the framework
covers the full surface.

Components:
- ``BertLMHead``: transform dense -> GELU -> LayerNorm -> vocab projection
  (+ bias), matching the reference's BertLMPredictionHead parameterization
  (cls.predictions.* checkpoint keys, converted in runtime/convert.py).
- ``CaptionDecoder``: ViT image encoder + causal MED decoder + LM head.

Two decoding paths, output-identical:
- recompute (``greedy_caption`` / ``beam_caption``): full-prefix forward per
  step, O(T^2) — simple, used as the parity reference;
- KV-cache (``greedy_caption_cached`` / ``beam_caption_cached``): image
  cross-attn K/V projected ONCE per decode and self-attn K/V appended per
  layer, one-token forward per step (the reference's cache capability,
  med.py:179-190, 647-666). Greedy runs the whole decode as a single jitted
  ``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import RetrievalModelConfig
from candidate_reranking_cir_tpu.models.layers import Dense, LayerNorm, exact_gelu
from candidate_reranking_cir_tpu.models.med import TextEncoder
from candidate_reranking_cir_tpu.models.vit import VisionTransformer


class BertLMHead(nn.Module):
    """hidden [B, L, D] -> vocab logits [B, L, V] (fp32)."""

    vocab_size: int
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        h = Dense(hidden.shape[-1], self.dtype, name="transform")(hidden)
        h = exact_gelu(h)
        h = LayerNorm(self.layer_norm_eps, self.dtype, name="ln")(h)
        logits = Dense(self.vocab_size, self.dtype, name="decoder")(h)
        return logits.astype(jnp.float32)


class CaptionDecoder(nn.Module):
    """Image-conditioned causal language model (greedy captioning)."""

    cfg: RetrievalModelConfig  # reuses vit/text dims; embed_dim unused
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisionTransformer(self.cfg.vit, self.dtype)
        self.text_decoder = TextEncoder(self.cfg.text, "multimodal",
                                        self.dtype)
        self.lm_head = BertLMHead(self.cfg.text.vocab_size,
                                  self.cfg.text.layer_norm_eps, self.dtype)

    def __call__(self, images, input_ids, attention_mask, *,
                 deterministic: bool = True):
        """Teacher-forced logits [B, L, V] for training/eval."""
        feats = self.visual_encoder(images, deterministic=deterministic)
        return self.logits(feats, input_ids, attention_mask,
                           deterministic=deterministic)

    def logits(self, image_feats, input_ids, attention_mask, *,
               deterministic: bool = True):
        hidden = self.text_decoder(input_ids, attention_mask, image_feats,
                                   causal=True, deterministic=deterministic)
        return self.lm_head(hidden)

    def precompute_kv(self, image_feats):
        """Project every layer's cross-attn K/V of the image tokens once.
        Returns (k_img, v_img) stacked [n_layers, B, M, H, D]."""
        return self.text_decoder(None, None, image_feats,
                                 precompute_image_kv=True)

    def decode_step(self, token_ids, cache_mask, decode_cache, cache_index):
        """One-token cached decode: token_ids [B, 1] at position cache_index,
        cache_mask [B, T] validity of cache slots. Returns
        (vocab logits [B, V], (new_k_self, new_v_self))."""
        hidden, new_self = self.text_decoder(
            token_ids, cache_mask, decode_cache=decode_cache,
            cache_index=cache_index)
        return self.lm_head(hidden[:, 0]), new_self


def _self_cache(decoder: CaptionDecoder, b: int, max_len: int):
    cfg = decoder.cfg.text
    shape = (cfg.num_layers, b, max_len, cfg.num_heads, cfg.head_dim)
    return jnp.zeros(shape, decoder.dtype), jnp.zeros(shape, decoder.dtype)


# jitted decode programs memoized per (decoder, decoding constants): a fresh
# jax.jit per call would recompile the full multi-layer scan every invocation
_DECODE_CACHE: dict = {}


def _prompt_prefix(bos_id: int, prompt_ids: tuple) -> jnp.ndarray:
    """[bos, *prompt] row vector — the decode-conditioning prefix (the
    reference tokenizes 'a picture of ', overwrites token 0 with bos and
    drops the trailing [SEP]: blip.py:119-127)."""
    return jnp.asarray([bos_id, *prompt_ids], jnp.int32)


def _cached_greedy_decode(decoder: CaptionDecoder, b: int, bos_id: int,
                          eos_id: int, pad_id: int, max_len: int,
                          prompt_ids: tuple = ()):
    key = (id(decoder), b, bos_id, eos_id, pad_id, max_len, prompt_ids)
    if key in _DECODE_CACHE:
        return _DECODE_CACHE[key]
    prefix = _prompt_prefix(bos_id, prompt_ids)
    p = len(prompt_ids) + 1
    assert p < max_len, "prompt must be shorter than max_len"

    @jax.jit
    def decode(params, image_feats):
        k_img, v_img = decoder.apply(params, image_feats,
                                     method=CaptionDecoder.precompute_kv)
        k_self, v_self = _self_cache(decoder, b, max_len)
        ids = jnp.full((b, max_len), pad_id, jnp.int32).at[:, :p].set(prefix)
        mask = jnp.zeros((b, max_len), jnp.int32).at[:, :p].set(1)
        finished = jnp.zeros((b,), bool)

        def body(carry, t):
            ids, mask, k_self, v_self, finished = carry
            tok = jax.lax.dynamic_slice_in_dim(ids, t, 1, axis=1)
            logits, (k_self, v_self) = decoder.apply(
                params, tok, mask, (k_self, v_self, k_img, v_img), t,
                method=CaptionDecoder.decode_step)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, pad_id, nxt)
            if p > 1:  # prompt conditioning: positions < p stay forced
                nxt = jnp.where(t + 1 < p, prefix[jnp.minimum(t + 1, p - 1)],
                                nxt)
            ids = jax.lax.dynamic_update_slice_in_dim(
                ids, nxt[:, None], t + 1, axis=1)
            mask = jax.lax.dynamic_update_slice_in_dim(
                mask, (~finished).astype(jnp.int32)[:, None], t + 1, axis=1)
            finished = finished | (nxt == eos_id)
            return (ids, mask, k_self, v_self, finished), None

        carry = (ids, mask, k_self, v_self, finished)
        (ids, *_), _ = jax.lax.scan(body, carry, jnp.arange(max_len - 1))
        return ids

    if len(_DECODE_CACHE) > 32:  # bound the per-process program cache
        _DECODE_CACHE.clear()
    _DECODE_CACHE[key] = decode
    return decode


def apply_repetition_penalty(logits, ids, mask, penalty: float):
    """HF CTRL-style repetition penalty (the processor the reference's
    sampling path applies at blip.py:128-151, repetition_penalty=1.1):
    every token id present in the sequence so far has its logit divided by
    ``penalty`` if positive, multiplied if negative. Ids are penalized once
    each regardless of multiplicity (HF gathers/scatters by token value).

    logits [B, V] fp32; ids [B, T] with validity ``mask`` [B, T]."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    present = jnp.zeros((b, v), bool).at[
        jnp.arange(b)[:, None], ids].max(mask.astype(bool))
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(present, penalized, logits)


def top_p_filter(logits, top_p: float):
    """Nucleus filtering, HF TopPLogitsWarper semantics (transformers 4.25):
    sort descending, drop tokens whose cumulative softmax probability EXCEEDS
    ``top_p`` — except the first token past the threshold, which is kept
    (HF's shift-right), so at least one token always survives.

    Returns (sorted_logits_masked [B, V], sort_idx [B, V]): sampling runs in
    the sorted space and maps back through ``sort_idx``, which keeps the
    kept-set exact even under tied logit values."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum > top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    return jnp.where(remove, -jnp.inf, sorted_logits), sort_idx


def _cached_sample_decode(decoder: CaptionDecoder, b: int, bos_id: int,
                          eos_id: int, pad_id: int, max_len: int,
                          min_len: int, top_p: float, penalty: float,
                          prompt_ids: tuple = ()):
    key = (id(decoder), "sample", b, bos_id, eos_id, pad_id, max_len,
           min_len, top_p, penalty, prompt_ids)
    if key in _DECODE_CACHE:
        return _DECODE_CACHE[key]
    prefix = _prompt_prefix(bos_id, prompt_ids)
    p = len(prompt_ids) + 1
    assert p < max_len, "prompt must be shorter than max_len"

    @jax.jit
    def decode(params, image_feats, rng):
        k_img, v_img = decoder.apply(params, image_feats,
                                     method=CaptionDecoder.precompute_kv)
        k_self, v_self = _self_cache(decoder, b, max_len)
        ids = jnp.full((b, max_len), pad_id, jnp.int32).at[:, :p].set(prefix)
        mask = jnp.zeros((b, max_len), jnp.int32).at[:, :p].set(1)
        finished = jnp.zeros((b,), bool)

        def body(carry, inp):
            ids, mask, k_self, v_self, finished = carry
            t, step_rng = inp
            tok = jax.lax.dynamic_slice_in_dim(ids, t, 1, axis=1)
            logits, (k_self, v_self) = decoder.apply(
                params, tok, mask, (k_self, v_self, k_img, v_img), t,
                method=CaptionDecoder.decode_step)
            logits = apply_repetition_penalty(logits, ids, mask, penalty)
            # HF MinLengthLogitsProcessor: eos banned while the sequence
            # (bos included) is shorter than min_len
            logits = jnp.where((t + 1 < min_len)
                               & (jnp.arange(logits.shape[-1]) == eos_id),
                               -jnp.inf, logits)
            sorted_logits, sort_idx = top_p_filter(logits, top_p)
            pos = jax.random.categorical(step_rng, sorted_logits, axis=-1)
            nxt = jnp.take_along_axis(
                sort_idx, pos[:, None], axis=-1)[:, 0].astype(jnp.int32)
            nxt = jnp.where(finished, pad_id, nxt)
            if p > 1:  # prompt conditioning: positions < p stay forced
                nxt = jnp.where(t + 1 < p, prefix[jnp.minimum(t + 1, p - 1)],
                                nxt)
            ids = jax.lax.dynamic_update_slice_in_dim(
                ids, nxt[:, None], t + 1, axis=1)
            mask = jax.lax.dynamic_update_slice_in_dim(
                mask, (~finished).astype(jnp.int32)[:, None], t + 1, axis=1)
            finished = finished | (nxt == eos_id)
            return (ids, mask, k_self, v_self, finished), None

        steps = jnp.arange(max_len - 1)
        carry = (ids, mask, k_self, v_self, finished)
        (ids, *_), _ = jax.lax.scan(
            body, carry, (steps, jax.random.split(rng, max_len - 1)))
        return ids

    if len(_DECODE_CACHE) > 32:
        _DECODE_CACHE.clear()
    _DECODE_CACHE[key] = decode
    return decode


def sample_caption_cached(decoder: CaptionDecoder, params, image_feats, rng,
                          *, bos_id: int, eos_id: int, pad_id: int,
                          max_len: int = 30, min_len: int = 10,
                          top_p: float = 0.9,
                          repetition_penalty: float = 1.1,
                          prompt_ids: tuple = ()) -> jnp.ndarray:
    """KV-cached nucleus-sampling decode — the reference BLIP_Decoder's
    ``generate(sample=True)`` mode (blip.py:128-151: do_sample with
    top_p=0.9, repetition_penalty=1.1, min_length=10, eos = [SEP]).

    One jitted ``lax.scan`` over steps: each step applies the repetition
    penalty over the tokens emitted so far, bans eos below ``min_len``,
    nucleus-filters in sorted space (HF shift-right semantics) and draws one
    token with ``jax.random.categorical``. Deterministic in ``rng``.

    prompt_ids: optional conditioning prefix, the wordpiece ids of the
    reference's ``prompt`` AFTER its leading token is replaced by bos and
    the trailing [SEP] dropped (blip.py:119-127 tokenizes 'a picture of ').
    The output rows start [bos, *prompt_ids, generated...]; HF's cur_len
    accounting (min_length, repetition penalty over the prompt) is matched.
    Default () decodes from bos alone.
    """
    decode = _cached_sample_decode(decoder, image_feats.shape[0], bos_id,
                                   eos_id, pad_id, max_len, min_len,
                                   top_p, repetition_penalty,
                                   tuple(prompt_ids))
    return decode(params, image_feats, rng)


def greedy_caption_cached(decoder: CaptionDecoder, params, image_feats, *,
                          bos_id: int, eos_id: int, pad_id: int,
                          max_len: int = 20,
                          prompt_ids: tuple = ()) -> jnp.ndarray:
    """KV-cached greedy decode, output-identical to ``greedy_caption``.

    The whole decode is ONE jitted ``lax.scan`` over steps: image cross-attn
    K/V are projected once up front, each step runs a one-token forward and
    appends its self-attn K/V — O(T) attention instead of O(T^2) full-prefix
    recompute, and a single device program for the entire caption (memoized
    across calls).

    prompt_ids: optional conditioning prefix after bos (see
    ``sample_caption_cached``).
    """
    decode = _cached_greedy_decode(decoder, image_feats.shape[0], bos_id,
                                   eos_id, pad_id, max_len,
                                   tuple(prompt_ids))
    return decode(params, image_feats)


def beam_caption_cached(decoder: CaptionDecoder, params, image_feats, *,
                        bos_id: int, eos_id: int, pad_id: int,
                        max_len: int = 20, num_beams: int = 3,
                        length_penalty: float = 1.0,
                        prompt_ids: tuple = ()):
    """KV-cached beam search, output-identical to ``beam_caption``.

    Host loop over steps (beam bookkeeping), one-token jitted forward per
    step; beam reordering gathers the self-attn caches along the beam axis.

    prompt_ids: optional conditioning prefix after bos (see
    ``sample_caption_cached``); prompt steps only fill the K/V caches, the
    beam bookkeeping starts at the first generated position.
    """
    b = image_feats.shape[0]
    nb = num_beams
    prefix = _prompt_prefix(bos_id, tuple(prompt_ids))
    p = int(prefix.shape[0])
    assert p < max_len, "prompt must be shorter than max_len"
    feats = jnp.repeat(image_feats, nb, axis=0)          # [B*nb, M, W]

    key = (id(decoder), "beam_fns")
    if key not in _DECODE_CACHE:
        @jax.jit
        def prep(params, feats):
            return decoder.apply(params, feats,
                                 method=CaptionDecoder.precompute_kv)

        @jax.jit
        def step_logprobs(params, img_kv, tok, mask, k_self, v_self, t):
            logits, new_self = decoder.apply(
                params, tok, mask, (k_self, v_self, *img_kv), t,
                method=CaptionDecoder.decode_step)
            return jax.nn.log_softmax(logits, axis=-1), new_self

        _DECODE_CACHE[key] = (prep, step_logprobs)
    prep, step_logprobs = _DECODE_CACHE[key]

    img_kv = prep(params, feats)
    k_self, v_self = _self_cache(decoder, b * nb, max_len)
    vocab = decoder.cfg.text.vocab_size
    ids = jnp.full((b * nb, max_len), pad_id, jnp.int32).at[:, :p].set(prefix)
    mask = jnp.zeros((b * nb, max_len), jnp.int32).at[:, :p].set(1)
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (nb - 1)), b)
    finished = jnp.zeros((b * nb,), bool)
    lengths = jnp.full((b * nb,), p, jnp.int32)

    for t in range(max_len - 1):
        tok = ids[:, t:t + 1]
        lp, (k_self, v_self) = step_logprobs(params, img_kv, tok, mask,
                                             k_self, v_self, t)
        if t + 1 < p:  # prompt step: only the K/V cache write matters
            continue
        frozen = jnp.full((b * nb, vocab), -1e9).at[:, pad_id].set(0.0)
        lp = jnp.where(finished[:, None], frozen, lp)
        cand = (scores[:, None] + lp).reshape(b, nb * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, nb)
        beam_idx = top_idx // vocab + jnp.arange(b)[:, None] * nb
        token = (top_idx % vocab).reshape(-1).astype(jnp.int32)
        sel = beam_idx.reshape(-1)

        # reorder beam state INCLUDING the per-layer self caches
        k_self = k_self[:, sel]
        v_self = v_self[:, sel]
        ids = ids[sel].at[:, t + 1].set(token)
        was_finished = finished[sel]
        mask = mask[sel].at[:, t + 1].set((~was_finished).astype(jnp.int32))
        lengths = lengths[sel] + (~was_finished).astype(jnp.int32)
        scores = top_scores.reshape(-1)
        finished = was_finished | (token == eos_id)
        if bool(finished.all()):
            break

    norm = scores / jnp.maximum(lengths, 1).astype(
        jnp.float32) ** length_penalty
    best = jnp.argmax(norm.reshape(b, nb), axis=-1) + jnp.arange(b) * nb
    return ids[best]


def beam_caption(decoder: CaptionDecoder, params, image_feats, *,
                 bos_id: int, eos_id: int, pad_id: int, max_len: int = 20,
                 num_beams: int = 3, length_penalty: float = 1.0,
                 prompt_ids: tuple = ()):
    """Beam-search decode [B, max_len] (the reference BLIP_Decoder's default
    generation mode, blip.py:119-135, uses beam search with 3 beams).

    Host loop over steps, one jitted scorer over the flattened [B*beams]
    prefix buffer per step; finished beams are frozen with zero-logprob
    continuation and ranked by length-normalized score at the end.

    prompt_ids: optional conditioning prefix after bos (see
    ``sample_caption_cached``).
    """
    b = image_feats.shape[0]
    nb = num_beams
    prefix = _prompt_prefix(bos_id, tuple(prompt_ids))
    p = int(prefix.shape[0])
    assert p < max_len, "prompt must be shorter than max_len"
    feats = jnp.repeat(image_feats, nb, axis=0)          # [B*nb, M, W]

    @jax.jit
    def step_logprobs(ids, mask, t):
        logits = decoder.apply(params, feats, ids, mask,
                               method=CaptionDecoder.logits)
        return jax.nn.log_softmax(logits[:, t], axis=-1)  # [B*nb, V]

    vocab = decoder.cfg.text.vocab_size
    ids = jnp.full((b * nb, max_len), pad_id, jnp.int32).at[:, :p].set(prefix)
    mask = jnp.zeros((b * nb, max_len), jnp.int32).at[:, :p].set(1)
    # only beam 0 alive initially so identical beams don't multiply
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (nb - 1)), b)
    finished = jnp.zeros((b * nb,), bool)
    lengths = jnp.full((b * nb,), p, jnp.int32)

    for t in range(p - 1, max_len - 1):
        lp = step_logprobs(ids, mask, t)                  # [B*nb, V]
        # frozen beams contribute exactly one continuation (pad, logp 0)
        frozen = jnp.full((b * nb, vocab), -1e9).at[:, pad_id].set(0.0)
        lp = jnp.where(finished[:, None], frozen, lp)
        cand = scores[:, None] + lp                       # [B*nb, V]
        cand = cand.reshape(b, nb * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, nb)     # [B, nb]
        beam_idx = top_idx // vocab + jnp.arange(b)[:, None] * nb
        token = (top_idx % vocab).reshape(-1).astype(jnp.int32)
        sel = beam_idx.reshape(-1)

        ids = ids[sel].at[:, t + 1].set(token)
        was_finished = finished[sel]
        mask = mask[sel].at[:, t + 1].set(
            (~was_finished).astype(jnp.int32))
        lengths = lengths[sel] + (~was_finished).astype(jnp.int32)
        scores = top_scores.reshape(-1)
        finished = was_finished | (token == eos_id)
        if bool(finished.all()):
            break

    norm = scores / jnp.maximum(lengths, 1).astype(
        jnp.float32) ** length_penalty
    best = jnp.argmax(norm.reshape(b, nb), axis=-1) + jnp.arange(b) * nb
    return ids[best]


def greedy_caption(decoder: CaptionDecoder, params, image_feats, *,
                   bos_id: int, eos_id: int, pad_id: int,
                   max_len: int = 20,
                   prompt_ids: tuple = ()) -> jnp.ndarray:
    """Greedy decode [B, max_len] token ids (bos included, pad after eos).

    One jitted step function over a fixed-length buffer; the causal mask makes
    positions > t irrelevant to the logits at t.

    prompt_ids: optional conditioning prefix after bos (see
    ``sample_caption_cached``).
    """
    b = image_feats.shape[0]
    prefix = _prompt_prefix(bos_id, tuple(prompt_ids))
    p = int(prefix.shape[0])
    assert p < max_len, "prompt must be shorter than max_len"

    @jax.jit
    def step(ids, mask, t):
        logits = decoder.apply(params, image_feats, ids, mask,
                               method=CaptionDecoder.logits)
        return jnp.argmax(logits[:, t], axis=-1)

    ids = jnp.full((b, max_len), pad_id, jnp.int32)
    ids = ids.at[:, :p].set(prefix)
    mask = jnp.zeros((b, max_len), jnp.int32).at[:, :p].set(1)
    finished = jnp.zeros((b,), bool)

    for t in range(p - 1, max_len - 1):
        nxt = step(ids, mask, t)
        nxt = jnp.where(finished, pad_id, nxt)
        ids = ids.at[:, t + 1].set(nxt)
        mask = mask.at[:, t + 1].set((~finished).astype(jnp.int32))
        finished = finished | (nxt == eos_id)
    return ids
