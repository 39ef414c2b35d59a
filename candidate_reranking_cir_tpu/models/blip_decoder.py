"""BLIP caption decoder — the reference's BLIP_Decoder / BertLMHeadModel
capability (blip.py:78-169, med.py:825-969). Unused by the CIR pipelines but
part of the BLIP family the reference code carries; provided so the framework
covers the full surface.

Components:
- ``BertLMHead``: transform dense -> GELU -> LayerNorm -> vocab projection
  (+ bias), matching the reference's BertLMPredictionHead parameterization
  (cls.predictions.* checkpoint keys, converted in runtime/convert.py).
- ``CaptionDecoder``: ViT image encoder + causal MED decoder + LM head with
  fixed-length greedy decoding. Decoding recomputes the full (short) prefix
  per step — at caption lengths (<=40 tokens) this keeps one compiled
  program and avoids KV-cache plumbing; a cache is a later optimization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from candidate_reranking_cir_tpu.config import RetrievalModelConfig
from candidate_reranking_cir_tpu.models.layers import Dense, LayerNorm
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
        h = nn.gelu(h, approximate=False)
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


def beam_caption(decoder: CaptionDecoder, params, image_feats, *,
                 bos_id: int, eos_id: int, pad_id: int, max_len: int = 20,
                 num_beams: int = 3, length_penalty: float = 1.0):
    """Beam-search decode [B, max_len] (the reference BLIP_Decoder's default
    generation mode, blip.py:119-135, uses beam search with 3 beams).

    Host loop over steps, one jitted scorer over the flattened [B*beams]
    prefix buffer per step; finished beams are frozen with zero-logprob
    continuation and ranked by length-normalized score at the end.
    """
    b = image_feats.shape[0]
    nb = num_beams
    feats = jnp.repeat(image_feats, nb, axis=0)          # [B*nb, M, W]

    @jax.jit
    def step_logprobs(ids, mask, t):
        logits = decoder.apply(params, feats, ids, mask,
                               method=CaptionDecoder.logits)
        return jax.nn.log_softmax(logits[:, t], axis=-1)  # [B*nb, V]

    vocab = decoder.cfg.text.vocab_size
    ids = jnp.full((b * nb, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    mask = jnp.zeros((b * nb, max_len), jnp.int32).at[:, 0].set(1)
    # only beam 0 alive initially so identical beams don't multiply
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (nb - 1)), b)
    finished = jnp.zeros((b * nb,), bool)
    lengths = jnp.ones((b * nb,), jnp.int32)

    for t in range(max_len - 1):
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
                   max_len: int = 20) -> jnp.ndarray:
    """Greedy decode [B, max_len] token ids (bos included, pad after eos).

    One jitted step function over a fixed-length buffer; the causal mask makes
    positions > t irrelevant to the logits at t.
    """
    b = image_feats.shape[0]

    @jax.jit
    def step(ids, mask, t):
        logits = decoder.apply(params, image_feats, ids, mask,
                               method=CaptionDecoder.logits)
        return jnp.argmax(logits[:, t], axis=-1)

    ids = jnp.full((b, max_len), pad_id, jnp.int32)
    ids = ids.at[:, 0].set(bos_id)
    mask = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(1)
    finished = jnp.zeros((b,), bool)

    for t in range(max_len - 1):
        nxt = step(ids, mask, t)
        nxt = jnp.where(finished, pad_id, nxt)
        ids = ids.at[:, t + 1].set(nxt)
        mask = mask.at[:, t + 1].set((~finished).astype(jnp.int32))
        finished = finished | (nxt == eos_id)
    return ids
