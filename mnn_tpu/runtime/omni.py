"""Omni: multimodal LLM runtime (vision + audio in, optional speech out).

Equivalent of the reference's `Omni : Llm`
(/root/reference/transformers/llm/engine/src/omni.cpp — per-family visual
preprocess, whisper-fbank audio, embedding splice into the token stream,
mrope ids, and the interleaved Talker). This class composes the framework's
pieces into the same user-facing surface:

* vision tower: `models.vision_encoder` (CLIP) or `models.qwen_vl_vision`
  — any callable pixels -> [n_tokens, D] works;
* audio tower: `audio.whisper_fbank` + `models.audio_encoder`;
* splice: placeholder tokens in the prompt are replaced by projected
  modality embeddings; prefill runs over `inputs_embeds`
  (generate.run_prefill_embeds); decode is the standard engine;
* positions: this runtime uses sequential (LLaVA-style) rope positions
  for both prefill and decode. For qwen2-vl-exact mrope positions, drive
  `models.decoder.forward` directly with `position_ids=[B,T,3]` built by
  `vision_encoder.build_mrope_positions` (prefill) and continue decode at
  max(position)+1 per the HF convention — the decoder supports it; this
  convenience loop does not (yet) thread per-step offsets;
* speech out: `models.talker.Talker` renders the reply when attached.
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.runtime import generate as gen
from mnn_tpu.runtime import sampler
from mnn_tpu.runtime.llm import Llm, PerfContext

# CLIP normalization (the reference's per-family image preprocess baked
# into ImageProcess configs, omni.cpp:150-183)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image: np.ndarray, size: int = 224,
                     mean=_CLIP_MEAN, std=_CLIP_STD) -> jax.Array:
    """HWC uint8/float image -> [1, 3, size, size] normalized float."""
    x = jnp.asarray(image, jnp.float32)
    if x.max() > 2.0:
        x = x / 255.0
    x = jax.image.resize(x, (size, size, x.shape[2]), method="bilinear")
    x = (x - mean) / std
    return x.transpose(2, 0, 1)[None]


def splice_embeds(embedding: jax.Array, token_ids: Sequence[int],
                  features: List[jax.Array], placeholder_id: int
                  ) -> jax.Array:
    """Replace each run of `placeholder_id` (one run per features entry,
    in order) with that entry's embeddings -> [1, T', H]. Generalizes
    vision_encoder.embed_multimodal to many images/audios."""
    return _splice_embeds_mixed(embedding, token_ids, features,
                                placeholder_id, [], placeholder_id - 10**9)


class Omni(Llm):
    """Multimodal wrapper: text + images + audio in, text (and optionally
    speech via an attached Talker) out."""

    def __init__(self, config, params, rt=None, tokenizer=None, *,
                 vision_encode=None,     # pixels [1,3,H,W] -> [n, D_v]
                 vision_proj: Optional[jax.Array] = None,  # [D_v, hidden]
                 image_token_id: int = -1,
                 audio_encode=None,      # mel [1,M,T] -> [1, n, D_a]
                 audio_proj: Optional[jax.Array] = None,   # [D_a, hidden]
                 audio_token_id: int = -2,
                 audio_n_mels: int = 128,
                 talker=None):
        super().__init__(config, params, rt, tokenizer=tokenizer)
        self.vision_encode = vision_encode
        self.vision_proj = vision_proj
        self.image_token_id = image_token_id
        self.audio_encode = audio_encode
        self.audio_proj = audio_proj
        self.audio_token_id = audio_token_id
        self.audio_n_mels = audio_n_mels
        self.talker = talker

    # -- modality embedding --------------------------------------------------
    def embed_image(self, image: np.ndarray) -> jax.Array:
        """Raw HWC image -> projected features [n_tokens, hidden]."""
        pixels = preprocess_image(image)
        feats = self.vision_encode(pixels)
        if feats.ndim == 3:
            feats = feats[0]
        if self.vision_proj is not None:
            feats = jnp.dot(feats.astype(jnp.float32), self.vision_proj)
        return feats

    def embed_audio(self, wav: np.ndarray, sample_rate: int = 16000
                    ) -> jax.Array:
        from mnn_tpu.audio.audio import whisper_fbank
        mel = whisper_fbank(jnp.asarray(wav, jnp.float32),
                            sample_rate=sample_rate,
                            n_mels=self.audio_n_mels)
        feats = self.audio_encode(mel.T[None])
        if feats.ndim == 3:
            feats = feats[0]
        if self.audio_proj is not None:
            feats = jnp.dot(feats.astype(jnp.float32), self.audio_proj)
        return feats

    # -- generation ------------------------------------------------------------
    def stream_mm(self, token_ids: Sequence[int], *,
                  images: Sequence[np.ndarray] = (),
                  audios: Sequence[np.ndarray] = (),
                  max_new_tokens: Optional[int] = None) -> Iterator[int]:
        """Generate from a token sequence containing placeholder runs
        (`image_token_id` / `audio_token_id`, one run per input, run length
        = that input's token count after encoding)."""
        rt = self.rt
        max_new = max_new_tokens or rt.max_new_tokens
        eos = getattr(self.tokenizer, "eos_ids", set())

        emb_table = self.params.embedding
        img_feats = [self.embed_image(im) for im in images]
        aud_feats = [self.embed_audio(a) for a in audios]
        if img_feats or aud_feats:
            embeds = _splice_embeds_mixed(
                emb_table, token_ids, img_feats, self.image_token_id,
                aud_feats, self.audio_token_id)
        else:
            embeds = emb_table[jnp.asarray(list(token_ids), jnp.int32)][None]

        self.perf = PerfContext(prompt_len=embeds.shape[1])
        t0 = time.perf_counter()
        logits, cache = gen.run_prefill_embeds(
            self.params, self.config, rt, embeds.astype(jnp.bfloat16),
            self.cache)
        jax.block_until_ready(logits)
        self.perf.prefill_s = time.perf_counter() - t0

        state = sampler.make_state(rt.max_batch)
        produced = 0
        t0 = time.perf_counter()
        while produced < max_new:
            steps = min(rt.decode_block, max_new - produced)
            toks, logits, cache, state, self._key = gen.decode_steps(
                self.params, self.config, cache, logits, state, self._key,
                steps=steps, sampler=rt.sampler, temperature=rt.temperature,
                top_k=rt.top_k, top_p=rt.top_p, min_p=rt.min_p,
                penalty=rt.penalty)
            stop = False
            consumed = 0
            for t in np.asarray(toks[0]).tolist():
                consumed += 1
                self.perf.gen_len += 1
                produced += 1
                yield t
                if t in eos:
                    stop = True
                    break
            if stop:
                # roll back the block's unconsumed tail (multi-turn hygiene)
                from mnn_tpu.runtime import kvcache
                if consumed < steps:
                    cache = kvcache.rollback(cache, steps - consumed)
                break
        self.perf.decode_s = time.perf_counter() - t0
        self.cache = cache

    def respond_mm(self, token_ids, *, images=(), audios=(),
                   max_new_tokens=None, speak: bool = False):
        """Blocking helper; with speak=True also renders audio via the
        attached Talker (≈ the reference's interleaved thinker/talker loop,
        omni.cpp:1525-1593, run sequentially here)."""
        out = list(self.stream_mm(token_ids, images=images, audios=audios,
                                  max_new_tokens=max_new_tokens))
        if not speak:
            return out
        if self.talker is None:
            raise ValueError("no talker attached")
        # condition the talker on the reply's embeddings (the reference
        # feeds thinker embeds + hidden states; embeds are what we retain
        # after streaming)
        hidden = self.params.embedding[
            jnp.asarray(out, jnp.int32)].astype(jnp.float32)
        if hidden.shape[-1] != self.talker.cfg.thinker_hidden:
            raise ValueError("talker thinker_hidden != model hidden")
        codec = self.talker.generate_codec(hidden, thinker_tokens=out)
        wav = self.talker.token2wav(codec or [0])
        return out, wav


def _splice_embeds_mixed(embedding, token_ids, img_feats, img_id,
                         aud_feats, aud_id):
    """Splice both modalities in one pass (runs must not interleave
    within each other)."""
    ids = list(token_ids)
    parts = []
    it_img = iter(img_feats)
    it_aud = iter(aud_feats)
    i = 0
    while i < len(ids):
        tid = ids[i]
        if tid in (img_id, aud_id):
            j = i
            while j < len(ids) and ids[j] == tid:
                j += 1
            feats = next(it_img) if tid == img_id else next(it_aud)
            parts.append(feats.astype(embedding.dtype))
            i = j
        else:
            j = i
            while j < len(ids) and ids[j] not in (img_id, aud_id):
                j += 1
            parts.append(embedding[jnp.asarray(ids[i:j], jnp.int32)])
            i = j
    return jnp.concatenate(parts, axis=0)[None]
