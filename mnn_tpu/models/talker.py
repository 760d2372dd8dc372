"""Talker: speech-token head + token2wav (TTS output path of Omni).

Equivalent of the reference's Talker
(/root/reference/transformers/llm/engine/src/omni.cpp:1525-1970 — an AR
codec-token decoder running interleaved with the thinker, a DiT that
flow-matches codec tokens to mel chunks (`Talker::ditForward`), and a
BigVGAN `token2wav` render). Here:

* the talker decoder IS our standard decoder stack (`models/decoder`) on
  a codec vocabulary, conditioned by summing a projection of the
  thinker's hidden states into its token embeddings (prefill) — one
  compiled graph, no bespoke module;
* codec -> mel uses the flow-matching Euler sampler
  (`diffusion.scheduler.FlowMatchEulerScheduler`) over a pluggable
  velocity model (a conv/DiT denoiser; a reference conv denoiser is
  provided for tests and random-weight smoke runs);
* mel -> wav is `audio.vocoder` (BigVGAN-style generator).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.audio.vocoder import VocoderConfig, vocoder_forward
from mnn_tpu.diffusion.scheduler import FlowMatchEulerScheduler
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward as decoder_forward
from mnn_tpu.runtime import kvcache


@dataclasses.dataclass(frozen=True)
class TalkerConfig:
    model: ModelConfig                       # codec-vocab decoder stack
    thinker_hidden: int = 896                # thinker hidden size
    codec_eos_ids: Sequence[int] = (8292, 8294)  # reference stop ids
    max_new_tokens: int = 2048
    n_mels: int = 80
    mel_per_codec: int = 2                   # reference: max_duration = 2x


class Talker:
    """AR codec-token generation conditioned on thinker hidden states."""

    def __init__(self, cfg: TalkerConfig, params, in_proj: jax.Array,
                 *, mel_denoiser: Optional[Callable] = None,
                 vocoder_params=None, vocoder_cfg: Optional[VocoderConfig] = None):
        self.cfg = cfg
        self.params = params                 # decoder Params (codec vocab)
        self.in_proj = in_proj               # [thinker_hidden, talker_hidden]
        self.mel_denoiser = mel_denoiser     # (mel_t, t, codec_emb) -> velocity
        self.vocoder_params = vocoder_params
        self.vocoder_cfg = vocoder_cfg
        self._decode = jax.jit(self._decode_step)

    # -- codec token generation ---------------------------------------------
    def _decode_step(self, params, tok, cache):
        logits, cache = decoder_forward(params, self.cfg.model, tok, cache)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def generate_codec(self, thinker_hidden: jax.Array,
                       thinker_tokens: Optional[Sequence[int]] = None,
                       max_new: Optional[int] = None,
                       capacity: int = 2048) -> List[int]:
        """thinker_hidden [T, thinker_hidden] -> codec token ids.

        Prefill embeds = proj(thinker_hidden) (+ talker embedding of the
        thinker's tokens when provided — the reference feeds both the
        thinker's embeddings and hidden states, omni.cpp Talker setup).
        """
        m = self.cfg.model
        t = thinker_hidden.shape[0]
        embeds = jnp.dot(thinker_hidden.astype(jnp.float32),
                         self.in_proj.astype(jnp.float32))
        if thinker_tokens is not None:
            tok_ids = np.asarray(thinker_tokens, np.int32) % m.vocab_size
            embeds = embeds + self.params.embedding[tok_ids].astype(
                jnp.float32)
        cache = kvcache.create(m.num_layers, 1, m.num_kv_heads, capacity,
                               m.head_dim, quantized=False)
        logits, cache = decoder_forward(
            self.params, m, jnp.zeros((1, t), jnp.int32), cache,
            inputs_embeds=embeds[None].astype(jnp.bfloat16))
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        out: List[int] = []
        stop = set(int(i) for i in self.cfg.codec_eos_ids)
        limit = max_new or self.cfg.max_new_tokens
        for _ in range(min(limit, capacity - t - 1)):
            tid = int(tok[0])
            if tid in stop:
                break
            out.append(tid)
            tok, cache = self._decode(self.params, tok[:, None], cache)
        return out

    # -- codec -> mel (flow matching) ----------------------------------------
    def codec_to_mel(self, codec_tokens: Sequence[int], *, num_steps: int = 10,
                     seed: int = 0) -> jax.Array:
        """Integrate the velocity field from noise to a mel chunk
        [1, n_mels, T_mel] (= mel_per_codec * len(codec))."""
        if self.mel_denoiser is None:
            raise ValueError("no mel denoiser configured")
        t_mel = self.cfg.mel_per_codec * len(codec_tokens)
        sch = FlowMatchEulerScheduler()
        sch.set_timesteps(num_steps)
        x = jax.random.normal(jax.random.PRNGKey(seed),
                              (1, self.cfg.n_mels, t_mel))
        codec = jnp.asarray(list(codec_tokens), jnp.int32)[None]
        for i, t in enumerate(sch.timesteps):
            v = self.mel_denoiser(x, jnp.float32(sch.sigmas[i]), codec)
            x = sch.step_index(v, i, x)
        return x

    # -- mel -> waveform ------------------------------------------------------
    def token2wav(self, codec_tokens: Sequence[int], *, num_steps: int = 10,
                  seed: int = 0) -> np.ndarray:
        """Full render: codec tokens -> mel (flow ODE) -> waveform
        (≈ Talker::token2wav, omni.cpp:1913)."""
        mel = self.codec_to_mel(codec_tokens, num_steps=num_steps, seed=seed)
        if self.vocoder_params is None:
            raise ValueError("no vocoder configured")
        wav = vocoder_forward(self.vocoder_params, self.vocoder_cfg,
                              mel.astype(jnp.float32))
        return np.asarray(wav[0])


def conv_mel_denoiser(params: dict, cfg: TalkerConfig):
    """Small conv velocity model for tests/smoke: embeds codec tokens,
    upsamples to mel rate, and mixes with (x_t, t). Stands in for the
    exported DiT; the Talker accepts any (x, t, codec) -> velocity fn."""

    def fn(x, t, codec):
        emb = params["codec_embed"][codec]            # [1, Tc, C]
        emb = jnp.repeat(emb, cfg.mel_per_codec, axis=1)  # mel rate
        h = jnp.concatenate(
            [x, emb.transpose(0, 2, 1),
             jnp.broadcast_to(t, x[:, :1].shape)], axis=1)
        h = jnp.einsum("bct,cd->bdt", h, params["w1"])
        h = jax.nn.silu(h)
        return jnp.einsum("bct,cd->bdt", h, params["w2"])

    return fn


def init_conv_mel_denoiser(cfg: TalkerConfig, codec_vocab: int, key,
                           width: int = 64):
    k1, k2, k3 = jax.random.split(key, 3)
    cin = cfg.n_mels + 32 + 1
    return {
        "codec_embed": jax.random.normal(k1, (codec_vocab, 32)) * 0.1,
        "w1": jax.random.normal(k2, (cin, width)) * 0.1,
        "w2": jax.random.normal(k3, (width, cfg.n_mels)) * 0.1,
    }
