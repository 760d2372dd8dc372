"""Omni multimodal runtime: splice, embeds-prefill parity, end-to-end
text+image+audio generation, and speech-out through the Talker."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime import generate as gen
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.llm import Llm
from mnn_tpu.runtime.omni import Omni, preprocess_image, splice_embeds

CFG = PRESETS["tiny"]  # hidden 128


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)


def _rt():
    return RuntimeConfig(max_batch=1, max_seq_len=128, prefill_chunk=32,
                         decode_block=4, sampler="greedy", kv_quant=False,
                         max_new_tokens=8)


def _fake_vision(pixels):
    """Deterministic 'tower': average pools the image into 4 tokens."""
    x = pixels[0].reshape(3, 4, 56, 4, 56).mean((0, 2, 4))  # [4, 4]
    return jnp.tile(x.reshape(4, 4), (1, 8))                # [4, 32]


class TestSplice:
    def test_single_image_run(self, params):
        IMG = -1
        ids = [1, 2, IMG, IMG, IMG, 3]
        feats = [jnp.ones((3, CFG.hidden_size))]
        emb = splice_embeds(params.embedding, ids, feats, IMG)
        assert emb.shape == (1, 6, CFG.hidden_size)
        np.testing.assert_allclose(np.asarray(emb[0, 2:5], np.float32), 1.0)
        np.testing.assert_allclose(
            np.asarray(emb[0, 0], np.float32),
            np.asarray(params.embedding[1], np.float32), atol=1e-6)

    def test_variable_length_runs(self, params):
        IMG = -1
        ids = [5, IMG, IMG, 6, IMG, 7]
        feats = [jnp.full((2, CFG.hidden_size), 2.0),
                 jnp.full((1, CFG.hidden_size), 3.0)]
        emb = splice_embeds(params.embedding, ids, feats, IMG)
        assert emb.shape == (1, 6, CFG.hidden_size)
        assert float(emb[0, 1, 0]) == 2.0 and float(emb[0, 4, 0]) == 3.0


class TestEmbedsPrefillParity:
    def test_embeds_prefill_matches_token_prefill(self, params):
        """Text-only: prefill from embedding-lookup inputs must equal
        prefill from token ids (same logits, same cache length)."""
        rt = _rt()
        ids = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
        tokens = jnp.asarray([ids], jnp.int32)
        c1 = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                            CFG.head_dim, quantized=False)
        c2 = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                            CFG.head_dim, quantized=False)
        l1, c1 = gen.run_prefill(params, CFG, rt, tokens, c1)
        embeds = params.embedding[tokens]
        l2, c2 = gen.run_prefill_embeds(params, CFG, rt,
                                        embeds.astype(jnp.bfloat16), c2)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l2, np.float32),
                                   atol=1e-2, rtol=1e-2)
        assert int(c1.length[0]) == int(c2.length[0]) == len(ids)


class TestOmniEndToEnd:
    def _omni(self, params, **kw):
        proj = jax.random.normal(jax.random.PRNGKey(7),
                                 (32, CFG.hidden_size)) * 0.05
        return Omni(CFG, params, _rt(), vision_encode=_fake_vision,
                    vision_proj=proj, image_token_id=-1, **kw)

    def test_text_only_matches_llm(self, params):
        omni = self._omni(params)
        llm = Llm(CFG, params, _rt())
        ids = [3, 7, 11, 2]
        want = list(llm.stream(token_ids=ids, max_new_tokens=8))
        got = list(omni.stream_mm(ids, max_new_tokens=8))
        assert got == want

    def test_image_changes_output(self, params):
        img1 = np.zeros((64, 48, 3), np.uint8)
        img2 = np.full((64, 48, 3), 255, np.uint8)
        ids = [1, 2] + [-1] * 4 + [3]
        omni = self._omni(params)
        a = list(omni.stream_mm(ids, images=[img1], max_new_tokens=6))
        omni.reset()
        b = list(omni.stream_mm(ids, images=[img2], max_new_tokens=6))
        assert len(a) == len(b) == 6
        assert a != b

    def test_preprocess_image(self):
        img = np.random.default_rng(0).integers(0, 255, (100, 80, 3),
                                                dtype=np.uint8)
        x = preprocess_image(img, size=224)
        assert x.shape == (1, 3, 224, 224)
        assert float(jnp.abs(x).max()) < 10

    def test_audio_input(self, params):
        from mnn_tpu.models import audio_encoder as ae
        acfg = ae.AudioEncoderConfig(n_mels=80, hidden_size=32, num_layers=1,
                                     num_heads=2, ffn_size=64,
                                     max_positions=64)
        ap = ae.init_audio_encoder_params(acfg, jax.random.PRNGKey(3))
        aproj = jax.random.normal(jax.random.PRNGKey(8),
                                  (32, CFG.hidden_size)) * 0.05
        omni = self._omni(
            params,
            audio_encode=lambda mel: ae.audio_encoder_forward(
                ap, acfg, mel[:, :, :128]),
            audio_proj=aproj, audio_token_id=-2, audio_n_mels=80)
        wav = np.sin(np.linspace(0, 200, 16000)).astype(np.float32)
        n_audio_tokens = 64
        ids = [1] + [-2] * n_audio_tokens + [2]
        out = list(omni.stream_mm(ids, audios=[wav], max_new_tokens=4))
        assert len(out) == 4

    def test_speak_through_talker(self, params):
        from mnn_tpu.audio import vocoder as voc
        from mnn_tpu.models.talker import (Talker, TalkerConfig,
                                           conv_mel_denoiser,
                                           init_conv_mel_denoiser)
        tmodel = dataclasses.replace(PRESETS["tiny"], vocab_size=64)
        tcfg = TalkerConfig(model=tmodel, thinker_hidden=CFG.hidden_size,
                            codec_eos_ids=(63,), n_mels=8, mel_per_codec=2)
        tparams = init_random_params(tmodel, jax.random.PRNGKey(9),
                                     quant_bits=8, scale=0.05)
        in_proj = jax.random.normal(
            jax.random.PRNGKey(10),
            (CFG.hidden_size, tmodel.hidden_size)) * 0.05
        vcfg = voc.VocoderConfig.tiny()
        talker = Talker(
            tcfg, tparams, in_proj,
            mel_denoiser=conv_mel_denoiser(
                init_conv_mel_denoiser(tcfg, 64, jax.random.PRNGKey(11)),
                tcfg),
            vocoder_params=voc.init_vocoder_params(vcfg,
                                                   jax.random.PRNGKey(12)),
            vocoder_cfg=vcfg)
        omni = self._omni(params, talker=talker)
        out, wav = omni.respond_mm([3, 1, 4], max_new_tokens=4, speak=True)
        assert len(out) == 4
        assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
