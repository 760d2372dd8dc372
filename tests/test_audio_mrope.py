"""Audio encoder (Whisper-tower torch oracle) + multimodal mrope tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.models import audio_encoder as ae
from mnn_tpu.models.config import ModelConfig, PRESETS
from mnn_tpu.models.layers import rope_cos_sin, rope_cos_sin_mrope
from mnn_tpu.models.vision_encoder import build_mrope_positions

torch = pytest.importorskip("torch")


class TestAudioEncoderOracle:
    def test_matches_hf_whisper_encoder(self):
        from transformers import WhisperConfig, WhisperModel
        hf_cfg = WhisperConfig(
            vocab_size=100, d_model=32, encoder_layers=2,
            encoder_attention_heads=2, encoder_ffn_dim=64,
            decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64,
            num_mel_bins=8, max_source_positions=24,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1)
        torch.manual_seed(0)
        model = WhisperModel(hf_cfg).eval()
        params = ae.from_hf_whisper_encoder(model.state_dict())
        cfg = ae.AudioEncoderConfig(n_mels=8, hidden_size=32, num_layers=2,
                                    num_heads=2, ffn_size=64,
                                    max_positions=24)
        mel = np.random.default_rng(0).standard_normal(
            (1, 8, 48), np.float32)  # 48 frames -> 24 features
        with torch.no_grad():
            ref = model.encoder(torch.from_numpy(mel)).last_hidden_state
        out = ae.audio_encoder_forward(params, cfg, jnp.asarray(mel))
        assert out.shape == (1, 24, 32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_sinusoid_table_matches_hf_init(self):
        from transformers import WhisperConfig, WhisperModel
        hf_cfg = WhisperConfig(d_model=16, num_mel_bins=8,
                               max_source_positions=12, encoder_layers=1,
                               decoder_layers=1, encoder_attention_heads=2,
                               decoder_attention_heads=2, encoder_ffn_dim=32,
                               decoder_ffn_dim=32, vocab_size=50,
                               pad_token_id=0, bos_token_id=1,
                               eos_token_id=2, decoder_start_token_id=1)
        model = WhisperModel(hf_cfg)
        ref = model.encoder.embed_positions.weight.detach().numpy()
        ours = np.asarray(ae.sinusoidal_positions(12, 16))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_fbank_to_encoder_pipeline(self):
        """whisper_fbank features feed the encoder end to end."""
        from mnn_tpu.audio.audio import whisper_fbank
        wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
        mel = whisper_fbank(jnp.asarray(wav), n_mels=80)  # [frames, n_mels]
        mel = jnp.asarray(mel).T[None]                    # [1, n_mels, T]
        cfg = ae.AudioEncoderConfig(n_mels=80, hidden_size=64,
                                    num_layers=1, num_heads=2, ffn_size=128,
                                    max_positions=mel.shape[2] // 2 + 1)
        params = ae.init_audio_encoder_params(cfg, jax.random.PRNGKey(0))
        out = ae.audio_encoder_forward(params, cfg, mel)
        assert out.shape[0] == 1 and out.shape[2] == 64
        assert np.isfinite(np.asarray(out)).all()


class TestMrope:
    def test_text_only_equals_plain_rope(self):
        pos = jnp.arange(7, dtype=jnp.int32)[None]       # [1, 7]
        pos3 = jnp.broadcast_to(pos[..., None], (1, 7, 3))
        c1, s1 = rope_cos_sin(pos, 64, 10000.0)
        c3, s3 = rope_cos_sin_mrope(pos3, 64, 10000.0, (8, 12, 12))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s3), atol=1e-6)

    def test_band_selection(self):
        # h component differs -> only the middle section's angles change
        base = jnp.zeros((1, 1, 3), jnp.int32)
        moved = base.at[0, 0, 1].set(5)
        _, s0 = rope_cos_sin_mrope(base, 16, 100.0, (3, 3, 2))
        _, s1 = rope_cos_sin_mrope(moved, 16, 100.0, (3, 3, 2))
        d = np.abs(np.asarray(s1 - s0))[0, 0]
        assert (d[:3] == 0).all() and (d[3:6] > 0).all() and (d[6:] == 0).all()

    def test_build_positions_image_grid(self):
        IMG = 99
        ids = [1, 2, IMG, IMG, IMG, IMG, IMG, IMG, 3]
        pos = build_mrope_positions(ids, image_token_id=IMG, grid_hw=(2, 3))
        assert pos.shape == (1, 9, 3)
        p = pos[0]
        # text prefix: all components equal
        assert (p[0] == 0).all() and (p[1] == 1).all()
        # image: shared temporal, h walks rows, w walks cols
        assert (p[2:8, 0] == 2).all()
        np.testing.assert_array_equal(p[2:8, 1], [2, 2, 2, 3, 3, 3])
        np.testing.assert_array_equal(p[2:8, 2], [2, 3, 4, 2, 3, 4])
        # text resumes after max(grid)
        assert (p[8] == 2 + 3).all()

    def test_decoder_mrope_matches_1d_for_text(self):
        """With an mrope config, running text with explicit all-equal 3D
        positions must reproduce the plain-rope logits exactly."""
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache
        import dataclasses

        cfg = dataclasses.replace(PRESETS["tiny"],
                                  mrope_section=(4, 6, 6))  # head_dim 32
        params = init_random_params(cfg, jax.random.PRNGKey(0), quant_bits=8,
                                    scale=0.05)
        tokens = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)

        def mkcache():
            return kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                  cfg.head_dim, quantized=False)

        cache1, cache2 = mkcache(), mkcache()
        pos3 = jnp.broadcast_to(
            jnp.arange(5, dtype=jnp.int32)[None, :, None], (1, 5, 3))
        l1, _ = forward(params, cfg, tokens, cache1, all_logits=True)
        l2, _ = forward(params, cfg, tokens, cache2, all_logits=True,
                        position_ids=pos3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-5, rtol=1e-5)
