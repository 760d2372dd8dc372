"""Diffusion model zoo tests: CLIP text encoder (torch oracle), UNet, VAE,
and the end-to-end StableDiffusion denoise loop.

Mirrors the reference's converter round-trip strategy (tools/script/
testMNNFromOnnx.py: run the source framework and the engine side by side
on random inputs and diff): the CLIP text encoder is checked against
transformers' torch CLIPTextModel with shared random weights; conv /
group-norm primitives are checked against torch.nn.functional.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.diffusion import clip_text as ct
from mnn_tpu.diffusion import nn as dnn
from mnn_tpu.diffusion import unet as unet_lib
from mnn_tpu.diffusion import vae as vae_lib
from mnn_tpu.diffusion.sd import StableDiffusion

torch = pytest.importorskip("torch")


class TestPrimitivesVsTorch:
    def test_conv2d_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, 6), np.float32)   # NHWC
        w = rng.standard_normal((4, 6, 3, 3), np.float32)   # torch OIHW
        b = rng.standard_normal(4).astype(np.float32)
        ours = dnn.conv2d(jnp.asarray(x), dnn.t_conv(w), jnp.asarray(b))
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
            torch.from_numpy(b), padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_conv2d_stride2_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 8, 8, 3), np.float32)
        w = rng.standard_normal((5, 3, 3, 3), np.float32)
        ours = dnn.conv2d(jnp.asarray(x), dnn.t_conv(w), stride=2)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
            stride=2, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_group_norm_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 4, 4, 8), np.float32)
        w = rng.standard_normal(8).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        ours = dnn.group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              groups=4)
        ref = torch.nn.functional.group_norm(
            torch.from_numpy(x).permute(0, 3, 1, 2), 4, torch.from_numpy(w),
            torch.from_numpy(b)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_upsample_matches_torch(self):
        x = np.random.default_rng(3).standard_normal((1, 3, 4, 2), np.float32)
        ours = dnn.upsample_nearest_2x(jnp.asarray(x))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
            mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(np.asarray(ours), ref)


class TestClipTextOracle:
    def test_matches_transformers(self):
        from transformers import CLIPTextConfig, CLIPTextModel
        hf_cfg = CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, eos_token_id=2, bos_token_id=1,
        )
        torch.manual_seed(0)
        model = CLIPTextModel(hf_cfg).eval()
        params = ct.from_hf_clip_text(model.state_dict())
        cfg = ct.ClipTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, max_position_embeddings=16, eos_token_id=2)

        ids = np.array([[1, 5, 9, 42, 7, 2, 2, 2],
                        [1, 88, 3, 2, 2, 2, 2, 2]], np.int64)
        with torch.no_grad():
            out = model(torch.from_numpy(ids))
        hidden, pooled = ct.clip_text_forward(
            params, cfg, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.last_hidden_state.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestUNet:
    def test_forward_shapes_and_jit(self):
        cfg = unet_lib.UNetConfig.tiny()
        params = unet_lib.init_unet_params(cfg, jax.random.PRNGKey(0))
        unet_lib.validate_params(cfg, params)
        latent = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32))
        fwd = jax.jit(lambda p, l, t, c: unet_lib.unet_forward(p, cfg, l, t, c))
        out = fwd(params, latent, jnp.int32(10), ctx)
        assert out.shape == (2, 4, 8, 8)
        assert np.isfinite(np.asarray(out)).all()
        # timestep conditioning actually reaches the output
        out2 = fwd(params, latent, jnp.int32(900), ctx)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
        # text conditioning reaches the output (cross-attn wired)
        out3 = fwd(params, latent, jnp.int32(10), ctx + 1.0)
        assert not np.allclose(np.asarray(out), np.asarray(out3))

    def test_sd15_param_inventory_matches_diffusers(self):
        """Full SD1.5 config enumerates the exact diffusers key set."""
        cfg = unet_lib.UNetConfig()
        shapes = unet_lib.param_shapes(cfg)
        # spot-check known SD1.5 shapes (diffusers layout, ours transposed)
        assert shapes["conv_in.weight"] == (3, 3, 4, 320)
        assert shapes["down_blocks.0.attentions.0.transformer_blocks.0."
                      "attn2.to_k.weight"] == (768, 320)
        assert shapes["up_blocks.0.resnets.0.norm1.weight"] == (2560,)
        assert shapes["mid_block.resnets.1.time_emb_proj.weight"] == (1280, 1280)
        assert shapes["conv_out.weight"] == (3, 3, 320, 4)
        # SD1.5 UNet has 686 tensors
        assert len(shapes) == 686

    def test_timestep_embedding_convention(self):
        # flip_sin_to_cos=True: t=0 -> all-cos half = 1, sin half = 0
        emb = dnn.timestep_embedding(jnp.asarray([0]), 8)
        np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
        np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = vae_lib.VAEConfig.tiny()
        params = vae_lib.init_vae_params(cfg, jax.random.PRNGKey(0))
        vae_lib.validate_params(cfg, params)
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
        lat = jax.jit(lambda p, x: vae_lib.vae_encode(p, cfg, x))(params, img)
        assert lat.shape == (1, 4, 8, 8)  # one stride-2 stage in tiny
        out = jax.jit(lambda p, x: vae_lib.vae_decode(p, cfg, x))(params, lat)
        assert out.shape == (1, 3, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_sd_vae_param_inventory(self):
        shapes = vae_lib.param_shapes(vae_lib.VAEConfig())
        assert shapes["decoder.conv_in.weight"] == (3, 3, 4, 512)
        assert shapes["encoder.conv_out.weight"] == (3, 3, 512, 8)
        assert shapes["decoder.mid_block.attentions.0.to_q.weight"] == (512, 512)
        # SD1.5 AutoencoderKL has 248 tensors
        assert len(shapes) == 248

    def test_legacy_attention_key_mapping(self):
        sd = {"decoder.mid_block.attentions.0.query.weight":
              np.zeros((8, 8), np.float32),
              "decoder.mid_block.attentions.0.proj_attn.weight":
              np.zeros((8, 8, 1, 1), np.float32)}
        out = vae_lib.from_diffusers(sd)
        assert "decoder.mid_block.attentions.0.to_q.weight" in out
        assert out["decoder.mid_block.attentions.0.to_out.0.weight"].shape == (8, 8)


class TestStableDiffusionEndToEnd:
    def _tiny_sd(self, scheduler="ddim"):
        ucfg = unet_lib.UNetConfig.tiny()
        vcfg = vae_lib.VAEConfig.tiny()
        tcfg = ct.ClipTextConfig(vocab_size=64, hidden_size=32,
                                 intermediate_size=64, num_layers=1,
                                 num_heads=2, max_position_embeddings=8,
                                 eos_token_id=2)
        # text hidden size must match unet cross_attention_dim (32) — it does
        return StableDiffusion(
            unet_params=unet_lib.init_unet_params(ucfg, jax.random.PRNGKey(0)),
            unet_cfg=ucfg,
            text_params=ct.init_clip_text_params(tcfg, jax.random.PRNGKey(1)),
            text_cfg=tcfg,
            vae_params=vae_lib.init_vae_params(vcfg, jax.random.PRNGKey(2)),
            vae_cfg=vcfg,
            scheduler=scheduler, dtype=jnp.float32)

    @pytest.mark.parametrize("scheduler", ["ddim", "ddpm", "euler"])
    def test_txt2img_runs(self, scheduler):
        sd = self._tiny_sd(scheduler)
        steps = []
        img = sd.txt2img("a cat", num_steps=3, seed=0, height=16, width=16,
                         callback=lambda i, lat: steps.append(i))
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        assert steps == [0, 1, 2]

    def test_deterministic_given_seed(self):
        sd = self._tiny_sd()
        a = sd.txt2img("x", num_steps=2, seed=7, height=16, width=16,
                       output="latent")
        b = sd.txt2img("x", num_steps=2, seed=7, height=16, width=16,
                       output="latent")
        np.testing.assert_array_equal(a, b)

    def test_guidance_changes_output(self):
        sd = self._tiny_sd()
        a = sd.txt2img("x", num_steps=2, seed=0, guidance_scale=1.0,
                       height=16, width=16, output="latent")
        # different conditioning must change the result through CFG
        sd2 = self._tiny_sd()
        b = sd2.txt2img("x", num_steps=2, seed=0, guidance_scale=9.0,
                        height=16, width=16, output="latent")
        assert not np.allclose(a, b)
