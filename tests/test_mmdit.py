"""MMDiT (SD3-class) denoiser: structure, conditioning wiring, flow-match
sampling loop integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.diffusion import mmdit as M
from mnn_tpu.diffusion.scheduler import FlowMatchEulerScheduler


@pytest.fixture(scope="module")
def setup():
    cfg = M.MMDiTConfig.tiny()
    params = M.init_mmdit_params(cfg, jax.random.PRNGKey(0))
    M.validate_params(cfg, params)
    return cfg, params


class TestMMDiT:
    def test_forward_shapes_jit(self, setup):
        cfg, params = setup
        lat = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
        pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 24))
        fwd = jax.jit(lambda p, l, t, c, pl: M.mmdit_forward(p, cfg, l, t,
                                                             c, pl))
        out = fwd(params, lat, jnp.float32(500), ctx, pooled)
        assert out.shape == (2, 4, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_conditioning_reaches_output(self, setup):
        cfg, params = setup
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
        pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 24))
        base = M.mmdit_forward(params, cfg, lat, 100, ctx, pooled)
        # timestep
        a = M.mmdit_forward(params, cfg, lat, 900, ctx, pooled)
        assert not np.allclose(np.asarray(base), np.asarray(a))
        # text context (joint attention path)
        b = M.mmdit_forward(params, cfg, lat, 100, ctx + 1.0, pooled)
        assert not np.allclose(np.asarray(base), np.asarray(b))
        # pooled conditioning (adaLN path)
        c = M.mmdit_forward(params, cfg, lat, 100, ctx, pooled + 1.0)
        assert not np.allclose(np.asarray(base), np.asarray(c))

    def test_sd3_medium_param_inventory(self):
        """Full SD3-medium-shaped config enumerates a plausible key set."""
        cfg = M.MMDiTConfig(in_channels=16, hidden_size=1536, depth=24,
                            num_heads=24, context_dim=4096, pooled_dim=2048,
                            pos_embed_max=96, qk_norm=True)
        shapes = M.param_shapes(cfg)
        assert shapes["context_embedder.weight"] == (4096, 1536)
        assert shapes["transformer_blocks.0.norm1.linear.weight"] == (
            1536, 9216)
        # last block is context_pre_only: 2-chunk modulation, no ctx mlp
        assert shapes["transformer_blocks.23.norm1_context.linear.weight"] \
            == (1536, 3072)
        assert "transformer_blocks.23.ff_context.net.2.weight" not in shapes
        assert "transformer_blocks.22.ff_context.net.2.weight" in shapes
        assert shapes["proj_out.weight"] == (1536, 64)

    def test_flow_match_sampling_loop(self, setup):
        cfg, params = setup
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
        pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 24))
        sch = FlowMatchEulerScheduler()
        sch.set_timesteps(4)
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8))

        @jax.jit
        def step(x, t, i_sig):
            lat2 = jnp.concatenate([x, x], 0)
            v = M.mmdit_forward(params, cfg, lat2, t, ctx, pooled)
            vu, vc = jnp.split(v, 2, 0)
            return vu + 3.0 * (vc - vu)

        for i, t in enumerate(sch.timesteps):
            v = step(x, jnp.float32(t), i)
            x = sch.step_index(v, i, x)
        assert np.isfinite(np.asarray(x)).all()

    def test_from_diffusers_layouts(self, setup):
        cfg, _ = setup
        d = cfg.hidden_size
        sd = {
            "pos_embed.proj.weight": np.zeros(
                (d, cfg.in_channels, 2, 2), np.float32),
            "context_embedder.weight": np.zeros((d, cfg.context_dim),
                                                np.float32),
            "transformer_blocks.0.attn.norm_q.weight": np.ones(
                d // cfg.num_heads, np.float32),
        }
        out = M.from_diffusers_sd3(sd)
        assert out["pos_embed.proj.weight"].shape == (
            cfg.in_channels * 4, d)
        assert out["context_embedder.weight"].shape == (cfg.context_dim, d)
