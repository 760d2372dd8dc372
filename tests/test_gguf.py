"""GGUF importer tests: binary reader, ggml dequantizers (layout checked
by encode->decode reconstruction), and end-to-end llama GGUF -> converted
checkpoint logits parity vs HF torch."""

import struct

import numpy as np
import pytest
import jax.numpy as jnp

from mnn_tpu.convert import gguf as G


# ---------------------------------------------------------------------------
# minimal spec-following GGUF writer (test-side)

def _kv_str(key, s):
    b = key.encode()
    out = struct.pack("<Q", len(b)) + b + struct.pack("<I", 8)
    sb = s.encode()
    return out + struct.pack("<Q", len(sb)) + sb


def _kv_scalar(key, vtype, fmt, val):
    b = key.encode()
    return (struct.pack("<Q", len(b)) + b + struct.pack("<I", vtype)
            + struct.pack("<" + fmt, val))


def _kv_arr_str(key, items):
    b = key.encode()
    out = struct.pack("<Q", len(b)) + b + struct.pack("<I", 9)
    out += struct.pack("<I", 8) + struct.pack("<Q", len(items))
    for s in items:
        sb = s.encode()
        out += struct.pack("<Q", len(sb)) + sb
    return out


def write_gguf(path, kvs: bytes, n_kv: int, tensors):
    """tensors: list of (name, np_array_f32 [rows, cols] or 1d, ttype,
    raw_bytes)."""
    header = struct.pack("<IIQQ", G.GGUF_MAGIC, 3, len(tensors), n_kv)
    infos = b""
    data = b""
    align = 32
    for name, shape, ttype, raw in tensors:
        nb = name.encode()
        off = len(data)
        # dims innermost-first (ggml convention): reverse numpy shape
        dims = tuple(reversed(shape))
        infos += struct.pack("<Q", len(nb)) + nb
        infos += struct.pack("<I", len(dims))
        for d in dims:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<IQ", ttype, off)
        data += raw.tobytes() if hasattr(raw, "tobytes") else raw
        pad = (-len(data)) % align
        data += b"\0" * pad
    head = header + kvs + infos
    pad = (-len(head)) % align
    with open(path, "wb") as f:
        f.write(head + b"\0" * pad + data)


# test-side encoders (independent quantization direction; decode must
# reconstruct within grid error, which fails loudly on any layout mistake)

def _enc_q4_0(w):
    w = w.reshape(-1, 32)
    out = b""
    for row in w:
        d = np.max(np.abs(row)) / 7 or 1.0
        q = np.clip(np.round(row / d) + 8, 0, 15).astype(np.uint8)
        nib = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += np.float16(d).tobytes() + nib.tobytes()
    return out


def _enc_q8_0(w):
    w = w.reshape(-1, 32)
    out = b""
    for row in w:
        d = np.max(np.abs(row)) / 127 or 1.0
        q = np.clip(np.round(row / d), -128, 127).astype(np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


def _enc_q6_k(w):
    w = w.reshape(-1, 256)
    out = b""
    for row in w:
        sub = row.reshape(16, 16)
        absmax = np.abs(sub).max(1)
        d = absmax.max() / (127 * 31) or 1.0
        sc = np.clip(np.round(absmax / (31 * d)), -128, 127).astype(np.int8)
        eff = d * sc.astype(np.float32)
        eff[eff == 0] = 1.0
        q = np.clip(np.round(sub / eff[:, None]) + 32, 0, 63
                    ).astype(np.uint8).reshape(256)
        ql = np.zeros(128, np.uint8)
        qh = np.zeros(64, np.uint8)
        for half in range(2):
            seg = q[128 * half: 128 * (half + 1)]
            a, b, c_, dd = seg[:32], seg[32:64], seg[64:96], seg[96:128]
            ql[64 * half: 64 * half + 32] = (a & 0x0F) | ((c_ & 0x0F) << 4)
            ql[64 * half + 32: 64 * half + 64] = (b & 0x0F) | ((dd & 0x0F) << 4)
            qh[32 * half: 32 * (half + 1)] = ((a >> 4) | ((b >> 4) << 2)
                                              | ((c_ >> 4) << 4)
                                              | ((dd >> 4) << 6))
        out += (ql.tobytes() + qh.tobytes() + sc.tobytes()
                + np.float16(d).tobytes())
    return out


def _enc_q4_k(w):
    w = w.reshape(-1, 256)
    out = b""
    for row in w:
        sub = row.reshape(8, 32)
        mins = -np.minimum(sub.min(1), 0)           # >= 0
        maxs = sub.max(1)
        d = max(np.max((maxs + mins)) / (63 * 15), 1e-8)
        dmin = max(np.max(mins) / 63, 1e-8)
        sc = np.clip(np.round((maxs + mins) / (15 * d)), 0, 63).astype(np.uint8)
        mn = np.clip(np.round(mins / dmin), 0, 63).astype(np.uint8)
        scales = np.zeros(12, np.uint8)
        for j in range(4):
            scales[j] = sc[j] & 63
            scales[j + 4] = mn[j] & 63
        for j in range(4, 8):
            scales[j + 4] = (sc[j] & 0x0F) | ((mn[j] & 0x0F) << 4)
            scales[j - 4] |= (sc[j] >> 4) << 6
            scales[j] |= (mn[j] >> 4) << 6
        eff_d = d * sc.astype(np.float32)
        eff_d[eff_d == 0] = 1.0
        eff_m = dmin * mn.astype(np.float32)
        q = np.clip(np.round((sub + eff_m[:, None]) / eff_d[:, None]),
                    0, 15).astype(np.uint8)
        qs = np.zeros(128, np.uint8)
        for k in range(4):
            qs[32 * k: 32 * (k + 1)] = q[2 * k] | (q[2 * k + 1] << 4)
        out += (np.float16(d).tobytes() + np.float16(dmin).tobytes()
                + scales.tobytes() + qs.tobytes())
    return out


class TestDequant:
    def _roundtrip(self, ttype, enc, n=512, tol=0.08, scale=1.0):
        rng = np.random.default_rng(0)
        w = (rng.standard_normal(n) * scale).astype(np.float32)
        raw = np.frombuffer(enc(w), np.uint8)
        got = G.decode_tensor(raw, ttype, (n,))
        err = np.abs(got - w).max() / (np.abs(w).max() + 1e-9)
        assert err < tol, err

    def test_q4_0(self):
        self._roundtrip(G.Q4_0, _enc_q4_0, tol=0.08)

    def test_q8_0(self):
        self._roundtrip(G.Q8_0, _enc_q8_0, tol=0.006)

    def test_q6_k(self):
        self._roundtrip(G.Q6_K, _enc_q6_k, tol=0.02)

    def test_q4_k(self):
        self._roundtrip(G.Q4_K, _enc_q4_k, tol=0.09)

    def test_f16_bf16(self):
        w = np.random.default_rng(1).standard_normal(64).astype(np.float32)
        raw16 = np.frombuffer(w.astype(np.float16).tobytes(), np.uint8)
        np.testing.assert_allclose(G.decode_tensor(raw16, G.F16, (64,)), w,
                                   atol=2e-3)
        bf = (w.view(np.uint32) >> 16).astype(np.uint16)
        rawbf = np.frombuffer(bf.tobytes(), np.uint8)
        np.testing.assert_allclose(G.decode_tensor(rawbf, G.BF16, (64,)), w,
                                   atol=2e-2)

    def test_2d_dim_order(self):
        """ggml stores dims innermost-first; a [rows, cols] f32 matrix
        written with dims (cols, rows) must come back [rows, cols]."""
        w = np.arange(12, dtype=np.float32).reshape(3, 4)
        raw = np.frombuffer(w.tobytes(), np.uint8)
        got = G.decode_tensor(raw, G.F32, (4, 3))  # dims as stored in file
        np.testing.assert_array_equal(got, w)


class TestEndToEndLlama:
    def test_gguf_roundtrip_logits(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, tie_word_embeddings=False,
            rope_theta=10000.0)
        torch.manual_seed(0)
        model = LlamaForCausalLM(cfg).eval()
        sd = {k: v.float().numpy() for k, v in model.state_dict().items()}

        def permute(w, heads):
            # llama.cpp's convert-time permutation, transcribed from its
            # convert script: reshape(heads, 2, hd/2, in).swapaxes(1, 2)
            od, ind = w.shape
            hd = od // heads
            return (w.reshape(heads, 2, hd // 2, ind)
                    .swapaxes(1, 2).reshape(od, ind))

        tensors = []
        kvs = b""
        n_kv = 0

        def add_kv(piece):
            nonlocal kvs, n_kv
            kvs += piece
            n_kv += 1

        add_kv(_kv_str("general.architecture", "llama"))
        add_kv(_kv_scalar("llama.embedding_length", 4, "I", 32))
        add_kv(_kv_scalar("llama.feed_forward_length", 4, "I", 64))
        add_kv(_kv_scalar("llama.block_count", 4, "I", 2))
        add_kv(_kv_scalar("llama.attention.head_count", 4, "I", 4))
        add_kv(_kv_scalar("llama.attention.head_count_kv", 4, "I", 2))
        add_kv(_kv_scalar("llama.context_length", 4, "I", 64))
        add_kv(_kv_scalar("llama.rope.freq_base", 6, "f", 10000.0))
        add_kv(_kv_scalar("llama.attention.layer_norm_rms_epsilon", 6, "f",
                          cfg.rms_norm_eps))
        add_kv(_kv_arr_str("tokenizer.ggml.tokens",
                           [f"t{i}" for i in range(64)]))

        def add(name, arr):
            arr = np.ascontiguousarray(arr, np.float32)
            tensors.append((name, arr.shape, G.F32,
                            np.frombuffer(arr.tobytes(), np.uint8)))

        add("token_embd.weight", sd["model.embed_tokens.weight"])
        add("output_norm.weight", sd["model.norm.weight"])
        add("output.weight", sd["lm_head.weight"])
        for i in range(2):
            hf = f"model.layers.{i}."
            gg = f"blk.{i}."
            add(gg + "attn_q.weight",
                permute(sd[hf + "self_attn.q_proj.weight"], 4))
            add(gg + "attn_k.weight",
                permute(sd[hf + "self_attn.k_proj.weight"], 2))
            add(gg + "attn_v.weight", sd[hf + "self_attn.v_proj.weight"])
            add(gg + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
            add(gg + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
            add(gg + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
            add(gg + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
            add(gg + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
            add(gg + "ffn_norm.weight",
                sd[hf + "post_attention_layernorm.weight"])

        path = str(tmp_path / "tiny.gguf")
        write_gguf(path, kvs, n_kv, tensors)

        hf_cfg, hf_tensors = G.gguf_to_hf(path)
        assert hf_cfg["num_hidden_layers"] == 2
        np.testing.assert_allclose(
            hf_tensors["model.layers.0.self_attn.q_proj.weight"],
            sd["model.layers.0.self_attn.q_proj.weight"], atol=1e-6)

        out = str(tmp_path / "converted")
        G.convert_gguf(path, out, bits=8, block_size=32)
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.models.decoder import forward
        from mnn_tpu.runtime import kvcache
        config, params, rt = load_checkpoint(out)
        ids = np.array([[5, 17, 60, 3, 42, 7]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()
        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 32,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        got = np.asarray(got, np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.06, rel
        assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8
