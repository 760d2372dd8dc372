"""GGUF tokenizer reconstruction: tokenizer.ggml.* metadata -> HF
tokenizer.json/tokenizer_config.json (parity with the reference's
gguf2mnn tokenizer rebuild). Oracle: the `tokenizers` library builds the
same BPE/Unigram directly; the reconstructed files must produce the same
token streams."""

import json
import os

import numpy as np
import pytest

from mnn_tpu.convert.gguf import reconstruct_tokenizer

tokenizers = pytest.importorskip("tokenizers")


def _train_byte_bpe():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=600, special_tokens=["<s>", "</s>"], show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = ["hello world, the quick brown fox jumps over the lazy dog",
              "pack my box with five dozen liquor jugs",
              "tokenizer reconstruction round trip test 12345"] * 20
    tok.train_from_iterator(corpus, trainer)
    return tok


class TestBpeReconstruction:
    def test_roundtrip_matches_oracle(self, tmp_path):
        from transformers import PreTrainedTokenizerFast

        oracle = _train_byte_bpe()
        vocab = oracle.get_vocab()
        id2tok = [None] * len(vocab)
        for t, i in vocab.items():
            id2tok[i] = t
        # merges in rank order, as "a b" strings (gguf convention)
        state = json.loads(oracle.to_str())
        merges = [" ".join(m) if isinstance(m, list) else m
                  for m in state["model"]["merges"]]

        meta = {
            "tokenizer.ggml.model": "gpt2",
            "tokenizer.ggml.tokens": id2tok,
            "tokenizer.ggml.merges": merges,
            "tokenizer.ggml.token_type": [
                3 if t in ("<s>", "</s>") else 1 for t in id2tok],
            "tokenizer.ggml.bos_token_id": vocab["<s>"],
            "tokenizer.ggml.eos_token_id": vocab["</s>"],
            "tokenizer.chat_template": "{{ messages }}",
        }
        out = str(tmp_path / "ckpt")
        assert reconstruct_tokenizer(meta, out)

        tk = PreTrainedTokenizerFast(
            tokenizer_file=os.path.join(out, "tokenizer.json"))
        for text in ("hello world", "the quick brown fox",
                     "liquor jugs 12345", "unseen zebra qx!"):
            want = oracle.encode(text).ids
            got = tk.encode(text)
            assert got == want, (text, got, want)
            assert tk.decode(got) == text

        with open(os.path.join(out, "tokenizer_config.json")) as f:
            cfg = json.load(f)
        assert cfg["bos_token"] == "<s>"
        assert cfg["eos_token"] == "</s>"
        assert cfg["chat_template"] == "{{ messages }}"

    def test_loads_via_runtime_tokenizer(self, tmp_path):
        from mnn_tpu.runtime.tokenizer import load_tokenizer

        oracle = _train_byte_bpe()
        vocab = oracle.get_vocab()
        id2tok = [None] * len(vocab)
        for t, i in vocab.items():
            id2tok[i] = t
        state = json.loads(oracle.to_str())
        merges = [" ".join(m) if isinstance(m, list) else m
                  for m in state["model"]["merges"]]
        meta = {
            "tokenizer.ggml.model": "gpt2",
            "tokenizer.ggml.tokens": id2tok,
            "tokenizer.ggml.merges": merges,
            "tokenizer.ggml.eos_token_id": vocab["</s>"],
        }
        out = str(tmp_path / "ckpt")
        assert reconstruct_tokenizer(meta, out)
        tk = load_tokenizer(out)
        assert type(tk).__name__ != "ByteTokenizer"
        ids = tk.encode("hello world")
        assert ids == oracle.encode("hello world").ids


class TestUnigramReconstruction:
    def test_spm_vocab_roundtrip(self, tmp_path):
        from transformers import PreTrainedTokenizerFast
        from tokenizers import Tokenizer, models, decoders, normalizers

        pieces = [("<unk>", 0.0), ("▁", -2.0), ("▁hello", -1.0),
                  ("▁world", -1.1), ("he", -3.0), ("llo", -3.1),
                  ("wor", -3.2), ("ld", -3.3), ("o", -5.0), ("l", -5.1),
                  ("d", -5.2), ("h", -5.3), ("e", -5.4), ("w", -5.5),
                  ("r", -5.6)]
        oracle = Tokenizer(models.Unigram(pieces, unk_id=0))
        oracle.normalizer = normalizers.Sequence([
            normalizers.Prepend("▁"),
            normalizers.Replace(" ", "▁"),
        ])
        oracle.decoder = decoders.Sequence([
            decoders.Replace("▁", " "),
            decoders.Fuse(),
            decoders.Strip(" ", 1, 0),
        ])

        meta = {
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": [p[0] for p in pieces],
            "tokenizer.ggml.scores": [p[1] for p in pieces],
            "tokenizer.ggml.token_type": [2] + [1] * (len(pieces) - 1),
            "tokenizer.ggml.unknown_token_id": 0,
        }
        out = str(tmp_path / "ckpt")
        assert reconstruct_tokenizer(meta, out)
        tk = PreTrainedTokenizerFast(
            tokenizer_file=os.path.join(out, "tokenizer.json"))
        for text in ("hello world", "world hello hello"):
            assert tk.encode(text) == oracle.encode(text).ids
            assert tk.decode(tk.encode(text)) == text


class TestNoVocab:
    def test_returns_false_without_tokens(self, tmp_path):
        assert not reconstruct_tokenizer({}, str(tmp_path / "x"))
