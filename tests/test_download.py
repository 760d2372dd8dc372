"""Model downloader (mnncli / remote_model_downloader parity): alias
resolution, local registry, and clean zero-egress failure modes."""

import os

import pytest

from mnn_tpu.convert import download as dl


class TestResolve:
    def test_alias(self):
        assert dl.resolve("qwen2-0.5b") == "Qwen/Qwen2-0.5B-Instruct"
        assert dl.resolve("QWEN2-0.5B") == "Qwen/Qwen2-0.5B-Instruct"

    def test_passthrough(self):
        assert dl.resolve("some/Other-Repo") == "some/Other-Repo"


class TestLocalRegistry:
    def test_list_local(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MNN_TPU_MODELS_DIR", str(tmp_path))
        (tmp_path / "a-model").mkdir()
        (tmp_path / "a-model" / "config.json").write_text("{}")
        (tmp_path / "not-a-model").mkdir()
        assert dl.list_local() == ["a-model"]

    def test_models_dir_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MNN_TPU_MODELS_DIR", str(tmp_path / "md"))
        assert dl.models_dir() == str(tmp_path / "md")
        assert os.path.isdir(dl.models_dir())


class TestZeroEgress:
    def test_download_failure_is_actionable(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MNN_TPU_MODELS_DIR", str(tmp_path))
        monkeypatch.setenv("HF_HUB_OFFLINE", "1")
        with pytest.raises(RuntimeError, match="no network egress|failed"):
            dl.download("qwen2-0.5b")
