"""OpenAI-compatible server + CLI smoke tests (tiny model, CPU)."""

import json
import threading
import urllib.request

import pytest

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime.llm import Llm


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    from mnn_tpu.serve.server import make_handler

    rt = RuntimeConfig(max_seq_len=128, prefill_chunk=32, decode_block=4,
                       sampler="greedy", kv_quant=False, max_new_tokens=8)
    llm = Llm.synthetic("tiny", rt=rt)
    lock = threading.Lock()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(llm, lock))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.status, json.loads(r.read())


class TestServer:
    def test_models(self, server):
        status, body = _get(server, "/v1/models")
        assert status == 200
        assert body["data"][0]["id"] == "tiny"

    def test_chat_completion(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 6,
        })
        assert status == 200
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert body["usage"]["completion_tokens"] >= 1

    def test_streaming(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = r.read().decode()
        events = [ln for ln in raw.splitlines() if ln.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
        assert len(events) >= 2

    def test_reset(self, server):
        status, body = _post(server, "/reset", {})
        assert status == 200 and body["ok"]

    def test_metrics(self, server):
        status, body = _get(server, "/metrics")
        assert status == 200
        assert "decode_tok_s" in body

    def test_bad_json(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions", data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_missing_messages(self, server):
        try:
            _post(server, "/v1/chat/completions", {"max_tokens": 4})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


class TestCli:
    def test_run_synthetic(self, capsys):
        from mnn_tpu.cli import main

        main(["run", "--synthetic", "tiny", "--max-seq-len", "128",
              "--prefill-chunk", "32", "--decode-block", "4",
              "--max-new-tokens", "6", "--sampler", "greedy", "hello", "--raw"])
        out = capsys.readouterr()
        assert out.out is not None

    def test_bench_modes(self, capsys):
        from mnn_tpu.cli import main

        rows = main(["bench", "--synthetic", "tiny", "--max-seq-len", "128",
                     "--prefill-chunk", "32", "--decode-block", "4",
                     "--modes", "pp:16,tg:4", "--reps", "1"])
        assert len(rows) == 2
        assert rows[0]["prefill_tok_s"] > 0
