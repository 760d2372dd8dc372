"""Server in continuous-batching mode: concurrent requests over HTTP."""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime.llm import Llm


@pytest.fixture(scope="module")
def server():
    import dataclasses
    from http.server import ThreadingHTTPServer

    from mnn_tpu.runtime.batch_engine import BatchEngine
    from mnn_tpu.serve.server import make_handler

    rt = RuntimeConfig(max_seq_len=64, prefill_chunk=16, decode_block=4,
                       sampler="greedy", kv_quant=False, max_new_tokens=6,
                       max_batch=1)
    llm = Llm.synthetic("tiny", rt=rt)
    engine = BatchEngine(
        llm.config, llm.params, dataclasses.replace(rt, max_batch=3),
        tokenizer=llm.tokenizer,
        eos_ids=getattr(llm.tokenizer, "eos_ids", set()),
    )
    stop = threading.Event()
    threading.Thread(target=engine.run_forever, args=(stop,), daemon=True).start()
    lock = threading.Lock()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(llm, lock, engine)
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    stop.set()
    httpd.shutdown()


def _chat(url, content, max_tokens=5):
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": content}],
            "max_tokens": max_tokens,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=180) as r:
        return json.loads(r.read())


class TestBatchedServer:
    def test_single(self, server):
        body = _chat(server, "hello")
        assert body["choices"][0]["finish_reason"] == "stop"
        assert body["usage"]["completion_tokens"] >= 1

    def test_concurrent(self, server):
        with ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(_chat, server, f"prompt {i}", 5) for i in range(4)]
            bodies = [f.result() for f in futs]
        assert all(b["usage"]["completion_tokens"] >= 1 for b in bodies)

    def test_streaming_engine(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            raw = r.read().decode()
        events = [ln for ln in raw.splitlines() if ln.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
