"""OpenAI-compatible HTTP server.

Equivalent of the reference's `mls_server.cpp`
(/root/reference/transformers/llm/engine/app/mls_server.cpp:168-271):
POST /v1/chat/completions (and /chat/completions) with optional SSE
streaming, POST /reset, GET /v1/models and /metrics. Stdlib http.server —
the engine is the bottleneck, not the HTTP layer. One request at a time per
engine (the reference likewise serializes on a single LlmContext); the
continuous-batching scheduler lands on top of this interface.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _sse(obj) -> bytes:
    return f"data: {json.dumps(obj)}\n\n".encode()


def make_handler(llm, lock: threading.Lock, engine=None):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/v1/models", "/models"):
                self._json(200, {
                    "object": "list",
                    "data": [{
                        "id": llm.config.name, "object": "model",
                        "owned_by": "mnn_tpu",
                    }],
                })
            elif self.path == "/metrics":
                p = llm.perf
                self._json(200, {
                    "prompt_len": p.prompt_len, "gen_len": p.gen_len,
                    "prefill_tok_s": round(p.prefill_tok_s, 2),
                    "decode_tok_s": round(p.decode_tok_s, 2),
                    "context_len": llm.context_len,
                    # ≈ getSessionInfo MEMORY/FLOPS/BACKENDS
                    # (Interpreter.hpp:447-476)
                    **llm.info(),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": {"message": "invalid JSON body"}})
                return

            if self.path in ("/reset", "/v1/reset"):
                with lock:
                    llm.reset()
                self._json(200, {"ok": True})
                return
            if self.path not in ("/v1/chat/completions", "/chat/completions",
                                 "/v1/completions", "/completions"):
                self._json(404, {"error": "not found"})
                return

            chat = "chat" in self.path
            try:
                if chat:
                    messages = body["messages"]
                    prompt = llm.tokenizer.apply_chat_template(messages)
                else:
                    prompt = body["prompt"]
            except (KeyError, TypeError) as e:
                self._json(400, {"error": {"message": f"missing field: {e}"}})
                return

            max_tokens = body.get("max_tokens") or body.get(
                "max_completion_tokens") or llm.rt.max_new_tokens
            # OpenAI logit_bias: {"token_id": bias} -> (id, bias) pairs
            logit_bias = None
            if body.get("logit_bias"):
                logit_bias = tuple(
                    (int(k), float(v))
                    for k, v in dict(body["logit_bias"]).items())
            timeout_s = float(body.get("timeout", 0) or 0)
            if body.get("temperature") is not None:
                llm.rt.temperature = float(body["temperature"])
            if body.get("top_p") is not None:
                llm.rt.top_p = float(body["top_p"])
            stream = bool(body.get("stream"))
            # OpenAI logprobs: chat = bool `logprobs` + int `top_logprobs`;
            # completions = int `logprobs` (top-N). -1 = off.
            if chat:
                lp = (int(body.get("top_logprobs") or 0)
                      if body.get("logprobs") else -1)
            else:
                lp = (int(body["logprobs"])
                      if body.get("logprobs") is not None else -1)
            rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
            created = int(time.time())
            model_name = body.get("model") or llm.config.name

            if engine is not None:
                self._engine_completion(engine, prompt, max_tokens, stream,
                                        rid, created, model_name, chat,
                                        logit_bias=logit_bias,
                                        timeout_s=timeout_s or None,
                                        logprobs=lp)
                return
            if lp >= 0:
                self._json(400, {"error": {"message":
                    "logprobs requires the batching engine "
                    "(serve with --batch >= 1 engine mode)"}})
                return
            import dataclasses as _dc
            llm.rt = _dc.replace(llm.rt, logit_bias=logit_bias)
            with lock:
                if not body.get("continue_context"):
                    llm.reset()
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def chunk(data: bytes):
                        self.wfile.write(f"{len(data):x}\r\n".encode())
                        self.wfile.write(data + b"\r\n")

                    buf = []
                    for tok in llm.stream(token_ids=llm.tokenizer.encode(prompt),
                                          max_new_tokens=max_tokens,
                                          timeout_s=timeout_s or None):
                        buf.append(tok)
                        text = llm.tokenizer.decode(buf)
                        if text.endswith("�"):
                            continue
                        buf.clear()
                        delta = {"content": text} if chat else None
                        chunk(_sse({
                            "id": rid, "object": "chat.completion.chunk",
                            "created": created, "model": model_name,
                            "choices": [{
                                "index": 0,
                                "delta": delta or {},
                                "text": None if chat else text,
                                "finish_reason": None,
                            }],
                        }))
                    chunk(_sse({
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": model_name,
                        "choices": [{"index": 0, "delta": {},
                                     "finish_reason": "stop"}],
                    }))
                    chunk(b"data: [DONE]\n\n")
                    chunk(b"")
                    return

                text = llm.generate(
                    token_ids=llm.tokenizer.encode(prompt),
                    max_new_tokens=max_tokens,
                )
                p = llm.perf
                msg = {"role": "assistant", "content": text}
                self._json(200, {
                    "id": rid, "object": "chat.completion" if chat else
                    "text_completion", "created": created,
                    "model": model_name,
                    "choices": [{
                        "index": 0,
                        "message" if chat else "text": msg if chat else text,
                        "finish_reason": "stop",
                    }],
                    "usage": {
                        "prompt_tokens": p.prompt_len,
                        "completion_tokens": p.gen_len,
                        "total_tokens": p.prompt_len + p.gen_len,
                    },
                })

        def _engine_completion(self, engine, prompt, max_tokens, stream,
                               rid, created, model_name, chat,
                               logit_bias=None, timeout_s=None,
                               logprobs=-1):
            ids = llm.tokenizer.encode(prompt)
            req = engine.submit(ids, max_tokens, timeout_s=timeout_s,
                                logit_bias=logit_bias, logprobs=logprobs)

            def lp_entry(tok, lp, tops):
                # chat-format logprob entry (OpenAI chat.completion)
                return {
                    "token": llm.tokenizer.decode([tok]),
                    "logprob": lp,
                    "top_logprobs": [
                        {"token": llm.tokenizer.decode([i]), "logprob": v}
                        for i, v in tops],
                }

            if stream:
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes):
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data + b"\r\n")

                buf, lps = [], []
                while True:
                    item = req.out.get()
                    if item is None:
                        break
                    if logprobs >= 0:
                        tok, lp, tops = item
                        lps.append(lp_entry(tok, lp, tops))
                    else:
                        tok = item
                    buf.append(tok)
                    text = llm.tokenizer.decode(buf)
                    if text.endswith("\ufffd"):
                        continue
                    buf.clear()
                    choice = {"index": 0,
                              "delta": {"content": text} if chat else {},
                              "text": None if chat else text,
                              "finish_reason": None}
                    if logprobs >= 0:
                        choice["logprobs"] = {"content": lps}
                        lps = []
                    chunk(_sse({
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": model_name,
                        "choices": [choice],
                    }))
                chunk(_sse({
                    "id": rid, "object": "chat.completion.chunk",
                    "created": created, "model": model_name,
                    "choices": [{"index": 0, "delta": {},
                                 "finish_reason": "stop"}],
                }))
                chunk(b"data: [DONE]\n\n")
                chunk(b"")
                return
            toks, lp_items = [], []
            while True:
                item = req.out.get()
                if item is None:
                    break
                if logprobs >= 0:
                    tok, lp, tops = item
                    lp_items.append((tok, lp, tops))
                else:
                    tok = item
                toks.append(tok)
            text = llm.tokenizer.decode(toks)
            msg = {"role": "assistant", "content": text}
            choice = {"index": 0,
                      "message" if chat else "text": msg if chat else text,
                      "finish_reason": "stop"}
            if logprobs >= 0:
                if chat:
                    choice["logprobs"] = {
                        "content": [lp_entry(*e) for e in lp_items]}
                else:  # completions format
                    choice["logprobs"] = {
                        "tokens": [llm.tokenizer.decode([t])
                                   for t, _, _ in lp_items],
                        "token_logprobs": [lp for _, lp, _ in lp_items],
                        "top_logprobs": [
                            {llm.tokenizer.decode([i]): v for i, v in tops}
                            for _, _, tops in lp_items],
                    }
            self._json(200, {
                "id": rid, "object": "chat.completion" if chat else
                "text_completion", "created": created, "model": model_name,
                "choices": [choice],
                "usage": {"prompt_tokens": len(ids),
                          "completion_tokens": len(toks),
                          "total_tokens": len(ids) + len(toks)},
            })

    return Handler


def serve(llm, host: str = "127.0.0.1", port: int = 9090, batch: int = 1,
          snapshot_path: str = "", dp: int = 1):
    """batch > 1 enables the continuous-batching engine (multi-request).

    snapshot_path makes the serving loop restartable (SURVEY.md §5.3): on
    startup the engine resumes from the snapshot if present; on shutdown
    the full engine state (KV cache, sampler, in-flight requests) is
    written back, so a restarted server continues mid-decode.

    dp > 1: shard the engine's batch dimension over a data-parallel mesh
    (multi-host when launched under MNN_TPU_COORDINATOR/...: each host's
    scheduler admits into its own rows — docs/multihost.md).
    """
    import os

    lock = threading.Lock()
    engine = None
    stop = threading.Event()
    if batch > 1:
        import dataclasses as _dc

        from mnn_tpu.runtime.batch_engine import BatchEngine

        mesh = None
        if dp > 1:
            from mnn_tpu.parallel import multihost

            multihost.initialize()
            mesh = multihost.two_level_mesh(dp=dp, tp=1)
        rt = _dc.replace(llm.rt, max_batch=batch)
        eos = getattr(llm.tokenizer, "eos_ids", set())
        if snapshot_path and os.path.exists(snapshot_path):
            engine = BatchEngine.resume(
                snapshot_path, llm.config, llm.params, rt,
                tokenizer=llm.tokenizer, eos_ids=eos, mesh=mesh)
            n_live = sum(1 for s in engine.slots if s is not None)
            print(f"[mnn-tpu] resumed engine from {snapshot_path} "
                  f"({n_live} in-flight requests)")
        else:
            engine = BatchEngine(
                llm.config, llm.params, rt, tokenizer=llm.tokenizer,
                eos_ids=eos, mesh=mesh,
            )
        threading.Thread(
            target=engine.run_forever, args=(stop,), daemon=True
        ).start()
    httpd = ThreadingHTTPServer((host, port), make_handler(llm, lock, engine))
    mode = f"continuous batching x{batch}" if engine else "single-stream"
    print(f"[mnn-tpu] serving OpenAI-compatible API on http://{host}:{port} ({mode})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        if engine is not None and snapshot_path:
            engine.snapshot(snapshot_path)
            print(f"[mnn-tpu] engine state snapshotted to {snapshot_path}")
        httpd.server_close()
