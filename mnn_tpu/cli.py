"""mnn-tpu CLI: chat / run / bench / convert / serve.

Command-surface parity with the reference's tools:
  chat    ≈ llm_demo.cpp interactive loop (transformers/llm/engine/demo/llm_demo.cpp:265)
  run     ≈ llm_demo single-prompt mode
  bench   ≈ llm_bench pp/tg/pg modes (app/llm_benchmark.cpp)
  convert ≈ llmexport.py / MNNConvert (tools/converter)
  serve   ≈ mls_server.cpp OpenAI-compatible server (app/mls_server.cpp:168-271)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_model_args(p):
    p.add_argument("--model", help="converted checkpoint dir")
    p.add_argument("--synthetic", help="synthetic preset (e.g. qwen2-0.5b)")
    p.add_argument("--max-seq-len", type=int, default=4096)
    p.add_argument("--decode-block", type=int, default=32)
    p.add_argument("--prefill-chunk", type=int, default=512)
    p.add_argument("--sampler", default="mixed")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--penalty", type=float, default=1.0)
    p.add_argument("--no-kv-quant", action="store_true")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on NaN/Inf in any jitted computation "
                        "(jax_debug_nans; ~ checkInvalidValue.out)")


def _build_llm(args):
    from mnn_tpu.models.config import RuntimeConfig
    from mnn_tpu.runtime.llm import Llm
    from mnn_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    rt = RuntimeConfig(
        max_seq_len=args.max_seq_len, decode_block=args.decode_block,
        prefill_chunk=args.prefill_chunk, sampler=args.sampler,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        penalty=args.penalty, kv_quant=not args.no_kv_quant,
        max_new_tokens=args.max_new_tokens, seed=args.seed,
        debug_nans=args.debug_nans,
    )
    if args.model:
        return Llm.from_pretrained(args.model, rt=rt)
    preset = args.synthetic or "qwen2-0.5b"
    print(f"[mnn-tpu] no --model given; synthetic random-weight '{preset}'",
          file=sys.stderr)
    return Llm.synthetic(preset, rt=rt)


def cmd_chat(args):
    llm = _build_llm(args)
    print("mnn-tpu chat — /reset clears context, /exit quits", file=sys.stderr)
    while True:
        try:
            prompt = input("> ")
        except (EOFError, KeyboardInterrupt):
            break
        if prompt.strip() == "/exit":
            break
        if prompt.strip() == "/reset":
            llm.reset()
            print("[context cleared]", file=sys.stderr)
            continue
        buf = []
        for tok in llm.stream(prompt, use_template=True):
            buf.append(tok)
            text = llm.tokenizer.decode(buf)
            if not text.endswith("�"):
                sys.stdout.write(text)
                sys.stdout.flush()
                buf.clear()
        p = llm.perf
        print(f"\n[prefill {p.prefill_tok_s:.1f} tok/s | decode "
              f"{p.decode_tok_s:.1f} tok/s]", file=sys.stderr)


def cmd_run(args):
    llm = _build_llm(args)
    out = llm.generate(args.prompt, use_template=not args.raw)
    print(out)
    p = llm.perf
    print(f"[prefill {p.prompt_len} tok @ {p.prefill_tok_s:.1f} tok/s | "
          f"decode {p.gen_len} tok @ {p.decode_tok_s:.1f} tok/s]",
          file=sys.stderr)


def cmd_bench(args):
    llm = _build_llm(args)
    llm.rt.sampler = "greedy"
    results = []
    for mode in args.modes.split(","):
        kind, _, rest = mode.partition(":")
        pp = tg = 0
        if kind == "pp":
            pp = int(rest or 512)
        elif kind == "tg":
            pp, tg = 4, int(rest or 128)
        elif kind == "pg":
            a, _, b = rest.partition("+")
            pp, tg = int(a or 512), int(b or 128)
        else:
            raise SystemExit(f"unknown bench mode {mode}")
        samples = {"prefill": [], "decode": []}
        for _ in range(args.reps + 1):
            llm.reset()
            for _t in llm.stream(token_ids=list(range(max(pp, 1))),
                                 max_new_tokens=max(tg, 1)):
                pass
            samples["prefill"].append(llm.perf.prefill_tok_s)
            samples["decode"].append(llm.perf.decode_tok_s)
        # drop run 0 (compile)
        import statistics

        row = {"mode": mode, "pp": pp, "tg": tg}
        for key in ("prefill", "decode"):
            vals = samples[key][1:]
            row[key + "_tok_s"] = round(statistics.mean(vals), 2)
            row[key + "_stddev"] = round(
                statistics.stdev(vals) if len(vals) > 1 else 0.0, 2
            )
        results.append(row)
        print(json.dumps(row))
    return results


def cmd_download(args):
    from mnn_tpu.convert.download import download

    path = download(args.name, out=args.out)
    print(path)


def cmd_search(args):
    from mnn_tpu.convert.download import search

    for hit in search(args.query, limit=args.limit):
        print(f"{hit['id']}  (downloads {hit['downloads']}, "
              f"likes {hit['likes']})")


def cmd_list(args):
    from mnn_tpu.convert.download import list_local

    for name in list_local():
        print(name)


def cmd_convert(args):
    if not (args.hf or args.gguf):
        raise SystemExit("convert: provide --hf DIR or --gguf FILE")
    t0 = time.time()
    kw = dict(bits=args.bits, block_size=args.block, sym=args.sym,
              tp_shards=args.tp, act_bits=args.act_bits,
              lm_head_bits=args.lm_head_bits)
    if args.awq:
        import numpy as np

        if args.calib_data:
            # text file, one calibration sample per line, tokenized with
            # the source model's tokenizer
            from mnn_tpu.runtime.tokenizer import load_tokenizer

            tok = load_tokenizer(args.hf)
            lines = [ln.strip() for ln in open(args.calib_data)
                     if ln.strip()][:16]
            ids = [tok.encode(ln)[:256] for ln in lines]
            t = max(len(i) for i in ids)
            calib = np.zeros((len(ids), t), np.int32)
            for r, i in enumerate(ids):
                calib[r, :len(i)] = i
        else:
            rng = np.random.default_rng(0)
            calib = rng.integers(0, 1000, (4, 128)).astype(np.int32)
        kw.update(awq=True, calib_tokens=calib)
    if args.gguf:
        from mnn_tpu.convert.gguf import convert_gguf

        convert_gguf(args.gguf, args.out, **kw)
        src = args.gguf
    else:
        from mnn_tpu.convert.hf import convert_hf

        convert_hf(args.hf, args.out, **kw)
        src = args.hf
    print(f"converted {src} -> {args.out} "
          f"(int{args.bits}, block {args.block}, {time.time()-t0:.1f}s)")


def cmd_bench_cnn(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mnn_tpu.convert.torch_fx import convert_torch_module
    from mnn_tpu.models.vision import VISION_MODELS
    from mnn_tpu.utils.benchit import chain
    from mnn_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    names = args.models.split(",") if args.models else list(VISION_MODELS)
    for name in names:
        import torch

        torch.manual_seed(0)
        mod = VISION_MODELS[name]().eval()
        fn, params = convert_torch_module(mod)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (args.batch, 3, args.size, args.size)), jnp.bfloat16)
        t = chain(lambda xx: fn(params, xx), x, iters=20, warmup=2)
        print(json.dumps({
            "model": name, "batch": args.batch,
            "latency_ms": round(t * 1e3, 3),
            "images_per_s": round(args.batch / t, 1),
        }))


def cmd_eval_cls(args):
    # ImageNet-style top-k accuracy ≈ the reference's
    # tools/evaluation/classficationTopkEval.cpp
    import jax
    import jax.numpy as jnp

    from mnn_tpu.convert.torch_fx import convert_torch_module
    from mnn_tpu.models.vision import VISION_MODELS
    from mnn_tpu.runtime.classify import eval_folder

    import torch

    torch.manual_seed(0)
    mod = VISION_MODELS[args.net]().eval()
    if args.weights:
        mod.load_state_dict(torch.load(args.weights, map_location="cpu"))
    fn, params = convert_torch_module(mod)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    r = eval_folder(lambda x: fn(params, x.astype(jnp.bfloat16)), args.dir,
                    size=args.size, k=args.k, batch_size=args.batch,
                    limit=args.limit)
    print(json.dumps({"net": args.net, **r}))


def cmd_eval(args):
    llm = _build_llm(args)
    if args.file:
        text = open(args.file).read()
    else:
        text = args.text or ""
    ids = llm.tokenizer.encode(text)[: args.max_tokens_eval]
    from mnn_tpu.runtime.evaluate import perplexity

    ppl = perplexity(llm.params, llm.config, ids, chunk=args.prefill_chunk)
    print(json.dumps({"tokens": len(ids), "perplexity": round(ppl, 4)}))


def cmd_tune(args):
    # measured GEMM block-size selection, persisted per device kind
    # (= the reference's GemmTune + setCacheFile flow)
    llm = _build_llm(args)
    from mnn_tpu.kernels import autotune

    ms = tuple(int(v) for v in args.m.split(","))
    autotune.tune_model(llm.params, m_values=ms)


def cmd_serve(args):
    from mnn_tpu.serve.server import serve

    llm = _build_llm(args)
    serve(llm, host=args.host, port=args.port, batch=args.batch,
          snapshot_path=args.snapshot, dp=args.dp)


def cmd_txt2img(args):
    # diffusion demo CLI ≈ the reference's diffusion_demo
    # (transformers/diffusion/engine/, Diffusion::run(prompt, iterNum, seed))
    import numpy as np

    from mnn_tpu.diffusion import StableDiffusion

    sd = StableDiffusion.from_pretrained(args.model, scheduler=args.scheduler)
    t0 = time.time()
    img = sd.txt2img(args.prompt, negative_prompt=args.negative,
                     num_steps=args.steps, seed=args.seed,
                     guidance_scale=args.cfg, height=args.size,
                     width=args.size,
                     callback=lambda i, _: print(f"step {i + 1}/{args.steps}",
                                                 flush=True))
    dt = time.time() - t0
    try:
        from PIL import Image

        Image.fromarray(img).save(args.out)
    except ImportError:
        np.save(args.out + ".npy", img)
    print(f"saved {args.out} ({dt:.1f}s, {args.steps / dt:.2f} it/s)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mnn-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("chat", help="interactive chat")
    _add_model_args(p)
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("run", help="single prompt")
    _add_model_args(p)
    p.add_argument("prompt")
    p.add_argument("--raw", action="store_true", help="no chat template")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("bench", help="pp/tg/pg benchmark")
    _add_model_args(p)
    p.add_argument("--modes", default="pp:512,tg:128,pg:512+128")
    p.add_argument("--reps", type=int, default=3)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("download",
                       help="fetch a model from the hub (mnncli parity)")
    p.add_argument("name", help="alias (e.g. qwen2-0.5b) or HF repo id")
    p.add_argument("--out", help="target dir (default: model cache)")
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("search", help="search the model hub")
    p.add_argument("query")
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("list", help="list locally cached models")
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("convert", help="convert a HF or GGUF checkpoint")
    p.add_argument("--hf", help="HF model directory")
    p.add_argument("--gguf", help="llama.cpp GGUF file (dequantized + "
                                  "requantized on our grid)")
    p.add_argument("--out", required=True)
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--act-bits", type=int, default=16, choices=(8, 16),
                   help="8 = dynamic int8 activations (W4A8)")
    p.add_argument("--lm-head-bits", type=int, default=0, choices=(0, 4, 8),
                   help="quantize the output projection (0 = keep bf16)")
    p.add_argument("--tp", type=int, default=1,
                   help="target tensor-parallel shards (affects block sizes)")
    p.add_argument("--awq", action="store_true",
                   help="activation-aware scale search + clipping "
                        "(quant/awq_search.py)")
    p.add_argument("--calib-data",
                   help="calibration text file for --awq (one sample/line; "
                        "random tokens when omitted)")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("bench-cnn", help="vision model latency (bf16)")
    p.add_argument("--models", help="comma list (default: all)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=224)
    p.set_defaults(fn=cmd_bench_cnn)

    p = sub.add_parser("eval-cls", help="top-k classification accuracy over "
                                        "an ImageFolder tree")
    p.add_argument("--dir", required=True)
    p.add_argument("--net", default="mobilenet_v2")
    p.add_argument("--weights", default="", help="torch state_dict .pt")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_eval_cls)

    p = sub.add_parser("eval", help="perplexity over a text file")
    _add_model_args(p)
    p.add_argument("--file")
    p.add_argument("--text")
    p.add_argument("--max-tokens-eval", type=int, default=4096)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("tune", help="autotune GEMM block sizes on this chip")
    _add_model_args(p)
    p.add_argument("--m", default="1,8,128,512",
                   help="comma-separated batch-row sizes to tune")
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("txt2img", help="diffusion text-to-image")
    p.add_argument("--model", required=True,
                   help="diffusers-format SD checkpoint dir")
    p.add_argument("prompt")
    p.add_argument("--negative", default="")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg", type=float, default=7.5)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "ddpm", "euler", "flow_match"])
    p.add_argument("--out", default="out.png")
    p.set_defaults(fn=cmd_txt2img)

    p = sub.add_parser("serve", help="OpenAI-compatible server")
    _add_model_args(p)
    p.add_argument("--snapshot", default="",
                   help="engine state file: resume from it on start, "
                        "write it on shutdown (restartable serving)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9090)
    p.add_argument("--batch", type=int, default=1,
                   help=">1 enables continuous batching")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree (multi-host via "
                        "MNN_TPU_COORDINATOR env; docs/multihost.md)")
    p.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
