"""HTTP serving driver: retrieval search + captioning over a checkpoint.

Deployment front-end for univl_tpu/serving (no reference equivalent — the
reference stops at offline eval loops). JSON over HTTP via the stdlib
ThreadingHTTPServer; device work is serialized behind one lock.

    python -m univl_tpu.cli.serve --vocab_file vocab.txt \
        --init_model ckpt/best.msgpack --mode retrieval \
        [--index corpus_index.npz] [--rerank_store_full] \
        --port 8080

Endpoints:
  GET  /healthz                  -> {"status": "ok", "mode", "indexed"}
  POST /v1/retrieval/add         {"videos": [[[f..]..]..] | "feature_paths":
                                  [".npy"...], "ids": [...]}
  POST /v1/retrieval/search      {"queries": [...], "top_k": 5, "rerank": 0}
  POST /v1/retrieval/save        {"path": "index.npz"}
  POST /v1/caption               {"videos" | "feature_paths", "transcripts"?}

Videos are S3D feature clips: [T, video_dim] float arrays, either inline
JSON or .npy paths readable by the server.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from univl_tpu.cli import common


def add_serve_args(p):
    p.add_argument("--mode", type=str, default="retrieval",
                   choices=["retrieval", "caption", "both"])
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--index", type=str, default=None,
                   help="load a VideoRetrievalIndex .npz at startup")
    p.add_argument("--rerank_store_full", action="store_true",
                   help="keep full visual outputs for cross-encoder rerank "
                        "(requires a cross-encoder model: --stage_two or "
                        "--train_sim_after_cross)")
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--serve_batch_size", type=int, default=16)
    import argparse

    p.add_argument("--coalesce_captions", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="merge concurrent /v1/caption requests into shared "
                        "decode batches (serving/coalesce.py; per-clip "
                        "results unchanged, up to batch_size x concurrent "
                        "throughput). --no-coalesce_captions serves each "
                        "request as its own padded batch")
    return p


def _tree_union(base: dict, extra: dict) -> dict:
    """Add subtrees from `extra` that are absent in `base` (base wins)."""
    out = dict(base)
    for k, v in extra.items():
        if k not in out:
            out[k] = v
        elif isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _tree_union(out[k], v)
    return out


def _decode_videos(payload, video_dim: int):
    # Both branches validate [T, video_dim] BEFORE returning: the caption
    # coalescer (serving/coalesce.py) relies on handler-side validation so a
    # bad request fails alone instead of poisoning a merged decode batch.
    if "feature_paths" in payload:
        vids = [np.load(p).astype(np.float32) for p in payload["feature_paths"]]
    else:
        vids = [np.asarray(v, np.float32) for v in payload["videos"]]
    for v in vids:
        if v.ndim != 2 or v.shape[1] != video_dim:
            raise ValueError(f"video must be [T, {video_dim}], got {v.shape}")
    return vids


def _decode_transcripts(payload, n_videos: int):
    # Same isolation contract as _decode_videos: transcripts are validated
    # handler-side so a malformed one cannot fail a merged decode batch.
    txts = payload.get("transcripts")
    if txts is None:
        return None
    if not isinstance(txts, (list, tuple)):
        raise ValueError("transcripts must be a list of strings")
    if len(txts) != n_videos:
        raise ValueError(
            f"transcripts length {len(txts)} != videos length {n_videos}"
        )
    for t in txts:
        if not isinstance(t, str):
            raise ValueError(
                f"transcripts entries must be strings, got {type(t).__name__}"
            )
    return list(txts)


def build_services(args):
    """Load model + checkpoint, return (index, caption_service, cfg)."""
    import jax

    from univl_tpu.data.tokenization import WordPieceTokenizer
    from univl_tpu.models.univl import UniVL

    logger = common.get_logger(args.output_dir)
    tokenizer = WordPieceTokenizer(args.vocab_file, do_lower_case=args.do_lower_case)
    want_caption = args.mode in ("caption", "both")
    cfg = common.build_config(
        args,
        task_type="caption" if want_caption else "retrieval",
        vocab_size=len(tokenizer),
    )
    if want_caption and not cfg.stage_two:
        cfg = cfg.replace(stage_two=True)
    model = UniVL(cfg)

    B = 2
    example = {
        "input_ids": np.ones((B, cfg.max_words), np.int32),
        "token_type_ids": np.zeros((B, cfg.max_words), np.int32),
        "attention_mask": np.ones((B, cfg.max_words), np.int32),
        "video": np.zeros((B, cfg.max_frames, cfg.video_dim), np.float32),
        "video_mask": np.ones((B, cfg.max_frames), np.int32),
    }
    if cfg.stage_two and not cfg.train_sim_after_cross:
        example.update(
            input_caption_ids=np.ones((B, cfg.max_words), np.int32),
            decoder_mask=np.ones((B, cfg.max_words), np.int32),
            output_caption_ids=np.ones((B, cfg.max_words), np.int32),
        )
    # Build a FULL param template: flax only creates what the traced method
    # touches, and __call__ in stage-two caption mode never reaches the
    # cross-similarity head — union in its params so (a) rerank works and
    # (b) checkpoint weights for the head aren't dropped by the merge.
    template = jax.jit(
        lambda r: model.init(r, example, deterministic=True)
    )(jax.random.key(args.seed))["params"]
    if cfg.stage_two or cfg.train_sim_after_cross:
        H = cfg.bert.hidden_size
        sim_tmpl = jax.jit(
            lambda r: model.init(
                r,
                np.zeros((B, cfg.max_words, H), np.float32),
                np.zeros((B, cfg.max_frames, H), np.float32),
                example["attention_mask"], example["video_mask"],
                method=UniVL.cross_similarity_pairs,
            )
        )(jax.random.key(args.seed + 1))["params"]
        template = _tree_union(template, sim_tmpl)
    model_params = common.load_init_params(
        args, model, example, logger, template_params=template
    )
    params = {"params": model_params}

    index = caption = None
    if args.mode in ("retrieval", "both"):
        from univl_tpu.serving import VideoRetrievalIndex

        if args.index:
            index = VideoRetrievalIndex.load(
                args.index, model, params, tokenizer,
                batch_size=args.serve_batch_size,
            )
        else:
            index = VideoRetrievalIndex(
                model, params, tokenizer,
                batch_size=args.serve_batch_size,
                store_full=args.rerank_store_full,
            )
    if want_caption:
        from univl_tpu.serving import CaptionService

        caption = CaptionService(
            model, params, tokenizer,
            beam_size=args.beam_size,
            batch_size=args.serve_batch_size,
            fused_decode=args.fused_decode,
            fused_vocab=getattr(args, "fused_vocab", None),
        )
    return index, caption, cfg


def make_server(args):
    index, caption, cfg = build_services(args)
    lock = threading.Lock()  # one request on the device at a time
    coalescer = None
    if caption is not None and getattr(args, "coalesce_captions", True):
        from univl_tpu.serving import CoalescingCaptionService

        # The coalescer's dispatcher owns caption-side device access (it
        # takes `lock` itself around each merged decode); handler threads
        # enqueue and wait instead of serializing one request at a time.
        coalescer = CoalescingCaptionService(caption, device_lock=lock)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet; get_logger owns stdout
            pass

        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "mode": args.mode,
                    "indexed": len(index) if index is not None else None,
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/retrieval/add" and index is not None:
                    vids = _decode_videos(payload, cfg.video_dim)
                    with lock:
                        index.add(vids, ids=payload.get("ids"))
                    self._reply(200, {"indexed": len(index)})
                elif self.path == "/v1/retrieval/search" and index is not None:
                    with lock:
                        res = index.search(
                            payload["queries"],
                            top_k=int(payload.get("top_k", 10)),
                            rerank=int(payload.get("rerank", 0)),
                        )
                    self._reply(200, {"results": [
                        [{"id": i, "score": s} for i, s in r] for r in res
                    ]})
                elif self.path == "/v1/retrieval/save" and index is not None:
                    with lock:
                        index.save(payload["path"])
                    self._reply(200, {"path": payload["path"]})
                elif self.path == "/v1/caption" and caption is not None:
                    vids = _decode_videos(payload, cfg.video_dim)
                    txts = _decode_transcripts(payload, len(vids))
                    if coalescer is not None:
                        caps = coalescer.caption(vids, transcripts=txts)
                    else:
                        with lock:
                            caps = caption.caption(vids, transcripts=txts)
                    self._reply(200, {"captions": caps})
                else:
                    self._reply(404, {"error": f"no handler for {self.path} "
                                               f"in mode={args.mode}"})
            except Exception as e:  # surface errors as JSON, keep serving
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    server.caption_coalescer = coalescer  # for clean shutdown in tests
    return server


def main(argv=None, serve_forever: bool = True):
    parser = add_serve_args(common.base_parser("UniVL-TPU Serve"))
    args = parser.parse_args(argv)
    args.do_eval = True  # satisfies shared-arg expectations; no training here
    if args.gradient_accumulation_steps != 1:
        args.gradient_accumulation_steps = 1
    logger = common.get_logger(args.output_dir)
    assert args.vocab_file, "--vocab_file required"
    server = make_server(args)
    logger.info("serving mode=%s on http://%s:%d", args.mode,
                *server.server_address)
    if serve_forever:
        server.serve_forever()
    return server


if __name__ == "__main__":
    main()
