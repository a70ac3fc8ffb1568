"""Shared CLI plumbing for the three drivers.

Flag surface mirrors the reference argparse blocks
(main_task_retrieval.py:27-107, main_task_caption.py:28-108,
main_pretrain.py:26-113) with the same names and semantics, plus TPU-native
knobs (--vocab_file, --compute_dtype, --use_pallas, --remat).

Differences from the reference runtime model:
  - no torch.distributed.launch: one process drives the whole mesh
  - --n_gpu becomes the mesh size (defaults to all local devices)
  - --fp16 maps to bfloat16 compute (the reference parses apex flags it
    never applies, SURVEY.md §2.2)
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import time
from typing import Optional

import numpy as np


class MetricsWriter:
    """Structured run metrics: one JSON object per line in metrics.jsonl.

    Machine-readable companion to log.txt (the reference only has free-text
    logging, util.py:62-73) — feeds dashboards/regression tooling without
    log parsing. Records train display-points and eval results."""

    def __init__(self, output_dir: Optional[str]):
        self._f = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._f = open(
                os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1
            )

    def write(self, kind: str, **fields):
        if self._f is None:
            return
        import json as _json

        rec = {"ts": round(time.time(), 3), "kind": kind}
        for k, v in fields.items():
            if isinstance(v, (int, float, str, bool)) or v is None:
                rec[k] = v
            else:
                try:
                    rec[k] = float(v)
                except (TypeError, ValueError):
                    pass
        self._f.write(_json.dumps(rec) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


def get_logger(output_dir: Optional[str] = None, name: str = "univl_tpu"):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--do_pretrain", action="store_true")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")

    p.add_argument("--train_csv", type=str, default="data/youcookii_singlef_train.csv")
    p.add_argument("--val_csv", type=str, default="data/youcookii_singlef_val.csv")
    p.add_argument("--data_path", type=str, default="data/youcookii_caption.pickle")
    p.add_argument("--features_path", type=str, default="data/youcookii_videos_feature.pickle")

    # Preemption handling + exact resume (all drivers; no reference
    # equivalent — the reference loses any in-flight progress on kill).
    p.add_argument("--load_checkpoint", action="store_true",
                   help="resume from <output_dir>/train_state.msgpack "
                        "(written on preemption and at each epoch end): "
                        "continues at the exact update-batch, bit-identical "
                        "to an uninterrupted run")
    p.add_argument("--no_preempt_checkpoint", action="store_true",
                   help="do NOT checkpoint-and-exit on SIGTERM (preemption); "
                        "also skips the per-epoch full train-state write")
    p.add_argument("--inject_preempt_after", type=int, default=0,
                   help="fault injection: simulate a preemption signal after "
                        "N steps (testing the SIGTERM save/resume path)")

    p.add_argument("--num_thread_reader", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--batch_size_val", type=int, default=64)
    p.add_argument("--lr_decay", type=float, default=0.9)  # parsed, unused (parity)
    p.add_argument("--n_display", type=int, default=100)
    p.add_argument("--video_dim", type=int, default=1024)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_words", type=int, default=20)
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--feature_framerate", type=float, default=1)
    p.add_argument("--margin", type=float, default=0.1)
    p.add_argument("--hard_negative_rate", type=float, default=0.5)
    p.add_argument("--negative_weighting", type=int, default=1)
    p.add_argument("--n_pair", type=int, default=1)

    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--bert_model", type=str, default="bert-base-uncased")
    p.add_argument("--visual_model", type=str, default="visual-base")
    p.add_argument("--cross_model", type=str, default="cross-base")
    p.add_argument("--decoder_model", type=str, default="decoder-base")
    p.add_argument("--init_model", type=str, default=None,
                   help="torch .bin or flax .msgpack params to initialize from")
    p.add_argument("--do_lower_case", action="store_true")
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--n_gpu", type=int, default=0,
                   help="mesh size; 0 = all local devices")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="tp axis size of a 2-D (dp, tp) mesh; weights are "
                        "Megatron-sharded over tp (parallel/tp.py). Must "
                        "divide the mesh size. No reference equivalent "
                        "(the reference is DP-only).")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: reduce-scatter grads and shard the BertAdam "
                        "state/update over dp (train/zero1.py). Divides "
                        "optimizer memory and the HBM-bound update by the dp "
                        "size; numerically equivalent to the replicated "
                        "optimizer (tests/test_zero1.py). Composes with "
                        "--tensor_parallel > 1 via train/zero1_tp.py. "
                        "No reference equivalent.")
    p.add_argument("--cache_dir", type=str, default="")
    p.add_argument("--fp16", action="store_true", help="bfloat16 compute on TPU")
    p.add_argument("--fp16_opt_level", type=str, default="O1")  # parity, unused

    p.add_argument("--task_type", type=str, default="retrieval")
    p.add_argument("--datatype", type=str, default="youcook")
    p.add_argument("--world_size", type=int, default=0)
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--coef_lr", type=float, default=0.1)
    p.add_argument("--use_mil", action="store_true")
    p.add_argument("--sampled_use_mil", action="store_true")

    p.add_argument("--text_num_hidden_layers", type=int, default=12)
    p.add_argument("--visual_num_hidden_layers", type=int, default=6)
    p.add_argument("--cross_num_hidden_layers", type=int, default=2)
    p.add_argument("--decoder_num_hidden_layers", type=int, default=3)

    p.add_argument("--train_sim_after_cross", action="store_true")
    p.add_argument("--expand_msrvtt_sentences", action="store_true")
    p.add_argument("--stage_two", action="store_true")

    # TPU-native knobs
    p.add_argument("--vocab_file", type=str, default=None,
                   help="WordPiece vocab.txt (required; no network download)")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", action="store_true",
                   help="force the fused Pallas attention kernel everywhere "
                        "(wins at pretrain-scale batches; prefer "
                        "--attention auto, docs/PERF.md)")
    p.add_argument("--attention", type=str, default=None,
                   choices=["xla", "pallas", "auto"],
                   help="attention impl; auto = Pallas only at shapes where "
                        "it measured faster (overrides --use_pallas)")
    p.add_argument("--train_attention", type=str, default="xla",
                   choices=["xla", "pallas", "auto"],
                   help="TRAINING-mode attention impl: pallas = fused kernel "
                        "with in-kernel prob dropout + recompute backward "
                        "(+18%% on FT-Align); auto = only at B*Lk >= 16384; "
                        "dropout bits use the TPU PRNG, not the jax.random "
                        "stream (docs/PERF.md)")
    p.add_argument("--fused_ffn", type=str, default="xla",
                   choices=["xla", "pallas", "auto", "block", "auto_block"],
                   help="FFN impl: pallas = fused dense->GELU->dense kernel "
                        "(wins at FT-Align/rescoring row counts); auto = "
                        "only at >= 16384 rows; block/auto_block also fold "
                        "dropout+residual+LayerNorm into the kernel "
                        "(dropout bits then use the TPU PRNG) (docs/PERF.md)")
    p.add_argument("--fused_decode", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="beam decode: fuse the pending beam permutation + "
                        "cache update + attention into one Pallas pass over "
                        "the KV cache (decode ceiling 1.26x; numerics match "
                        "the default to f32 tolerance, not bitwise — "
                        "docs/PERF.md). Unset -> UNIVL_TPU_FUSED_DECODE env "
                        "decides (and the serve driver defaults to ON on "
                        "TPU); --no-fused_decode overrides both")
    p.add_argument("--fused_vocab", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="beam decode: stream the 30k-vocab tied classifier "
                        "+ log-softmax + per-row top-K through VMEM tiles "
                        "(kernels/vocab_topk.py) — the f32 [B*K, V] logits "
                        "never exist in HBM. Values match the default to "
                        "f32 tolerance, not bitwise. Unset -> "
                        "UNIVL_TPU_FUSED_VOCAB env decides; "
                        "--no-fused_vocab overrides")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "dots"],
                   help="with --remat: full layer, or save matmul outputs "
                        "and recompute elementwise only (less memory saved, "
                        "less recompute)")
    p.add_argument("--scan_layers", action="store_true",
                   help="roll tower layers into one nn.scan: much faster "
                        "trace+compile, identical math; checkpoints convert "
                        "between layouts automatically")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="with --tensor_parallel > 1: shard the encoder "
                        "LN/dropout/residual regions over the sequence dim "
                        "(Megatron-SP; reduce-scatter + all-gather replace "
                        "the tp all-reduces, parallel/sp.py)")
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of early train steps")
    p.add_argument("--transfer_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="host->device dtype for float features; bfloat16 "
                        "halves transfer bytes (input fidelity ~3 digits)")
    p.add_argument("--adam_state_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for BertAdam moments; bfloat16 halves "
                        "optimizer HBM traffic/memory (not reference-exact)")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the background device-transfer thread "
                        "(helps on transfer-bound links, see docs/PERF.md)")
    return p


def finalize_args(args):
    if args.gradient_accumulation_steps < 1:
        raise ValueError("gradient_accumulation_steps must be >= 1")
    if not (args.do_train or args.do_eval or args.do_pretrain):
        raise ValueError("one of do_train / do_eval / do_pretrain required")
    # reference divides the global batch by grad accumulation up front
    # (main_task_retrieval.py:105)
    args.batch_size = int(args.batch_size / args.gradient_accumulation_steps)
    if args.sampled_use_mil:
        args.use_mil = True
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        # reproducibility: record the resolved flags
        import json as _json

        with open(os.path.join(args.output_dir, "args.json"), "w") as f:
            _json.dump(vars(args), f, indent=1, default=str)
    random.seed(args.seed)
    np.random.seed(args.seed)
    os.environ["PYTHONHASHSEED"] = str(args.seed)
    return args


def build_config(args, stage_two: bool = False, task_type: str = "retrieval",
                 vocab_size: Optional[int] = None):
    import jax

    from univl_tpu.config import UniVLConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not os.environ.get("UNIVL_TPU_THREEFRY"):
        # rbg PRNG: hardware-accelerated on TPU; dropout mask generation drops
        # from ~1.4ms to ~0.35ms per forward at the bench config (docs/PERF.md).
        # Different (but still deterministic-per-seed) streams than threefry;
        # set UNIVL_TPU_THREEFRY=1 to keep JAX's default.
        jax.config.update("jax_default_prng_impl", "rbg")
    dtype = args.compute_dtype or (
        "bfloat16" if (on_tpu or args.fp16) else "float32"
    )
    n_dev = args.n_gpu or len(jax.devices())
    micro_global = args.batch_size  # already divided by grad accum
    # With tensor parallelism the batch splits over dp groups only (the tp
    # devices of a group share one batch shard).
    n_dp = max(1, n_dev // max(1, getattr(args, "tensor_parallel", 1)))
    bs_per_dev = max(1, micro_global // n_dp)
    # Reference-style per-module JSON configs: when --bert_model /
    # --visual_model / ... name a directory containing <kind>_config.json,
    # load it (reference until_config.py:40-99); CLI layer flags override
    # (update_attr semantics, modeling.py:98-104,133-158).
    import os as _os

    from univl_tpu.config import BertConfig, CrossConfig, DecoderConfig, VisualConfig

    def _json_cfg(cls, model_dir, json_name):
        path = _os.path.join(str(model_dir), json_name)
        if _os.path.isdir(str(model_dir)) and _os.path.exists(path):
            return cls.from_json(path)
        return None

    json_overrides = {
        "bert": _json_cfg(BertConfig, args.bert_model, "bert_config.json"),
        "visual": _json_cfg(VisualConfig, args.visual_model, "visual_config.json"),
        "cross": _json_cfg(CrossConfig, args.cross_model, "cross_config.json"),
        "decoder": _json_cfg(DecoderConfig, args.decoder_model, "decoder_config.json"),
    }
    cfg = UniVLConfig.base(
        text_num_hidden_layers=args.text_num_hidden_layers,
        visual_num_hidden_layers=args.visual_num_hidden_layers,
        cross_num_hidden_layers=args.cross_num_hidden_layers,
        decoder_num_hidden_layers=args.decoder_num_hidden_layers,
        max_words=args.max_words,
        max_frames=args.max_frames,
        video_dim=args.video_dim,
        margin=args.margin,
        hard_negative_rate=args.hard_negative_rate,
        negative_weighting=bool(args.negative_weighting),
        n_pair=args.n_pair,
        use_mil=args.use_mil,
        sampled_use_mil=args.sampled_use_mil,
        stage_two=stage_two or args.stage_two,
        train_sim_after_cross=args.train_sim_after_cross,
        do_pretrain=args.do_pretrain,
        task_type=task_type,
        batch_size_per_device=bs_per_dev,
        compute_dtype=dtype,
        use_pallas=(
            {"xla": False, "pallas": True, "auto": "auto"}[args.attention]
            if getattr(args, "attention", None)
            else (on_tpu and args.use_pallas)
        ),
        use_train_pallas=(
            {"xla": False, "pallas": True, "auto": "auto"}[
                getattr(args, "train_attention", "xla")]
            if on_tpu else False
        ),
        use_fused_ffn=(
            {"xla": False, "pallas": True, "auto": "auto",
             "block": "block", "auto_block": "auto_block"}[
                getattr(args, "fused_ffn", "xla")]
            if on_tpu else False
        ),
        remat=(
            ("dots" if getattr(args, "remat_policy", "full") == "dots" else True)
            if args.remat else False
        ),
        scan_layers=args.scan_layers,
        sequence_parallel=bool(getattr(args, "sequence_parallel", False)),
    )
    # JSON configs replace the defaults, then CLI layer counts re-apply
    # (the reference's update_attr override order).
    jb, jv, jc, jd = (json_overrides[k] for k in ("bert", "visual", "cross", "decoder"))
    if jb is not None:
        cfg = cfg.replace(bert=jb.replace(num_hidden_layers=args.text_num_hidden_layers))
    if jv is not None:
        cfg = cfg.replace(visual=jv.replace(num_hidden_layers=args.visual_num_hidden_layers))
    if jc is not None:
        cfg = cfg.replace(cross=jc.replace(num_hidden_layers=args.cross_num_hidden_layers))
    if jd is not None:
        cfg = cfg.replace(decoder=jd.replace(num_decoder_layers=args.decoder_num_hidden_layers))

    arch = {}
    if args.hidden_size != 768:
        arch.update(hidden_size=args.hidden_size)
    if args.num_attention_heads != 12:
        arch.update(num_attention_heads=args.num_attention_heads)
    if args.intermediate_size != 3072:
        arch.update(intermediate_size=args.intermediate_size)
    bert = cfg.bert.replace(**arch) if arch else cfg.bert
    visual = cfg.visual.replace(**arch) if arch else cfg.visual
    cross = cfg.cross.replace(**arch) if arch else cfg.cross
    decoder = cfg.decoder.replace(**arch) if arch else cfg.decoder
    if vocab_size is not None:
        bert = bert.replace(vocab_size=vocab_size)
        decoder = decoder.replace(vocab_size=vocab_size)
    if args.video_dim != visual.vocab_size:
        visual = visual.replace(vocab_size=args.video_dim)
    if arch or vocab_size is not None or args.video_dim != 1024:
        cfg = cfg.replace(bert=bert, visual=visual, cross=cross, decoder=decoder)
    return cfg.validate()


def load_init_params(args, model, example_batch, logger, template_params=None):
    """Initialize params; overlay --init_model (torch .bin or msgpack).

    ``template_params``: use this pre-built tree instead of model.init —
    callers that exercise methods __call__ doesn't reach (e.g. the serving
    driver's similarity head) pass a union template so checkpoint leaves
    for those heads aren't dropped."""
    import jax

    from univl_tpu.checkpoint.io import restore_checkpoint
    from univl_tpu.checkpoint.torch_convert import (
        convert_torch_state_dict,
        load_torch_bin,
        merge_params,
    )

    if template_params is not None:
        params = template_params
    else:
        variables = jax.jit(
            lambda r: model.init(r, example_batch, deterministic=True)
        )(jax.random.key(args.seed))
        params = variables["params"]
    if args.init_model:
        if ".msgpack" in os.path.basename(args.init_model):
            params, _, missing = restore_checkpoint(
                args.init_model, params, partial=True
            )
            logger.info(
                "restored flax params from %s (%d params left at init%s)",
                args.init_model, len(missing),
                f": {missing[:8]}" if missing else "",
            )
        else:
            from univl_tpu.checkpoint.layout import adapt_layout

            sd = load_torch_bin(args.init_model)
            tree, report = convert_torch_state_dict(sd)
            # converter emits the reference's layer_i layout; re-stack the
            # towers when the model runs with --scan_layers
            tree = adapt_layout(tree, params)
            params, missing = merge_params(params, tree)
            logger.info(
                "converted %d torch params (%d skipped/tied, %d unknown); "
                "%d flax params left at init",
                len(report["converted"]), len(report["skipped"]),
                len(report["unknown"]), len(missing),
            )
            if report["unknown"]:
                logger.info("unknown torch params: %s", report["unknown"][:20])
    return params


def make_trainer(args, model, n_train_batches: int, logger):
    import jax

    from univl_tpu.parallel.mesh import make_mesh
    from univl_tpu.train.optimization import make_univl_optimizer
    from univl_tpu.train.trainer import Trainer

    n_dev = args.n_gpu or len(jax.devices())
    tp = max(1, getattr(args, "tensor_parallel", 1))
    if tp > 1:
        from univl_tpu.parallel.tp import make_mesh_2d

        if n_dev % tp:
            raise ValueError(f"--tensor_parallel {tp} must divide mesh size {n_dev}")
        mesh = make_mesh_2d(n_dev // tp, tp)
    else:
        mesh = make_mesh(n_dev)
    t_total = n_train_batches * args.epochs
    zero1 = bool(getattr(args, "zero1", False))
    opt_kw = dict(
        lr=args.lr,
        t_total=max(t_total, 1),
        warmup_proportion=args.warmup_proportion,
        coef_lr=args.coef_lr,
        state_dtype=(
            args.adam_state_dtype if args.adam_state_dtype != "float32" else None
        ),
    )
    if zero1:
        if tp > 1:
            # zero1 x tp (train/zero1_tp.py): flat dp-scattered path on the
            # tp-replicated leaves, per-leaf adam on the tp-sharded ones
            from univl_tpu.train.zero1_tp import make_univl_zero1_tp_optimizer

            tx = make_univl_zero1_tp_optimizer(dp=n_dev // tp, tp=tp, **opt_kw)
        else:
            from univl_tpu.train.zero1 import make_univl_zero1_optimizer

            tx = make_univl_zero1_optimizer(dp=n_dev, **opt_kw)
    else:
        tx = make_univl_optimizer(**opt_kw)
    trainer = Trainer(
        model, tx, mesh, grad_accum_steps=args.gradient_accumulation_steps,
        zero1=zero1,
    )
    logger.info("mesh: %d device(s) (dp=%d, tp=%d, zero1=%s); t_total=%d",
                n_dev, n_dev // tp, tp, zero1, t_total)
    return trainer


def make_input_iter(args, trainer, batcher, epoch: int, start_batch: int = 0):
    """Epoch input pipeline: host batches -> (optional float cast) ->
    device placement, optionally on a background prefetch thread.
    ``start_batch`` skips that many update-batches (mid-epoch resume)."""
    from univl_tpu.data.batching import cast_floats, prefetch_to_device

    accum = args.gradient_accumulation_steps
    tdtype = getattr(args, "transfer_dtype", "float32")

    def host_iter():
        for b in batcher.epoch(epoch, start_batch=start_batch):
            b = {k: (v if accum > 1 else v[None]) for k, v in b.items()}
            if tdtype != "float32":
                b = cast_floats(b, tdtype)
            yield b

    if getattr(args, "no_prefetch", False):
        return (trainer.shard_batch(b) for b in host_iter())
    # put_in_worker=False keeps all device interaction on the main thread;
    # measured equal to worker-side put end-to-end (docs/PERF.md).
    return prefetch_to_device(
        host_iter(), put=trainer.shard_batch, put_in_worker=False
    )


def make_preempt_flag(args) -> dict:
    """Install the SIGTERM -> flag handler shared by every driver's train
    loop (pretrain + run_train_epochs). Returns the mutable flag dict."""
    preempt = {"hit": False}
    if not getattr(args, "no_preempt_checkpoint", False):
        import signal as _signal

        def _on_term(signum, frame):
            preempt["hit"] = True

        try:
            _signal.signal(_signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread; injection still works
    return preempt


def preempt_hit(args, preempt: dict, steps_since_start: int) -> bool:
    """Check (and fault-inject) the preemption flag after a step."""
    if (
        getattr(args, "inject_preempt_after", 0)
        and steps_since_start >= args.inject_preempt_after
    ):
        preempt["hit"] = True
    return preempt["hit"]


def run_train_epochs(args, trainer, state, batcher, logger, eval_fn=None,
                     select_key=None, select_sign=1.0):
    """Generic epoch loop: train, optionally eval + best-model selection.

    Returns (state, best_metrics). Saves per-epoch checkpoints like the
    reference (pytorch_model.bin.<epoch> -> params.msgpack.<epoch>).

    Preemption (SIGTERM, or --inject_preempt_after for testing): saves the
    full train state with the exact in-epoch offset and exits cleanly;
    --load_checkpoint resumes at the next update-batch, bit-identical to an
    uninterrupted run (batcher order is seeded, the step rng is keyed on
    global_step, best-model tracking is carried in the metadata). The
    reference finetune drivers have no resume at all (main_task_*.py:
    --init_model only).
    """
    import jax

    from univl_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
    from univl_tpu.utils.profiling import StepTimer

    best = None
    best_score = -np.inf
    global_step = 0
    start_epoch, start_step_in_epoch = 0, 0
    ckpt_path = os.path.join(args.output_dir, "train_state.msgpack")
    if getattr(args, "load_checkpoint", False):
        if os.path.exists(ckpt_path):
            state, meta = restore_checkpoint(ckpt_path, state)
            start_epoch = int(meta["epoch"]) + 1
            global_step = int(meta["global_step"])
            start_step_in_epoch = int(meta.get("in_epoch_step", 0))
            if meta.get("best") is not None:
                best = dict(meta["best"])
                best_score = float(meta["best_score"])
            logger.info(
                "resumed from epoch %d, global_step %d (in-epoch offset %d)",
                start_epoch, global_step, start_step_in_epoch,
            )
        else:
            # tolerate (auto-restart loops pass --load_checkpoint
            # unconditionally) but say so LOUDLY — a mistyped --output_dir
            # silently retraining from scratch is worse
            logger.warning(
                "--load_checkpoint: no checkpoint at %s — starting from "
                "scratch", ckpt_path,
            )

    preempt = make_preempt_flag(args)

    def _save_train_state(epoch, in_epoch_step, preempted):
        best_json = None if best is None else {
            k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
            for k, v in best.items()
            if isinstance(v, (int, float, str, np.floating, np.integer))
        }
        meta = {"epoch": epoch - 1 if in_epoch_step else epoch,
                "global_step": global_step,
                "in_epoch_step": in_epoch_step, "preempted": preempted,
                "best": best_json,
                "best_score": None if best is None else float(best_score)}
        save_checkpoint(ckpt_path, state, metadata=meta)

    timer = StepTimer()
    mw = MetricsWriter(args.output_dir)
    # hoisted: constructing jax.random.key per step costs ~3 ms host time
    base_key = jax.random.key(args.seed)
    items_per_step = args.batch_size * args.gradient_accumulation_steps
    profile_dir = getattr(args, "profile_dir", None)
    profiling = False
    prof_steps = 0

    def _stop_profiling():
        nonlocal profiling
        if profiling:
            import jax as _jax

            _jax.profiler.stop_trace()
            profiling = False
            logger.info("profiler trace written to %s", profile_dir)

    steps_at_start = global_step
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        # loss accumulates ON DEVICE: fetching it every step would force a
        # host sync per step (a full pipeline stall; ~25 ms RTT on tunneled
        # backends). We only sync at n_display boundaries and epoch end.
        loss_sum, n_steps = None, 0
        epoch_offset = start_step_in_epoch if epoch == start_epoch else 0
        it = make_input_iter(args, trainer, batcher, epoch,
                             start_batch=epoch_offset)
        for step, batch in enumerate(it):
            if profile_dir and epoch == 0 and step == 2 and not profiling:
                import jax as _jax

                _jax.profiler.start_trace(profile_dir)
                profiling = True
            state, metrics = trainer.train_step(
                state, batch, jax.random.fold_in(base_key, global_step)
            )
            global_step += 1
            n_steps += 1
            loss_sum = metrics["loss"] if loss_sum is None else loss_sum + metrics["loss"]
            timer.tick(items_per_step)
            if preempt_hit(args, preempt, global_step - steps_at_start):
                # stop BEFORE the checkpoint+exit: every return path must
                # close the trace or the profiler stays running and the
                # trace never reaches disk
                _stop_profiling()
                _save_train_state(epoch, epoch_offset + n_steps, True)
                logger.info(
                    "preempted at epoch %d step %d: checkpoint saved, exiting",
                    epoch + 1, global_step,
                )
                mw.close()
                return state, best
            if profiling:
                # counter-based window (5 captured steps): the old
                # `step == 7` check never fired when epoch 0 had fewer
                # than 8 steps, leaving the profiler running forever
                prof_steps += 1
                if prof_steps >= 5:
                    _stop_profiling()
            if global_step % args.n_display == 0:
                disp_loss = float(metrics["loss"])
                logger.info(
                    "Epoch %d/%d Step %d Loss %.6f Time/step %.3f (%.0f clips/s)",
                    epoch + 1, args.epochs, global_step, disp_loss,
                    timer.ema or 0.0, timer.items_per_sec,
                )
                mw.write("train", epoch=epoch, step=global_step, loss=disp_loss,
                         clips_per_sec=timer.items_per_sec)
        total_loss = float(loss_sum) if loss_sum is not None else 0.0
        logger.info("Epoch %d done: mean loss %.6f (%.1fs)",
                    epoch + 1, total_loss / max(n_steps, 1), time.time() - t0)
        mw.write("epoch", epoch=epoch, mean_loss=total_loss / max(n_steps, 1),
                 seconds=time.time() - t0, steps=n_steps)

        # A SIGTERM that landed between the last step and here (or that
        # would otherwise wait out a minutes-long eval) must save NOW —
        # preemption grace windows are typically 30-90s.
        if preempt["hit"]:
            _stop_profiling()
            _save_train_state(epoch, epoch_offset + n_steps, True)
            logger.info("preempted at epoch %d end: checkpoint saved, "
                        "exiting before eval", epoch + 1)
            mw.close()
            return state, best

        ckpt = os.path.join(args.output_dir, f"params.msgpack.{epoch}")
        save_checkpoint(ckpt, state.params,
                        metadata={"epoch": epoch, "global_step": global_step})

        if eval_fn is not None:
            metrics = eval_fn(state.params, epoch)
            score = select_sign * metrics[select_key]
            if score > best_score:
                best_score = score
                best = dict(metrics, epoch=epoch)
                save_checkpoint(
                    os.path.join(args.output_dir, "best.msgpack"), state.params,
                    metadata={"epoch": epoch, "metrics": {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}},
                )
            logger.info("Eval epoch %d: %s", epoch + 1, metrics)
            mw.write("eval", epoch=epoch,
                     **{k: v for k, v in metrics.items()
                        if isinstance(v, (int, float))})
        if not getattr(args, "no_preempt_checkpoint", False):
            # full train state (params + optimizer + best tracking) so a
            # kill between epochs also resumes exactly
            _save_train_state(epoch, 0, False)
    _stop_profiling()
    if best is not None:
        logger.info("Best: %s", best)
    mw.close()
    return state, best
