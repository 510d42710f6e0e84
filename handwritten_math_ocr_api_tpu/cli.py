"""Command-line interface for the framework.

One argparse CLI replaces the reference's scattered script entry points:
``build-vocab`` (src/build_vocab.py), ``train`` (src/main.py + src/train.py),
``evaluate`` (src/test_model.py), ``predict`` (src/predict.py),
``render-inkml`` (missing in the reference — README.md:55-57),
``serve`` (app uvicorn entry), ``make-synthetic`` (new, hermetic testing).

Usage: python -m handwritten_math_ocr_api_tpu <command> [options]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _common_data_args(p):
    p.add_argument("--data-root", default=os.environ.get(
        "MATHOCR_DATA_ROOT", "data"))
    p.add_argument("--checkpoint-dir", default=os.environ.get(
        "MATHOCR_CKPT_DIR", "checkpoints"))
    p.add_argument("--model-overrides", default=None,
                   help="JSON dict of ModelConfig field overrides, e.g. "
                        '\'{"d_model": 64, "num_decoder_layers": 2}\'; '
                        '"swin" may be a nested dict of SwinConfig fields')


def _model_config(args, vocab_size: int):
    import json

    from .core.config import ModelConfig, SwinConfig

    cfg = ModelConfig(encoder=args.encoder, vocab_size=vocab_size)
    if getattr(args, "model_overrides", None):
        raw = json.loads(args.model_overrides)
        if "swin" in raw:
            sw = dict(raw.pop("swin"))
            for key in ("depths", "num_heads"):
                if key in sw:
                    sw[key] = tuple(sw[key])
            cfg = cfg.replace(swin=SwinConfig(**sw))
        cfg = cfg.replace(**raw)
    return cfg


def cmd_build_vocab(args) -> int:
    from .core.tokenizer import create_vocab_from_csvs, save_vocab

    paths = [os.path.join(args.data_root, "train_labels.csv")]
    if args.include_val:
        paths.append(os.path.join(args.data_root, "validate_labels.csv"))
    vocab = create_vocab_from_csvs(paths)
    out = os.path.join(args.checkpoint_dir, "vocab.json")
    save_vocab(vocab, out)
    print(f"vocab: {len(vocab)} tokens -> {out}")
    return 0


def cmd_train(args) -> int:
    from .core.config import Config, DataConfig, ModelConfig, TrainConfig
    from .core.tokenizer import Tokenizer, load_vocab, save_vocab
    from .data.dataset import DataLoader, get_data_loaders
    from .train.loop import train_model

    if args.synthetic_stream:
        # infinite-variety streaming corpus: fix the vocab from the grammar
        from .data.synthetic import SyntheticStreamDataset, grammar_vocab

        vpath = os.path.join(args.checkpoint_dir, "vocab.json")
        gvocab = grammar_vocab(rich=getattr(args, "stream_hard", False),
                               envs=getattr(args, "stream_envs", False))
        if args.resume_from and os.path.exists(vpath):
            # fine-tune: keep the checkpoint's token ids stable (an
            # extend-vocab artifact appends new tokens after the old
            # ids, which a fresh grammar_vocab would re-sort)
            vocab, idx2char = load_vocab(vpath)
            missing = sorted(set(gvocab) - set(vocab))
            if missing:
                print(f"warning: stream grammar emits tokens absent from "
                      f"the checkpoint vocab (will encode as <unk>): "
                      f"{missing}; run extend-vocab first", file=sys.stderr)
        else:
            vocab = gvocab
            save_vocab(vocab, vpath)
            idx2char = {i: t for t, i in vocab.items()}
    else:
        vocab, idx2char = load_vocab(
            os.path.join(args.checkpoint_dir, "vocab.json"))
    tok = Tokenizer(vocab, idx2char)
    cfg = Config(
        model=_model_config(args, len(vocab)),
        data=DataConfig(data_root=args.data_root,
                        batch_size=args.batch_size),
        train=TrainConfig(checkpoint_dir=args.checkpoint_dir,
                          epochs=args.epochs,
                          learning_rate=args.learning_rate,
                          warmup_steps=args.warmup_steps,
                          early_stop_patience=args.early_stop_patience,
                          ema_decay=getattr(args, "ema_decay", 0.0)),
    )
    if args.synthetic_stream:
        mc = cfg.model
        if getattr(args, "stream_renderer", "typeset") == "stroke":
            from .data.strokes import StrokeStreamDataset as StreamDS
        else:
            StreamDS = SyntheticStreamDataset
        hard = {}
        if getattr(args, "stream_hard", False):
            # MathWriting-difficulty regime (VERDICT r3 item 2): extended
            # symbol inventory, longer/deeper formulas, denser layouts,
            # heavier ink degradation (stroke renderer only)
            hard = dict(rich=True, max_tokens=args.stream_max_tokens,
                        max_terms=8, depth=3)
            if getattr(args, "stream_renderer", "typeset") == "stroke":
                hard["degrade"] = args.stream_degrade
        if getattr(args, "stream_envs", False):
            hard["envs"] = True
        if getattr(args, "stream_native_render", False):
            if getattr(args, "stream_renderer", "typeset") != "stroke":
                raise SystemExit("--stream-native-render requires "
                                 "--stream-renderer stroke")
            hard["native"] = True
        mk = lambda n, seed, freeze: DataLoader(
            StreamDS(tok, n, mc.img_h, mc.img_w,
                     mc.max_seq_len, seed=seed, freeze=freeze, **hard),
            cfg.data.batch_size, shuffle=False,
            num_workers=cfg.data.num_workers, drop_remainder=True)
        train_loader = mk(args.synthetic_stream, 0, False)
        val_loader = mk(max(args.batch_size * 16, 1024), 777, True)
    else:
        train_loader, val_loader = get_data_loaders(tok, cfg.data, cfg.model)
    train_model(cfg, train_loader, val_loader, tok,
                resume_from=args.resume_from,
                mlflow_experiment=args.mlflow_experiment,
                init_from=getattr(args, "init_from", None),
                freeze_encoder_epochs=getattr(args, "freeze_encoder_epochs",
                                              0),
                encoder_lr_mult=getattr(args, "encoder_lr_mult", 1.0))
    return 0


def cmd_evaluate(args) -> int:
    from .core.config import Config, DataConfig, DecodeConfig, ModelConfig
    from .core.tokenizer import Tokenizer, load_vocab
    from .data.dataset import get_test_loader
    from .decode.api import DecodeEngine
    from .eval.harness import evaluate_model, save_results
    from .train.checkpoint import load_checkpoint
    from .train.step import create_train_state

    import jax

    vocab, idx2char = load_vocab(
        os.path.join(args.checkpoint_dir, "vocab.json"))
    tok = Tokenizer(vocab, idx2char)
    mc = _model_config(args, len(vocab))
    dc = DataConfig(data_root=args.data_root, batch_size=args.batch_size)
    tc = Config().train
    if getattr(args, "use_ema", False):
        import dataclasses
        tc = dataclasses.replace(tc, ema_decay=0.999)  # allocate the shadow
    state, _ = create_train_state(jax.random.PRNGKey(0), mc, tc)
    state, _meta = load_checkpoint(args.checkpoint_dir, args.checkpoint,
                                   state, params_only=True)
    engine = DecodeEngine(state.eval_params, state.model_state, mc,
                          DecodeConfig(), tok,
                          use_fused=getattr(args, "use_fused", False),
                          quantize=getattr(args, "quantize", False),
                          constrained=getattr(args, "constrained", False))
    if (getattr(args, "constrained", False) and args.beam_size
            and args.beam_size > 1):
        print("warning: --constrained applies to the greedy path only; "
              "beam search evaluates UNCONSTRAINED", file=sys.stderr)
    loader = get_test_loader(tok, dc, mc)
    results = evaluate_model(engine, loader, tok,
                             beam_size=args.beam_size)
    save_results(results, args.out_dir)
    s = results["summary"]
    print(f"accuracy={s['accuracy']:.4f} cer={s['corpus_cer']:.4f} "
          f"bleu={s['bleu']:.4f} ({s['images_per_sec']:.1f} img/s)")
    return 0


def cmd_predict(args) -> int:
    from .core.config import Config, DecodeConfig, ModelConfig
    from .core.tokenizer import Tokenizer, load_vocab
    from .data.preprocess import preprocess_file
    from .decode.api import DecodeEngine
    from .train.checkpoint import load_checkpoint
    from .train.step import create_train_state

    import jax

    vocab, idx2char = load_vocab(
        os.path.join(args.checkpoint_dir, "vocab.json"))
    tok = Tokenizer(vocab, idx2char)
    mc = _model_config(args, len(vocab))
    tc = Config().train
    if getattr(args, "use_ema", False):
        import dataclasses
        tc = dataclasses.replace(tc, ema_decay=0.999)  # allocate the shadow
    state, _ = create_train_state(jax.random.PRNGKey(0), mc, tc)
    state, _meta = load_checkpoint(args.checkpoint_dir, args.checkpoint,
                                   state, params_only=True)
    engine = DecodeEngine(state.eval_params, state.model_state, mc,
                          DecodeConfig(), tok,
                          constrained=getattr(args, "constrained", False))
    img = preprocess_file(args.image, mc)
    sampled = (getattr(args, "temperature", None)
               or getattr(args, "top_k", None)
               or getattr(args, "top_p", None))
    if (getattr(args, "constrained", False)
            and (sampled or (args.beam_size and args.beam_size > 1))):
        print("warning: --constrained applies to the greedy path only; "
              "beam/sampled decodes run UNCONSTRAINED", file=sys.stderr)
    if args.beam_size and args.beam_size > 1:
        out = engine.predict_batch(img, beam_size=args.beam_size)[0]
        print("Predicted LaTeX:", out)
    elif sampled:
        latex, conf = engine.predict_single_sampled(
            img[0], temperature=getattr(args, "temperature", None) or 1.0,
            top_k=getattr(args, "top_k", None) or 0,
            top_p=getattr(args, "top_p", None) or 1.0,
            seed=getattr(args, "seed", 0))
        print("Predicted LaTeX:", latex)
        print(f"Confidence: {conf:.4f}")
    else:
        latex, conf = engine.predict_single(img[0])
        print("Predicted LaTeX:", latex)
        print(f"Confidence: {conf:.4f}")
    return 0


def cmd_render_inkml(args) -> int:
    from .data.inkml import render_inkml_dir

    n = render_inkml_dir(args.inkml_dir, args.out_img_dir, args.out_csv,
                         limit=args.limit)
    print(f"rendered {n} inkml files -> {args.out_img_dir}")
    return 0


def cmd_make_synthetic(args) -> int:
    from .data.synthetic import make_synthetic_dataset

    make_synthetic_dataset(
        args.data_root,
        splits=(("train", args.train), ("validate", args.val),
                ("test", args.test)))
    print(f"synthetic dataset -> {args.data_root}")
    return 0


def cmd_make_corpus(args) -> int:
    kw = {}
    if getattr(args, "renderer", "typeset") == "stroke":
        from .data.strokes import make_stroke_corpus as mk

        if getattr(args, "hard", False):
            # MathWriting-difficulty regime (matches train --stream-hard)
            kw = dict(rich=True, max_tokens=args.max_tokens, max_terms=8,
                      depth=3, degrade=args.degrade)
        if getattr(args, "envs", False):
            kw["envs"] = True
    else:
        from .data.synthetic import make_corpus as mk

        if getattr(args, "hard", False):
            raise SystemExit("--hard requires --renderer stroke")
        if getattr(args, "envs", False):
            raise SystemExit("--envs requires --renderer stroke")

    mk(args.data_root, n_train=args.train, n_val=args.val,
       n_test=args.test, seed=args.seed, **kw)
    print(f"learnable corpus ({args.train}/{args.val}/{args.test}, "
          f"{getattr(args, 'renderer', 'typeset')}) -> {args.data_root}")
    return 0


def cmd_extend_vocab(args) -> int:
    """Append tokens to a checkpoint's vocab and resize its decoder head
    (train/vocab_extend.py) so an env-less model can be fine-tuned on an
    env-bearing stream (--stream-envs) without a from-scratch retrain."""
    from .core.tokenizer import load_vocab
    from .train.vocab_extend import extend_checkpoint

    vocab, _ = load_vocab(os.path.join(args.checkpoint_dir, "vocab.json"))
    mc = _model_config(args, len(vocab))
    tokens = args.tokens.split(",") if args.tokens else None
    path, added = extend_checkpoint(args.checkpoint_dir, args.checkpoint,
                                    args.out_dir, mc, new_tokens=tokens,
                                    seed=args.seed)
    print(f"extended checkpoint -> {path} (+{len(added)} tokens: "
          f"{' '.join(added)})")
    return 0


def cmd_convert_gqa(args) -> int:
    """Mean-pool a trained MHA checkpoint's self-attention K/V heads into
    nhead_kv groups (GQA/MQA uptraining init; train/gqa_convert.py)."""
    from .core.tokenizer import load_vocab
    from .train.gqa_convert import convert_to_gqa

    vocab, _ = load_vocab(os.path.join(args.checkpoint_dir, "vocab.json"))
    mc = _model_config(args, len(vocab))
    path, cfg_new = convert_to_gqa(args.checkpoint_dir, args.checkpoint,
                                   args.out_dir, mc, args.nhead_kv)
    print(f"GQA checkpoint -> {path} (nhead_kv={cfg_new.nhead_kv}, "
          f"self-KV cache /{mc.nhead // cfg_new.kv_heads})")
    return 0


def cmd_convert(args) -> int:
    """Reference PyTorch .pth -> serving artifact directory."""
    from .compat.torch_convert import convert_checkpoint
    from .core.tokenizer import load_vocab
    from .train.checkpoint import save_params_for_serving

    vocab, _ = load_vocab(args.vocab)
    cfg = _model_config(args, len(vocab))
    params, bn_state = convert_checkpoint(args.pth, cfg)
    out = save_params_for_serving(args.out_dir, params, vocab, cfg,
                                  model_state=bn_state)
    print(f"serving artifact -> {out}")
    return 0


def cmd_convert_encoder(args) -> int:
    """Raw torchvision swin_t .pth (ImageNet weights) -> encoder-only
    artifact for ``train --init-from`` (1-channel patch-embed surgery
    applied; reference: src/model_swin.py:19-34)."""
    from .compat.torch_convert import (
        convert_torchvision_swin, load_torch_state_dict,
    )
    from .core.config import ModelConfig
    from .train.checkpoint import save_params_for_serving

    cfg = ModelConfig(encoder="swin_t")
    sd = load_torch_state_dict(args.pth)
    enc = convert_torchvision_swin(sd, cfg)
    # encoder-only artifact: specials-only vocab placeholder (this
    # artifact initializes training, it does not serve)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    out = save_params_for_serving(args.out_dir, {"encoder": enc}, vocab,
                                  cfg)
    print(f"encoder artifact -> {out}")
    return 0


def cmd_export(args) -> int:
    """Training checkpoint -> serving artifact directory (params + vocab +
    model config; the deploy-time handoff the reference did by copying a
    pickled .pth into app/trained-model/ — app/trained-model/README.md)."""
    from .core.config import Config
    from .core.tokenizer import load_vocab
    from .train.checkpoint import load_checkpoint, save_params_for_serving
    from .train.step import create_train_state

    import jax

    vocab, _ = load_vocab(os.path.join(args.checkpoint_dir, "vocab.json"))
    mc = _model_config(args, len(vocab))
    tc = Config().train
    if args.use_ema:
        import dataclasses
        tc = dataclasses.replace(tc, ema_decay=0.999)  # allocate the shadow
    state, _ = create_train_state(jax.random.PRNGKey(0), mc, tc)
    state, _meta = load_checkpoint(args.checkpoint_dir, args.checkpoint,
                                   state, params_only=True)
    out = save_params_for_serving(args.out_dir, state.eval_params, vocab,
                                  mc, model_state=state.model_state)
    kind = "ema" if (args.use_ema and state.ema_params is not None) else "raw"
    print(f"serving artifact ({kind} weights) -> {out}")
    return 0


def cmd_calibrate(args) -> int:
    """Fit a confidence calibrator from an eval CSV (eval/calibration.py).

    Input: test_results.csv written by ``evaluate`` (greedy), which carries
    per-sample confidence + exact_match. Output: calibration.json that the
    serving layer auto-applies from the model dir. The reference never
    validated its served confidence (app/src/im2latex.py:50,55)."""
    import csv as _csv

    from .eval import calibration as calib

    conf, correct = [], []
    with open(args.results) as f:
        for row in _csv.DictReader(f):
            c = row.get("confidence", "")
            if c in ("", "None", None):
                continue
            conf.append(float(c))
            correct.append(row["exact_match"].strip().lower() == "true")
    if len(conf) < 10:
        print(f"need >=10 samples with confidence, got {len(conf)} "
              f"(run `evaluate` greedy — beam rows carry no confidence)")
        return 1
    art = calib.fit(conf, correct, method=args.method, n_bins=args.bins)
    calib.save(art, args.out)
    print(f"fit {args.method} on {art['n_samples']} samples: "
          f"ECE {art['ece_raw']:.4f} -> {art['ece_calibrated']:.4f} "
          f"({args.bins} bins) -> {args.out}")
    for r in art["reliability_calibrated"]:
        print(f"  [{r['bin_lo']:.1f},{r['bin_hi']:.1f}) n={r['count']:<5d} "
              f"conf={r['mean_confidence']:.3f} acc={r['accuracy']:.3f}")
    return 0


def cmd_serve(args) -> int:
    from .serve.app import run_server

    run_server(model_dir=args.model_dir, host=args.host, port=args.port)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="handwritten_math_ocr_api_tpu",
        description="TPU-native handwritten math OCR framework")
    sub = p.add_subparsers(dest="command", required=True)

    bv = sub.add_parser("build-vocab", help="build vocab.json from labels")
    _common_data_args(bv)
    bv.add_argument("--include-val", action="store_true")
    bv.set_defaults(fn=cmd_build_vocab)

    tr = sub.add_parser("train", help="train a model")
    _common_data_args(tr)
    tr.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    tr.add_argument("--batch-size", type=int, default=64)
    tr.add_argument("--epochs", type=int, default=20)
    tr.add_argument("--learning-rate", type=float, default=3e-4)
    tr.add_argument("--warmup-steps", type=int, default=0)
    tr.add_argument("--early-stop-patience", type=int, default=5)
    tr.add_argument("--synthetic-stream", type=int, default=0, metavar="N",
                    help="train on an infinite synthetic stream, N samples "
                         "per epoch (fresh formulas every epoch; vocab "
                         "fixed from the grammar)")
    tr.add_argument("--stream-renderer", default="typeset",
                    choices=["typeset", "stroke"],
                    help="synthetic-stream pixels: 'typeset' (font-rendered "
                         "LaTeX source) or 'stroke' (handwriting-style "
                         "structural layout, data/strokes.py — the "
                         "MathWriting difficulty regime)")
    tr.add_argument("--stream-hard", action="store_true",
                    help="MathWriting-difficulty stream: extended symbol "
                         "inventory (uppercase/full greek/set ops, ~100 "
                         "glyph classes), longer/deeper formulas, denser "
                         "layouts and heavier ink degradation")
    tr.add_argument("--stream-max-tokens", type=int, default=60,
                    help="--stream-hard: formula length cap in tokens")
    tr.add_argument("--stream-native-render", action="store_true",
                    help="stroke renderer: use the C++ display-list "
                         "backend (native/src/stroke_render.cpp, ~6x "
                         "faster on a 1-CPU host; same distribution, "
                         "different RNG stream)")
    tr.add_argument("--stream-envs", action="store_true",
                    help="stream 2-D LaTeX environments (\\begin{matrix|"
                         "pmatrix|bmatrix|vmatrix|cases} grids, ~14%% of "
                         "formulas); fine-tuning an env-less checkpoint "
                         "needs extend-vocab first")
    tr.add_argument("--stream-degrade", type=float, default=0.6,
                    help="--stream-hard + stroke renderer: ink degradation "
                         "strength in [0,1]")
    tr.add_argument("--ema-decay", type=float, default=0.0,
                    help="EMA decay for a shadow copy of the weights "
                         "(0 = off); val metrics and the best artifact "
                         "then use the EMA weights")
    tr.add_argument("--resume-from", default=None)
    tr.add_argument("--mlflow-experiment", default=None)
    tr.add_argument("--init-from", default=None, metavar="ARTIFACT_DIR",
                    help="initialize shape-compatible param subtrees from a "
                         "converted checkpoint artifact (convert-checkpoint "
                         "/ convert-encoder) — the reference's pretrained-"
                         "encoder fine-tune posture (src/model_swin.py:17)")
    tr.add_argument("--freeze-encoder-epochs", type=int, default=0,
                    help="hold the encoder fixed for the first N epochs")
    tr.add_argument("--encoder-lr-mult", type=float, default=1.0,
                    help="scale encoder updates (exact per-subtree LR "
                         "split under Adam); 1.0 = shared LR")
    tr.set_defaults(fn=cmd_train)

    ev = sub.add_parser("evaluate", help="evaluate on the test split")
    _common_data_args(ev)
    ev.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    ev.add_argument("--checkpoint", default="best_model")
    ev.add_argument("--batch-size", type=int, default=64)
    ev.add_argument("--beam-size", type=int, default=None)
    ev.add_argument("--use-fused", action="store_true",
                    help="greedy decode via the fused Pallas megakernel")
    ev.add_argument("--use-ema", action="store_true",
                    help="evaluate the EMA weights of an --ema-decay "
                         "checkpoint (falls back to raw weights if the "
                         "checkpoint has no EMA shadow)")
    ev.add_argument("--quantize", action="store_true",
                    help="int8 decoder weights (in-kernel dequant with "
                         "--use-fused, ops/quant.py path otherwise)")
    ev.add_argument("--constrained", action="store_true",
                    help="pushdown-constrained greedy decode: structurally "
                         "valid LaTeX by construction (decode/constrain.py)."
                         " Greedy only (beam runs unconstrained). Env names"
                         " are limited to single tokens: \\begin{align*} "
                         "('align' '*') is unreachable under constraint")
    ev.add_argument("--out-dir", default="results")
    ev.set_defaults(fn=cmd_evaluate)

    pr = sub.add_parser("predict", help="predict one image")
    _common_data_args(pr)
    pr.add_argument("image")
    pr.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    pr.add_argument("--checkpoint", default="best_model")
    pr.add_argument("--beam-size", type=int, default=None)
    pr.add_argument("--use-ema", action="store_true")
    pr.add_argument("--constrained", action="store_true",
                    help="pushdown-constrained greedy decode (valid LaTeX "
                         "by construction). Greedy only — beam/sampling "
                         "flags run unconstrained (a warning is printed). "
                         "Multi-token env names (\\begin{align*}) are "
                         "unreachable under constraint")
    pr.add_argument("--temperature", type=float, default=None,
                    help="sampled decode temperature (enables sampling)")
    pr.add_argument("--top-k", type=int, default=None,
                    help="sampled decode top-k filter")
    pr.add_argument("--top-p", type=float, default=None,
                    help="sampled decode nucleus filter")
    pr.add_argument("--seed", type=int, default=0)
    pr.set_defaults(fn=cmd_predict)

    ri = sub.add_parser("render-inkml", help="rasterize InkML to PNGs+CSV")
    ri.add_argument("inkml_dir")
    ri.add_argument("out_img_dir")
    ri.add_argument("out_csv")
    ri.add_argument("--limit", type=int, default=None)
    ri.set_defaults(fn=cmd_render_inkml)

    ms = sub.add_parser("make-synthetic", help="generate synthetic dataset")
    ms.add_argument("--data-root", default="data")
    ms.add_argument("--train", type=int, default=256)
    ms.add_argument("--val", type=int, default=64)
    ms.add_argument("--test", type=int, default=64)
    ms.set_defaults(fn=cmd_make_synthetic)

    mc = sub.add_parser("make-corpus",
                        help="generate a production-scale learnable corpus "
                             "(images depict their labels)")
    mc.add_argument("--data-root", default="data")
    mc.add_argument("--train", type=int, default=20000)
    mc.add_argument("--val", type=int, default=1000)
    mc.add_argument("--test", type=int, default=1000)
    mc.add_argument("--seed", type=int, default=0)
    mc.add_argument("--renderer", default="typeset",
                    choices=["typeset", "stroke"],
                    help="'stroke' = handwriting-style structural renders "
                         "(data/strokes.py)")
    mc.add_argument("--hard", action="store_true",
                    help="stroke renderer: MathWriting-difficulty regime "
                         "(extended inventory, longer formulas, denser "
                         "layouts, ink degradation; matches train "
                         "--stream-hard)")
    mc.add_argument("--max-tokens", type=int, default=60,
                    help="--hard: formula length cap")
    mc.add_argument("--degrade", type=float, default=0.6,
                    help="--hard: ink degradation strength in [0,1]")
    mc.add_argument("--envs", action="store_true",
                    help="include 2-D environment formulas (stroke "
                         "renderer only)")
    mc.set_defaults(fn=cmd_make_corpus)

    xv = sub.add_parser("extend-vocab",
                        help="append tokens to a checkpoint's vocab and "
                             "resize its decoder head for fine-tuning")
    xv.add_argument("--checkpoint-dir", required=True)
    xv.add_argument("--checkpoint", default="best_model")
    xv.add_argument("--out-dir", required=True)
    xv.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    xv.add_argument("--model-overrides", default=None,
                    help="JSON ModelConfig overrides of the SOURCE model")
    xv.add_argument("--tokens", default=None,
                    help="comma-separated tokens to add (default: the 2-D "
                         "environment inventory, data.synthetic.ENV_TOKENS)")
    xv.add_argument("--seed", type=int, default=0)
    xv.set_defaults(fn=cmd_extend_vocab)

    gq = sub.add_parser("convert-gqa",
                        help="mean-pool MHA K/V heads into nhead_kv "
                             "groups for GQA fine-tuning")
    gq.add_argument("--checkpoint-dir", required=True)
    gq.add_argument("--checkpoint", default="best_model")
    gq.add_argument("--out-dir", required=True)
    gq.add_argument("--nhead-kv", type=int, required=True)
    gq.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    gq.add_argument("--model-overrides", default=None,
                    help="JSON ModelConfig overrides of the SOURCE model")
    gq.set_defaults(fn=cmd_convert_gqa)

    cv = sub.add_parser("convert-checkpoint",
                        help="convert a reference PyTorch .pth to a "
                             "serving artifact")
    cv.add_argument("pth")
    cv.add_argument("vocab", help="path to vocab.json")
    cv.add_argument("out_dir")
    cv.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    cv.add_argument("--model-overrides", default=None)
    cv.set_defaults(fn=cmd_convert)

    ce = sub.add_parser("convert-encoder",
                        help="convert a raw torchvision swin_t .pth "
                             "(ImageNet) to an encoder-only artifact for "
                             "train --init-from")
    ce.add_argument("pth")
    ce.add_argument("out_dir")
    ce.set_defaults(fn=cmd_convert_encoder)

    ex = sub.add_parser("export",
                        help="training checkpoint -> serving artifact")
    _common_data_args(ex)
    ex.add_argument("out_dir")
    ex.add_argument("--encoder", default="swin_t",
                    choices=["swin_t", "resnet18", "res18trans"])
    ex.add_argument("--checkpoint", default="best_model")
    ex.add_argument("--use-ema", action="store_true",
                    help="export the EMA shadow weights when present")
    ex.set_defaults(fn=cmd_export)

    ca = sub.add_parser("calibrate",
                        help="fit a confidence calibrator from eval CSV")
    ca.add_argument("--results", required=True,
                    help="test_results.csv from `evaluate` (greedy)")
    ca.add_argument("--out", default="calibration.json")
    ca.add_argument("--method", default="platt",
                    choices=["platt", "isotonic"])
    ca.add_argument("--bins", type=int, default=10)
    ca.set_defaults(fn=cmd_calibrate)

    sv = sub.add_parser("serve", help="run the serving API")
    sv.add_argument("--model-dir", default="trained-model")
    sv.add_argument("--host", default="0.0.0.0")
    sv.add_argument("--port", type=int, default=8080)
    sv.set_defaults(fn=cmd_serve)

    return p


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
