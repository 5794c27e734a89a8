"""Command-line trainer (the reference's standalone path,
python/xvapitch/main.py + fastpitch1_1/xva_train.py __main__ harness).

Usage:
    python -m xva_trainer_tpu.cli train-v3 --dataset D --output O [--lang en]
    python -m xva_trainer_tpu.cli train-v2 --dataset D --output O
    python -m xva_trainer_tpu.cli tts --ckpt DIR --text "..." --out out.wav
    python -m xva_trainer_tpu.cli tool formatting --in D --out O
    python -m xva_trainer_tpu.cli serve [--http-port 8002 --ws-port 8001]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys


def cmd_train_v3(args):
    from .data.text import v3_text_to_ids
    from .data.xva_dataset import XvaBatcher, XvaFeatureCache, get_dataset_embedding
    from .train.xvapitch_trainer import XVAPitchTrainer, XvaTrainConfig

    # same tokenizer the server / cli tts use — train and inference must agree
    tp = v3_text_to_ids(args.lang)
    cache = XvaFeatureCache(args.dataset, tp, lang=args.lang)
    print("building feature cache...")
    cache.build(progress=lambda d, t: print(f"\r{d}/{t}", end=""))
    emb = get_dataset_embedding(args.dataset)
    batcher = XvaBatcher([cache], batch_size=args.batch_size, d_vector=emb["main"])
    cfg = XvaTrainConfig(output_dir=args.output, batch_size=args.batch_size,
                         target_bs=args.target_bs)
    trainer = XVAPitchTrainer(batcher, cfg)
    trainer.setup(resume=not args.no_resume)
    result = trainer.train(max_steps=args.max_steps)
    print(json.dumps(result))
    voice = os.path.basename(args.dataset.rstrip("/"))
    print("exported:", trainer.export(voice, lang=args.lang,
                                      base_emb=emb["main"],
                                      other_embs=emb["others"].tolist()))


def cmd_train_v2(args):
    from .train.pipeline import PipelineConfig, train_v2_pipeline

    cfg = PipelineConfig(
        dataset_path=args.dataset, output_path=args.output,
        batch_size=args.batch_size, target_bs=args.target_bs,
        voice_name=os.path.basename(args.dataset.rstrip("/")),
    )
    print(json.dumps(train_v2_pipeline(cfg, max_iters=args.max_steps)))


def cmd_tts(args):
    from .app.server import AppServer

    server = AppServer(logger=_null_logger())
    wav = server._synthesize_v3(args.ckpt, None, args.text)
    from .data.audio_io import save_wav
    from .ops.loudness import normalize_ebu_r128

    save_wav(args.out, normalize_ebu_r128(wav, 22050))
    print("wrote", args.out)


def cmd_tool(args):
    from .tools import TOOL_REGISTRY

    tool = TOOL_REGISTRY[args.tool]()
    data = {"inPath": args.inp, "outputDirectory": args.out}
    if args.settings:
        data["toolSettings"] = json.loads(args.settings)
    # run() (not runTask()) so failures PROPAGATE — runTask reports errors
    # to a websocket we don't have and would exit 0 on failure
    asyncio.run(tool.run(data))
    print("done")


def cmd_import_whisper(args):
    """Out-of-box ASR story (the reference ships whisper {size}.pt binaries
    with its installer — python/transcribe/model.py:144-171; this repo can't
    redistribute them, so this converter + a one-line download recipe is the
    equivalent): convert any OpenAI whisper .pt or HuggingFace whisper dir
    into the local layout the transcribe tool consumes."""
    from .interop.whisper_map import import_whisper_checkpoint

    path = import_whisper_checkpoint(args.src, args.out)
    print(f"wrote {path}")
    print("use it with either:")
    print(f"  export XVA_WHISPER_CKPT={path}")
    print(f"  cli tool transcribe --in D --out O "
          f"--settings '{{\"modelPath\": \"{path}\"}}'")


def cmd_serve(args):
    from .app.server import AppServer

    server = AppServer(args.http_port, args.ws_port)
    asyncio.run(server.serve_with_http())


def _null_logger():
    import logging

    lg = logging.getLogger("cli")
    lg.addHandler(logging.StreamHandler())
    return lg


def main(argv=None):
    ap = argparse.ArgumentParser(prog="xva_trainer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t3 = sub.add_parser("train-v3")
    t3.add_argument("--dataset", required=True)
    t3.add_argument("--output", required=True)
    t3.add_argument("--lang", default="en")
    t3.add_argument("--batch-size", type=int, default=64, dest="batch_size")
    t3.add_argument("--target-bs", type=int, default=400, dest="target_bs")
    t3.add_argument("--max-steps", type=int, default=None, dest="max_steps")
    t3.add_argument("--no-resume", action="store_true")
    t3.set_defaults(fn=cmd_train_v3)

    t2 = sub.add_parser("train-v2")
    t2.add_argument("--dataset", required=True)
    t2.add_argument("--output", required=True)
    t2.add_argument("--batch-size", type=int, default=32, dest="batch_size")
    t2.add_argument("--target-bs", type=int, default=256, dest="target_bs")
    t2.add_argument("--max-steps", type=int, default=None, dest="max_steps")
    t2.set_defaults(fn=cmd_train_v2)

    ts = sub.add_parser("tts")
    ts.add_argument("--ckpt", required=True)
    ts.add_argument("--text", default="This is what my voice sounds like.")
    ts.add_argument("--out", default="out.wav")
    ts.set_defaults(fn=cmd_tts)

    tl = sub.add_parser("tool")
    tl.add_argument("tool")
    tl.add_argument("--in", dest="inp", required=True)
    tl.add_argument("--out", required=True)
    tl.add_argument("--settings", default=None)
    tl.set_defaults(fn=cmd_tool)

    iw = sub.add_parser("import-whisper", help="convert an OpenAI whisper "
                        ".pt or HuggingFace whisper dir for the transcribe "
                        "tool")
    iw.add_argument("src", help="whisper {size}.pt or HF checkpoint dir")
    iw.add_argument("--out", required=True, help="output dir; writes "
                    "whisper.pt + tokenizer assets")
    iw.set_defaults(fn=cmd_import_whisper)

    sv = sub.add_parser("serve")
    sv.add_argument("--http-port", type=int, default=8002)
    sv.add_argument("--ws-port", type=int, default=8001)
    sv.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
