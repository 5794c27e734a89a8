"""Task API server speaking the reference's JSON protocol.

Parity target: reference server.py —
- websocket on :8001 (server.py:27,247-254): JSON ``{model, task, data}``
  with tasks ``runTask`` / ``startTraining`` / ``resume`` / ``pause`` /
  ``stop`` (:135-208); events back: ``task_info`` / ``tasks_next`` /
  ``tasks_error`` / ``TRAINING_ERROR``.
- HTTP on :8002 (:26,360): ``/setDevice``, ``/checkReady``, ``/exportWav``,
  ``/getAudioLengthOfDir``, ``/stopServer`` (:286-346).

Design delta (SURVEY.md §5.2): training runs as an asyncio task inside ONE
event loop (the reference spawns a raw thread with its own loop and mutates
shared state unsynchronized); the task runner is a single-owner state machine.
"""
from __future__ import annotations

import asyncio
import json
import logging
import os
import traceback
from logging.handlers import RotatingFileHandler
from typing import Any, Dict, Optional


def make_logger(path: str = "server.log") -> logging.Logger:
    """Rotating file logger, 2MB × 5 (reference server.py:68-97)."""
    logger = logging.getLogger("xva_trainer_tpu")
    if not logger.handlers:
        logger.setLevel(logging.DEBUG)
        fh = RotatingFileHandler(path, maxBytes=2 * 1024 * 1024, backupCount=5)
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
    return logger


class TrainingSession:
    """Single-owner trainer lifecycle: start/pause/resume/stop."""

    def __init__(self, server: "AppServer"):
        self.server = server
        self.task: Optional[asyncio.Task] = None
        self.trainer = None
        self.paused = False

    def running(self) -> bool:
        return self.task is not None and not self.task.done()

    async def start(self, data: Dict, websocket, resume: bool = False):
        if self.running():
            return
        self.task = asyncio.create_task(self._run(data, websocket))

    async def _run(self, data: Dict, websocket):
        try:
            model_type = (data.get("model_type") or "xVAPitch").lower()
            if "fastpitch" in model_type:
                await self._run_v2(data, websocket)
            else:
                await self._run_v3(data, websocket)
            if websocket:
                await websocket.send(json.dumps({"key": "tasks_next"}))
        except asyncio.CancelledError:
            raise
        except Exception:
            err = traceback.format_exc()
            self.server.logger.error(err)
            if websocket:
                await websocket.send(
                    json.dumps({"key": "TRAINING_ERROR", "data": err})
                )

    async def _run_v3(self, data: Dict, websocket):
        from ..data.text.xva_processor import get_text_preprocessor
        from ..data.xva_dataset import (
            XvaBatcher,
            XvaFeatureCache,
            get_dataset_embedding,
        )
        from ..train.xvapitch_trainer import XVAPitchTrainer, XvaTrainConfig

        dataset_path = data["dataset_path"]
        output_path = data["output_path"]
        lang = data.get("lang", "en")
        bs = int(data.get("batch_size", 16))
        tp = get_text_preprocessor(lang, output_path)
        cache = XvaFeatureCache(dataset_path, tp, lang=lang)
        await asyncio.to_thread(cache.build)
        emb = await asyncio.to_thread(get_dataset_embedding, dataset_path)
        batcher = XvaBatcher([cache], batch_size=bs, d_vector=emb["main"])
        cfg = XvaTrainConfig(output_dir=output_path, batch_size=bs)
        self.trainer = XVAPitchTrainer(batcher, cfg)
        self.trainer.setup(resume=True)
        await asyncio.to_thread(
            self.trainer.train, data.get("max_steps")
        )
        voice = os.path.basename(dataset_path.rstrip("/"))
        self.trainer.export(voice, lang=lang, base_emb=emb["main"],
                            other_embs=emb["others"].tolist())

    async def _run_v2(self, data: Dict, websocket):
        from ..train.pipeline import PipelineConfig, train_v2_pipeline

        cfg = PipelineConfig(
            dataset_path=data["dataset_path"],
            output_path=data["output_path"],
            batch_size=int(data.get("batch_size", 32)),
            voice_name=os.path.basename(data["dataset_path"].rstrip("/")),
        )
        await asyncio.to_thread(train_v2_pipeline, cfg)

    def pause(self):
        if self.trainer is not None:
            self.trainer.stop_requested = True
            self.paused = True

    def stop(self):
        if self.trainer is not None:
            self.trainer.stop_requested = True
        if self.task:
            self.task.cancel()
        self.trainer = None


class AppServer:
    def __init__(self, http_port: int = 8002, ws_port: int = 8001,
                 logger: Optional[logging.Logger] = None):
        from .manager import ModelsManager

        self.http_port = http_port
        self.ws_port = ws_port
        self.logger = logger or make_logger()
        self.manager = ModelsManager(self.logger)
        self.training = TrainingSession(self)
        self.ready = True

    # ---------------- websocket protocol ----------------

    async def handle_message(self, raw: str, websocket=None) -> Optional[str]:
        """One JSON message → optional immediate reply (events go over ws)."""
        msg = json.loads(raw)
        model = (msg.get("model") or "").lower()
        task = msg.get("task") or ""
        data = msg.get("data") or {}
        if isinstance(data, str):
            data = json.loads(data) if data else {}

        if task == "runTask":
            tool = await self.manager.init_model(model)
            await tool.runTask(data, websocket)
            return None
        if task == "startTraining":
            await self.training.start(data, websocket)
            return None
        if task == "resume":
            await self.training.start(data, websocket, resume=True)
            return None
        if task == "pause":
            self.training.pause()
            return None
        if task == "stop":
            self.training.stop()
            self.manager.drop(model)
            return None
        if task == "exit":
            raise SystemExit
        return json.dumps({"key": "tasks_error", "data": f"unknown task {task}"})

    async def websocket_handler(self, websocket):
        async for raw in websocket:
            try:
                reply = await self.handle_message(raw, websocket)
                if reply:
                    await websocket.send(reply)
            except SystemExit:
                raise
            except Exception:
                err = traceback.format_exc()
                self.logger.error(err)
                try:
                    await websocket.send(
                        json.dumps({"key": "tasks_error", "data": err})
                    )
                except Exception:
                    pass

    # ---------------- HTTP endpoints ----------------

    async def handle_http(self, path: str, body: Dict) -> Dict:
        if path == "/checkReady":
            return {"ready": self.ready}
        if path == "/setDevice":
            self.manager.set_device(body.get("device", "tpu"))
            return {"ok": True}
        if path == "/getAudioLengthOfDir":
            from ..data.audio_io import load_wav

            total = 0.0
            d = body["directory"]
            for f in os.listdir(d):
                if f.endswith(".wav"):
                    y, sr = load_wav(os.path.join(d, f))
                    total += len(y) / sr
            return {"seconds": total}
        if path == "/exportWav":
            return await self._export_wav(body)
        if path == "/stopServer":
            raise SystemExit
        return {"error": f"unknown path {path}"}

    async def _export_wav(self, body: Dict) -> Dict:
        """Preview synthesis + loudness normalization round trip
        (reference server.py:313-330 → infer → normalize_sync)."""
        import numpy as np

        from ..data.audio_io import save_wav
        from ..ops.loudness import normalize_ebu_r128

        ckpt = body["xvap_ckpt"]
        out_path = body["out_path"]
        text = body.get("text", "This is what my voice sounds like.")
        wav = await asyncio.to_thread(
            self._synthesize_v3, ckpt, body.get("emb"), text
        )
        wav = normalize_ebu_r128(wav, 22050)
        save_wav(out_path, wav)
        return {"ok": True, "path": out_path}

    def _synthesize_v3(self, ckpt_dir: str, emb, text: str):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..data.text.xva_processor import XvaTextProcessor
        from ..models.xvapitch import XVAPitch, XVAPitchConfig
        from ..train.checkpoints import CheckpointManager
        from ..train.xvapitch_trainer import V3State

        # load the newest checkpoint from the training output dir
        raise_if_missing = not os.path.isdir(ckpt_dir)
        if raise_if_missing:
            raise FileNotFoundError(ckpt_dir)
        model = XVAPitch(XVAPitchConfig())
        tp = XvaTextProcessor()
        ids = tp.text_to_sequence(text)
        tokens = jnp.asarray(np.pad(ids, (0, max(0, 128 - len(ids))))[:128])[None]
        dvec = jnp.asarray(
            np.asarray(emb, np.float32)[None]
            if emb is not None else np.zeros((1, 512), np.float32)
        )
        lang = jnp.asarray([5], jnp.int32)  # en

        ckpt = CheckpointManager(ckpt_dir, prefix="xVAPitch")
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        g_params = model.init(rngs, tokens, dvec, lang,
                              method=XVAPitch.infer, max_frames=512)
        step = ckpt.latest_step()
        if step is not None:
            # restore only generator params out of the saved state
            import orbax.checkpoint as ocp

            template = {"g_params": g_params}
            try:
                restored = ocp.StandardCheckpointer().restore(
                    ckpt._path(step), template
                )
                g_params = restored["g_params"]
            except Exception:
                self.logger.warning("partial restore failed; using fresh params")
        out = model.apply(g_params, tokens, dvec, lang,
                          method=XVAPitch.infer, max_frames=512,
                          rngs={"noise": jax.random.PRNGKey(3)})
        import numpy as np

        n = int(out["y_lengths"][0]) * 256
        return np.asarray(out["wav"][0][:n])

    # ---------------- runners ----------------

    async def serve(self):
        import websockets
        from aiohttp import web  # optional; fallback to http.server below

        ws_server = await websockets.serve(
            self.websocket_handler, "localhost", self.ws_port
        )
        self.logger.info(f"ws listening on :{self.ws_port}")
        await asyncio.Future()

    async def serve_with_http(self):
        """Full server: websocket (asyncio) + stdlib HTTP server in a thread,
        bridged into the event loop (the reference runs HTTPServer on its main
        thread — server.py:360,374)."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        import websockets

        await websockets.serve(self.websocket_handler, "localhost", self.ws_port)

        loop = asyncio.get_running_loop()
        app = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                app.logger.info("http " + fmt % args)

            def _respond(self, payload: bytes, status: int = 200):
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _handle(self):
                length = int(self.headers.get("Content-Length") or 0)
                body = {}
                if length:
                    try:
                        body = json.loads(self.rfile.read(length))
                    except json.JSONDecodeError:
                        body = {}
                try:
                    fut = asyncio.run_coroutine_threadsafe(
                        app.handle_http(self.path, body), loop
                    )
                    result = fut.result(timeout=600)
                    self._respond(json.dumps(result).encode())
                except SystemExit:
                    self._respond(b'{"ok": true}')
                    threading.Thread(target=httpd.shutdown, daemon=True).start()
                except Exception:
                    err = traceback.format_exc()
                    app.logger.error(err)
                    self._respond(json.dumps({"error": err}).encode(), 500)

            do_GET = _handle
            do_POST = _handle

        httpd = ThreadingHTTPServer(("localhost", self.http_port), Handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        self.logger.info(f"ws :{self.ws_port} http :{self.http_port} ready")
        await asyncio.Future()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--http-port", type=int, default=8002)
    ap.add_argument("--ws-port", type=int, default=8001)
    args = ap.parse_args()
    # ports.txt override (reference server.py:126-129)
    if os.path.exists("ports.txt"):
        with open("ports.txt") as f:
            lines = f.read().split()
            if len(lines) >= 2:
                args.http_port, args.ws_port = int(lines[0]), int(lines[1])
    server = AppServer(args.http_port, args.ws_port)
    asyncio.run(server.serve_with_http())


if __name__ == "__main__":
    main()
