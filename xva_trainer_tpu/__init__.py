"""xva_trainer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) voice-model training
framework with the capabilities of DanRuta/xva-trainer.

The reference app (/root/reference) is an Electron + PyTorch/CUDA desktop
trainer for xVASynth voices. This package re-designs its compute core for TPU:

- ``ops``      — DSP + Pallas kernels (fused mel-spectrogram, MAS, splines).
- ``models``   — flax model families: FastPitch1.1, HiFi-GAN, xVAPitch (VITS),
                 ResNet-SE speaker encoder.
- ``parallel`` — device-mesh / NamedSharding strategy (DP over ICI, reserved
                 model/sequence axes).
- ``data``     — host-side dataset pipeline, text/G2P front end, feature cache.
- ``train``    — jit train-step factories, optax optimizers, multi-stage
                 schedules, loss-delta early stopping, orbax checkpoints,
                 xVASynth-compatible export.
- ``tools``    — the dataset-prep tool suite (format, normalize, silence ops,
                 diarization, clustering, search, transcription, ...).
- ``app``      — websocket/HTTP task server speaking the reference's JSON
                 protocol (``{model, task, data}`` / ``task_info`` events).
"""

__version__ = "0.2.0"
