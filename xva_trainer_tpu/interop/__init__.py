"""Interop with the reference PyTorch artifact formats.

- torch_io: torch-free reader for ``torch.save`` zip archives (.pt).
- mapping: declarative torch<->flax parameter-mapping rule engine.
- xvapitch_map / hifigan_map / speaker_map: per-model key maps used both to
  import the reference's pretrained checkpoints (xVAPitch base, HiFi-GAN
  g_/do_, speaker_rep.pt) and to export xVASynth-loadable state dicts.
"""
from .torch_io import load_torch_pt
from .mapping import apply_import, apply_export

__all__ = ["load_torch_pt", "apply_import", "apply_export"]
