from .model import WaveGlow, WaveGlowConfig
