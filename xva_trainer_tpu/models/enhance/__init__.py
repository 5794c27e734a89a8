from .model import (
    ComplexMaskNet,
    EnhanceConfig,
    SpeechEnhancer,
    si_sdr,
    train_enhancer,
)

__all__ = ["ComplexMaskNet", "EnhanceConfig", "SpeechEnhancer", "si_sdr",
           "train_enhancer"]
