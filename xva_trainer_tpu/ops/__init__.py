from .mel import mel_filterbank, inverse_mel_filterbank, hz_to_mel, mel_to_hz
from .stft import (
    MelConfig,
    DEFAULT_MEL,
    LOSS_MEL,
    hann_window,
    stft_magnitude,
    linear_spectrogram,
    mel_spectrogram,
    mel_spectrogram_hifigan,
    dynamic_range_compression,
    dynamic_range_decompression,
)
