from .model import ResNetSpeakerEncoder, SpeakerEncoder, spk_mel_spectrogram
