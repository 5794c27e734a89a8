from .audio_io import load_wav, save_wav, resample, trim_silence_db
from .dataset import FeatureCache, BucketBatcher, Bucket, Utterance, read_metadata
from .pitch import yin_f0, normalize_pitch
from .prior import BetaBinomialInterpolator, beta_binomial_prior
