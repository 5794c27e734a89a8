from .model import FastPitch, FastPitchConfig, regulate_len, average_pitch
from . import loss
