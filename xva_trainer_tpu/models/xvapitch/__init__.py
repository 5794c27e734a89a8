from .model import XVAPitch, XVAPitchConfig, rand_segments, segment
from .discriminator import VitsDiscriminator
from . import losses
