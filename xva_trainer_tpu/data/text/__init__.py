from .symbols import get_symbols, get_pad_idx, xva_symbols, ARPABET
from .cleaners import english_cleaners
from .processor import TextProcessor, CMUDict
