from .symbols import get_symbols, get_pad_idx, xva_symbols, ARPABET
from .cleaners import english_cleaners
from .processor import TextProcessor, CMUDict


def v3_text_to_ids(lang: str = "en"):
    """The ONE v3 tokenizer selector — used by the server, the CLI, and any
    embedder so training and inference always agree on token ids: the full
    multilingual preprocessor when its language assets are available
    (XVA_TEXT_DIR), else the self-contained rule G2P."""
    import os

    base_dir = os.environ.get("XVA_TEXT_DIR")
    if base_dir and os.path.isdir(base_dir):
        from .preprocessing import get_text_preprocessor

        tp = get_text_preprocessor(lang, base_dir)
        return lambda text: tp.text_to_sequence(text)[0]
    from .xva_processor import XvaTextProcessor

    tp = XvaTextProcessor()
    return tp.text_to_sequence
