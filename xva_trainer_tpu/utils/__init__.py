from .config import build_config, cli_layer, load_json_layer, overlay

__all__ = ["build_config", "cli_layer", "load_json_layer", "overlay"]
