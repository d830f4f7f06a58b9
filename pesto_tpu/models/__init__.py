from .config import LayerConfig, PestoConfig, PRESETS, get_config
from .pesto import PestoModel

__all__ = ["LayerConfig", "PestoConfig", "PRESETS", "get_config", "PestoModel"]
