from .cache import enable_compilation_cache
from .device import wait_for_device

__all__ = ["enable_compilation_cache", "wait_for_device"]
