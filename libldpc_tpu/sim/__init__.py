from .driver import Simulator
from .results import SimResults

__all__ = ["SimResults", "Simulator"]
