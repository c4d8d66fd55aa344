from .transolver import Transolver, TransolverBlock
from .sol import SOLTransolver
from .registry import MODEL_REGISTRY, get_model

__all__ = [
    "Transolver",
    "TransolverBlock",
    "SOLTransolver",
    "MODEL_REGISTRY",
    "get_model",
]
