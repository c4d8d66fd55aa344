from .transolver import Transolver, TransolverBlock
from .sol import SOLTransolver
from .sequensolver import SequenSolver, SequenSolverMerged
from .slice_learners import SliceLearner, LearnSlice
from .registry import MODEL_REGISTRY, get_model

__all__ = [
    "Transolver",
    "TransolverBlock",
    "SOLTransolver",
    "SequenSolver",
    "SequenSolverMerged",
    "SliceLearner",
    "LearnSlice",
    "MODEL_REGISTRY",
    "get_model",
]
