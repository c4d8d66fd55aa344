from .losses import rel_lp, abs_lp, RelLpLoss, central_diff
from .normalizers import UnitTransformer, IdentityTransformer, UnitGaussianNormalizer

__all__ = [
    "rel_lp",
    "abs_lp",
    "RelLpLoss",
    "central_diff",
    "UnitTransformer",
    "IdentityTransformer",
    "UnitGaussianNormalizer",
]
