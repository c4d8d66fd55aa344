"""Shared MLP block.

The reference duplicates this class verbatim in eight files
(``model/Transolver_Structured_Mesh_2D.py:13-38`` et al.); it is defined once
here.  Semantics: ``linear_pre (Dense + act) -> n_layers x (Dense + act [+ res])
-> linear_post``.  All production configs use ``n_layers=0, res=False``.
"""

from typing import Any, Callable, Optional

from flax import linen as nn

from .activations import get_activation
from .initializers import trunc_normal_002, zeros


class MLP(nn.Module):
    n_hidden: int
    n_output: int
    n_layers: int = 0
    act: str = "gelu"
    res: bool = False
    kernel_init: Callable = trunc_normal_002
    dtype: Optional[Any] = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        dense = lambda feat, name: nn.Dense(
            feat, kernel_init=self.kernel_init, bias_init=zeros, name=name,
            dtype=self.dtype,
        )
        x = act(dense(self.n_hidden, "linear_pre")(x))
        for i in range(self.n_layers):
            h = act(dense(self.n_hidden, f"linears_{i}")(x))
            x = h + x if self.res else h
        return dense(self.n_output, "linear_post")(x)
