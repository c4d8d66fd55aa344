"""Model registry, equivalent of the reference ``model_dict.py:4-11``.

Maps the reference model-name strings to factories producing the unified
:class:`Transolver` with the right geometry / variant.
"""

from .transolver import Transolver


def _irregular(**kw):
    kw.pop("H", None)
    kw.pop("W", None)
    kw.pop("D", None)
    return Transolver(geometry="irregular", **kw)


def _grid2d(**kw):
    kw.pop("D", None)
    return Transolver(geometry="grid2d", **kw)


def _grid3d(**kw):
    return Transolver(geometry="grid3d", **kw)


def _encoder2d(**kw):
    kw.pop("D", None)
    return Transolver(geometry="grid2d", variant="encoder", **kw)


MODEL_REGISTRY = {
    "Transolver_Irregular_Mesh": _irregular,
    "Transolver_Structured_Mesh_2D": _grid2d,
    "Transolver_Structured_Mesh_3D": _grid3d,
    "Transolver_Structured_Mesh2D_Encoder": _encoder2d,
    # aliases matching the reference models' __name__ attributes
    "Transolver_1D": _irregular,
    "Transolver_2D": _grid2d,
    "Transolver_3D": _grid3d,
}


def get_model(name: str):
    """Return a factory(name **kwargs -> Transolver) for the given model name."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
