from .activations import ACTIVATION, get_activation
from .mlp import MLP
from .embedding import timestep_embedding, unified_pos_grid_2d, unified_pos_grid_3d, unified_pos_pointcloud
from .attention import PhysicsAttention, slice_attention

__all__ = [
    "ACTIVATION",
    "get_activation",
    "MLP",
    "timestep_embedding",
    "unified_pos_grid_2d",
    "unified_pos_grid_3d",
    "unified_pos_pointcloud",
    "PhysicsAttention",
    "slice_attention",
]
