"""Positional / timestep embeddings.

``timestep_embedding`` mirrors ``model/Embedding.py:67-85`` (sinusoidal, cos
before sin).  The ``unified_pos_*`` helpers build the reference's anchor-grid
distance features (``Transolver_Structured_Mesh_2D.py:183-200``,
``Transolver_Structured_Mesh_3D.py:145-167``,
``Transolver_Irregular_Mesh.py:127-138``): for every mesh point, the Euclidean
distances to a ``ref x ref (x ref)`` lattice of anchors on [0, 1]^d.

They are deterministic functions of static shapes, so the structured-grid
variants are computed in numpy once at model-construction time and folded into
the jit program as constants.
"""

import math

import numpy as np
import jax.numpy as jnp


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal timestep embedding: [N] -> [N, dim] with [cos | sin] halves."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def _anchor_lattice(ref, dims):
    """ref^dims anchor points on the [0,1]^dims lattice, shape [ref**dims, dims]."""
    axes = [np.linspace(0, 1, ref, dtype=np.float32)] * dims
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1)


def unified_pos_grid_2d(H, W, ref):
    """[1, H*W, ref*ref] distances from each (i/(H-1), j/(W-1)) grid point to anchors."""
    gx = np.linspace(0, 1, H, dtype=np.float32)
    gy = np.linspace(0, 1, W, dtype=np.float32)
    mx, my = np.meshgrid(gx, gy, indexing="ij")
    pts = np.stack([mx.ravel(), my.ravel()], axis=-1)  # [H*W, 2]
    anchors = _anchor_lattice(ref, 2)  # [ref^2, 2]
    d = np.sqrt(((pts[:, None, :] - anchors[None, :, :]) ** 2).sum(-1))
    return d[None].astype(np.float32)  # [1, N, ref^2]


def unified_pos_grid_3d(H, W, D, ref):
    """[1, H*W*D, ref^3] distances from each 3D grid point to the anchor lattice."""
    gx = np.linspace(0, 1, H, dtype=np.float32)
    gy = np.linspace(0, 1, W, dtype=np.float32)
    gz = np.linspace(0, 1, D, dtype=np.float32)
    mx, my, mz = np.meshgrid(gx, gy, gz, indexing="ij")
    pts = np.stack([mx.ravel(), my.ravel(), mz.ravel()], axis=-1)
    anchors = _anchor_lattice(ref, 3)
    d = np.sqrt(((pts[:, None, :] - anchors[None, :, :]) ** 2).sum(-1))
    return d[None].astype(np.float32)


def unified_pos_pointcloud(x, ref):
    """Per-sample anchor distances for irregular meshes: [B, N, 2] -> [B, N, ref^2].

    Unlike the structured variants this depends on the runtime coordinates, so
    it is a jnp function evaluated inside the model.
    """
    anchors = jnp.asarray(_anchor_lattice(ref, 2))  # [ref^2, 2]
    d2 = ((x[:, :, None, :] - anchors[None, None, :, :]) ** 2).sum(-1)
    return jnp.sqrt(d2)


# ---------------------------------------------------------------------------
# Shipped-but-unused reference helpers, kept for API completeness
# (``model/Embedding.py:7-64`` -- no reference model instantiates these).
# ---------------------------------------------------------------------------


def rotary_frequencies(coordinates, dim, min_freq=1.0 / 2, scale=1.0):
    """RotaryEmbedding.forward (``model/Embedding.py:7-20``): [B, N] coords ->
    [B, N, dim] duplicated frequency bands."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = coordinates * (scale / min_freq)
    freqs = t[..., None] * inv_freq  # [B, N, dim//2]
    return jnp.concatenate([freqs, freqs], axis=-1)


def rotate_half(x):
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(t, freqs):
    return t * jnp.cos(freqs) + rotate_half(t) * jnp.sin(freqs)


def apply_2d_rotary_pos_emb(t, freqs_x, freqs_y):
    d = t.shape[-1]
    t_x, t_y = t[..., : d // 2], t[..., d // 2 :]
    return jnp.concatenate(
        [apply_rotary_pos_emb(t_x, freqs_x), apply_rotary_pos_emb(t_y, freqs_y)],
        axis=-1,
    )


def positional_encoding_table(max_len, d_model):
    """Sinusoidal PE table (``model/Embedding.py:44-64``): [1, max_len, d]."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe[None])
