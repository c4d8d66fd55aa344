"""Transolver model family, TPU-first.

One Flax module covers the reference's three geometry variants
(``model/Transolver_Irregular_Mesh.py``, ``model/Transolver_Structured_Mesh_2D.py``,
``model/Transolver_Structured_Mesh_3D.py``) and the autoencoder variant
(``model/Transolver_Structured_Mesh2D_Encoder.py``).  Differences from the
reference that are deliberate TPU-first design choices:

* the homogeneous layer stack runs under ``nn.scan`` (one compiled block,
  layer-stacked parameters) instead of a Python loop over 8 modules --
  faster compiles and a natural home for ``nn.remat`` (the reference's
  ``use_checkpoint`` flag, ``Transolver_Structured_Mesh_3D.py:185-188``);
* the unified-pos anchor-distance grid is precomputed in numpy and folded
  into the program as a constant (``Transolver_Structured_Mesh_2D.py:183-200``);
* the encoder variant's ``encode``/``decode`` take and return slice weights
  explicitly instead of caching them on the module
  (``Transolver_Structured_Mesh2D_Encoder.py:200-225`` is stateful).

Faithfully preserved reference behaviors (bit-comparable targets):
  * preprocess MLP on ``cat(x, fx)``; ``placeholder`` parameter added only
    when ``fx is None`` for structured grids but *unconditionally* for
    irregular meshes (``Transolver_Irregular_Mesh.py:148``);
  * optional timestep conditioning ``fx += time_fc(timestep_embedding(T))``;
  * pre-LN blocks ``fx = Attn(ln_1(fx)) + fx; fx = mlp(ln_2(fx)) + fx`` with
    the final ``mlp2(ln_3(fx))`` head;
  * encoder ``decode``: the code is desliced with *projected* weights twice
    (``reconstruct_fx`` then ``decode`` on the mutated cache --
    ``Transolver_Structured_Mesh2D_Encoder.py:87-96``), i.e.
    ``fx = 2 * to_out(deslice(code, project_slice(w)))``.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import PhysicsAttention
from ..ops.embedding import (
    timestep_embedding,
    unified_pos_grid_2d,
    unified_pos_grid_3d,
    unified_pos_pointcloud,
)
from ..ops.initializers import placeholder_init, trunc_normal_002, zeros
from ..ops.mlp import MLP

LN = lambda name, dtype=None: nn.LayerNorm(epsilon=1e-5, name=name, dtype=dtype)


class TransolverBlock(nn.Module):
    """Pre-LN physics-attention block (uniform part, no last-layer head)."""

    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    act: str = "gelu"
    mlp_ratio: int = 4
    slice_num: int = 32
    geometry: str = "grid2d"
    grid_shape: Tuple[int, ...] = ()
    autoencoder: bool = False
    impl: str = "xla"
    precision: Optional[str] = None
    dtype: Optional[str] = None
    conv_impl: str = "lax"

    def setup(self):
        self.ln_1 = LN("ln_1", self.dtype)
        self.Attn = PhysicsAttention(
            dim=self.hidden_dim,
            heads=self.num_heads,
            dim_head=self.hidden_dim // self.num_heads,
            dropout=self.dropout,
            slice_num=self.slice_num,
            geometry=self.geometry,
            grid_shape=self.grid_shape,
            autoencoder=self.autoencoder,
            impl=self.impl,
            precision=self.precision,
            dtype=self.dtype,
            conv_impl=self.conv_impl,
            name="Attn",
        )
        self.ln_2 = LN("ln_2", self.dtype)
        self.mlp = MLP(
            n_hidden=self.hidden_dim * self.mlp_ratio,
            n_output=self.hidden_dim,
            n_layers=0,
            res=False,
            act=self.act,
            dtype=self.dtype,
            name="mlp",
        )

    def _mega_params(self):
        """Collect block params into the fused-megakernel layout."""
        a = self.Attn
        av = a.variables["params"]
        vx = a.in_project_x.variables["params"]
        vf = a.in_project_fx.variables["params"]
        vo = a.to_out.variables["params"]
        mv = self.mlp.variables["params"]
        return {
            "ln1_scale": self.ln_1.variables["params"]["scale"],
            "ln1_bias": self.ln_1.variables["params"]["bias"],
            "conv_kernel": jnp.concatenate([vx["kernel"], vf["kernel"]], -1),
            "conv_bias": jnp.concatenate([vx["bias"], vf["bias"]]),
            "slice_kernel": av["in_project_slice_kernel"],
            "slice_bias": av["in_project_slice_bias"],
            "temperature": av["temperature"],
            "wq": av["to_q_kernel"],
            "wk": av["to_k_kernel"],
            "wv": av["to_v_kernel"],
            "out_kernel": vo["kernel"],
            "out_bias": vo["bias"],
            "ln2_scale": self.ln_2.variables["params"]["scale"],
            "ln2_bias": self.ln_2.variables["params"]["bias"],
            "w1": mv["linear_pre"]["kernel"],
            "b1": mv["linear_pre"]["bias"],
            "w2": mv["linear_post"]["kernel"],
            "b2": mv["linear_post"]["bias"],
        }

    def _use_mega(self, fx, deterministic):
        if self.impl != "mega" or self.autoencoder or self.is_initializing():
            return False
        if self.geometry != "grid2d" or self.act != "gelu":
            return False
        from ..ops import pallas_block

        dtype = self.dtype or fx.dtype
        return pallas_block.supported(
            fx.shape, dtype, self.grid_shape, self.num_heads, self.slice_num,
            self.hidden_dim * self.mlp_ratio,
            dropout_active=(self.dropout > 0.0 and not deterministic),
        )

    def __call__(self, fx, deterministic: bool = True):
        if self._use_mega(fx, deterministic):
            from ..ops.pallas_block import fused_transolver_block

            dtype = self.dtype or fx.dtype
            return fused_transolver_block(
                fx.astype(dtype), self._mega_params(),
                grid_shape=self.grid_shape, heads=self.num_heads,
                slice_num=self.slice_num,
                mlp_hidden=self.hidden_dim * self.mlp_ratio,
                clamp_temperature=True,
            ).astype(fx.dtype)
        fx = self.Attn(self.ln_1(fx), deterministic=deterministic) + fx
        fx = self.mlp(self.ln_2(fx)) + fx
        return fx

    # --- encoder-variant methods (only used when autoencoder=True) ---

    def encode(self, fx, deterministic: bool = True):
        """Last-block encode: slice tokens + weights of the pre-LN input."""
        return self.Attn.encode(self.ln_1(fx), deterministic=deterministic)

    def decode_body(self, code, slice_weights, deterministic: bool = True):
        """Reference last-block decode minus the mlp2 head; returns (fx, w')."""
        rec, projected = self.Attn.reconstruct_fx(
            code, slice_weights, deterministic=deterministic
        )
        fx = self.Attn.decode(code, projected, deterministic=deterministic) + rec
        fx = self.mlp(self.ln_2(fx)) + fx
        return fx, projected


class _ScanBlock(nn.Module):
    """Carry-style wrapper so TransolverBlock can run under nn.scan."""

    block_kwargs: dict

    @nn.compact
    def __call__(self, fx, deterministic):
        fx = TransolverBlock(**self.block_kwargs, name="block")(fx, deterministic)
        return fx, None


class Transolver(nn.Module):
    """Transolver neural operator; ``geometry`` selects the attention variant.

    Matches the constructor surface of the reference ``Model`` classes with a
    single extra ``geometry`` switch ('irregular' | 'grid2d' | 'grid3d') and
    ``variant`` ('standard' | 'encoder').
    """

    space_dim: int = 1
    n_layers: int = 5
    n_hidden: int = 256
    dropout: float = 0.0
    n_head: int = 8
    Time_Input: bool = False
    act: str = "gelu"
    mlp_ratio: int = 1
    fun_dim: int = 1
    out_dim: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    geometry: str = "grid2d"
    H: int = 85
    W: int = 85
    D: int = 32
    variant: str = "standard"
    use_checkpoint: bool = False
    impl: str = "xla"
    precision: Optional[str] = None
    dtype: Optional[str] = None  # compute dtype, e.g. jnp.bfloat16 for speed
    scan_unroll: int = 8  # lax.scan unroll for the layer stack (keeps the
    # stacked param layout but removes per-layer dynamic-update-slice
    # residual stacking from the backward pass)
    conv_impl: str = "lax"  # projection convs: 'lax' | 'shifted'(-matmul)

    @property
    def grid_shape(self):
        if self.geometry == "grid2d":
            return (self.H, self.W)
        if self.geometry == "grid3d":
            return (self.H, self.W, self.D)
        return ()

    @property
    def n_points(self):
        n = 1
        for s in self.grid_shape:
            n *= s
        return n

    def setup(self):
        pos_dim = self.ref**2 if self.geometry != "grid3d" else self.ref**3
        in_dim = (
            self.fun_dim + pos_dim if self.unified_pos
            else self.fun_dim + self.space_dim
        )
        # fun_dim=0 models are called with fx=None; preprocess then sees x only.
        self.preprocess = MLP(
            n_hidden=self.n_hidden * 2,
            n_output=self.n_hidden,
            n_layers=0,
            res=False,
            act=self.act,
            dtype=self.dtype,
            name="preprocess",
        )
        del in_dim  # shape is inferred lazily by flax; kept for documentation
        self.placeholder = self.param(
            "placeholder", placeholder_init(self.n_hidden), (self.n_hidden,)
        )
        if self.Time_Input:
            self.time_fc_1 = nn.Dense(
                self.n_hidden, kernel_init=trunc_normal_002, bias_init=zeros,
                name="time_fc_1",
            )
            self.time_fc_2 = nn.Dense(
                self.n_hidden, kernel_init=trunc_normal_002, bias_init=zeros,
                name="time_fc_2",
            )

        block_kwargs = dict(
            num_heads=self.n_head,
            hidden_dim=self.n_hidden,
            dropout=self.dropout,
            act=self.act,
            mlp_ratio=self.mlp_ratio,
            slice_num=self.slice_num,
            geometry=self.geometry,
            grid_shape=self.grid_shape,
            autoencoder=(self.variant == "encoder"),
            impl=self.impl,
            precision=self.precision,
            dtype=self.dtype,
            conv_impl=self.conv_impl,
        )
        n_scan = self.n_layers if self.variant == "standard" else self.n_layers - 1
        scan_target = _ScanBlock
        if self.use_checkpoint:
            scan_target = nn.remat(
                _ScanBlock, static_argnums=(2,), prevent_cse=False
            )
        if n_scan > 0:
            self.blocks = nn.scan(
                scan_target,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_scan,
                in_axes=(nn.broadcast,),
                unroll=min(self.scan_unroll, n_scan),
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(block_kwargs=block_kwargs, name="blocks")
        else:
            self.blocks = None
        if self.variant == "encoder":
            self.last_block = TransolverBlock(**block_kwargs, name="last_block")
        self.ln_3 = LN("ln_3")
        self.mlp2 = nn.Dense(
            self.out_dim, kernel_init=trunc_normal_002, bias_init=zeros, name="mlp2"
        )

    # --- input embedding -------------------------------------------------

    def _unified_pos(self, batch):
        if self.geometry == "grid2d":
            pos = unified_pos_grid_2d(self.H, self.W, self.ref)
        elif self.geometry == "grid3d":
            pos = unified_pos_grid_3d(self.H, self.W, self.D, self.ref)
        else:
            raise AssertionError
        return jnp.broadcast_to(jnp.asarray(pos), (batch, pos.shape[1], pos.shape[2]))

    def embed(self, x, fx, T=None):
        """preprocess(cat(x|unified_pos, fx)) [+ placeholder] [+ time embedding]."""
        if self.unified_pos:
            if self.geometry == "irregular":
                x = unified_pos_pointcloud(x, self.ref)
            else:
                x = self._unified_pos(x.shape[0])
        if fx is not None:
            fx = self.preprocess(jnp.concatenate([x, fx], axis=-1))
            if self.geometry == "irregular":
                fx = fx + self.placeholder[None, None, :]
        else:
            fx = self.preprocess(x)
            fx = fx + self.placeholder[None, None, :]
        if T is not None:
            emb = timestep_embedding(jnp.reshape(T, (-1,)), self.n_hidden)
            emb = self.time_fc_2(nn.silu(self.time_fc_1(emb)))
            fx = fx + emb[:, None, :]
        return fx

    # --- forward ----------------------------------------------------------

    def __call__(self, x, fx=None, T=None, deterministic: bool = True):
        fx = self.embed(x, fx, T)
        if self.blocks is not None:
            fx, _ = self.blocks(fx, deterministic)
        if self.variant == "encoder":
            code, w = self.last_block.encode(fx, deterministic)
            fx, _ = self.last_block.decode_body(code, w, deterministic)
        out = self.mlp2(self.ln_3(fx))
        # the head always emits float32 so losses/metrics stay full precision
        return out.astype(jnp.float32)

    def encode(self, x, fx=None, deterministic: bool = True):
        """Run blocks 0..L-2 then the last block's slice+attend phase.

        Returns (slice_tokens [B, H, G, D], slice_weights [B, H, N, G]) --
        the functional form of ``Model.encode`` + ``get_attention_slice``
        (``Transolver_Structured_Mesh2D_Encoder.py:200-219``).
        """
        assert self.variant == "encoder", "encode() requires variant='encoder'"
        fx = self.embed(x, fx)
        if self.blocks is not None:
            fx, _ = self.blocks(fx, deterministic)
        return self.last_block.encode(fx, deterministic)

    def decode(self, code, slice_weights, deterministic: bool = True):
        """Decode slice tokens back to a field with explicit slice weights."""
        assert self.variant == "encoder", "decode() requires variant='encoder'"
        fx, projected = self.last_block.decode_body(
            code, slice_weights, deterministic
        )
        return self.mlp2(self.ln_3(fx)), projected
