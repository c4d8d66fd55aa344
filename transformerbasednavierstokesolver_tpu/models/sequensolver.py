"""SequenSolver: next-frame prediction in Transolver's slice-token latent space.

TPU-native redesign of the fork's latent-rollout stack:

* ``SequenSolverMerged`` (reference ``SequenSolverMerged.py:48-323``) -- the
  production iteration: frozen pretrained encoder, T frames encoded to
  slice-token codes, sinusoidal positional encoding (``:229-244``),
  ``layers`` x pre-LN CAUSAL multi-head attention over the T-token sequence
  (``:246-262``, tril mask ``:94,254``), last token as the predicted code,
  slice weights JOINTLY learned by ``forward_slice`` (MLP-preprocess of
  cat(pos, fx) -> Conv2d -> concat z-score-normalized code -> MLP ->
  temperature-softmax, ``:166-203``), deslice + ``mlp2(ln_3(.))`` decode.
* ``SequenSolver`` (reference ``SequenSolver.py:45-186``) -- the original:
  UNmasked single-head temporal attention, no positional encoding; slice
  weights either ground-truth (from encoding the target frame) or predicted
  by a per-point MLP over cat(code, pos) (``:159-170``).

TPU-first changes:
  * the T frozen encoder passes are batched into ONE call (frames folded
    into the batch axis) instead of a Python loop of T sequential passes --
    the reference's dominant hot spot (SURVEY.md section 3.4);
  * encoder outputs pass through ``stop_gradient`` (the reference freezes
    via ``requires_grad=False``); the encoder lives under the ``encoder``
    param subtree so trainers can mask its updates;
  * slice weights / codes are function results, not module state.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import trunc_normal_002, zeros, torch_conv_kernel_init, make_torch_conv_bias_init
from ..ops.mlp import MLP
from .transolver import Transolver

LN = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)


def sinusoidal_token_pe(num_tokens, embed_dim):
    """Reference ``add_positional_encoding`` (SequenSolverMerged.py:229-244)."""
    pos = np.arange(num_tokens, dtype=np.float32)[:, None]
    div = 10000.0 ** (np.arange(0, embed_dim, 2, dtype=np.float32) / embed_dim)
    pe = np.zeros((num_tokens, embed_dim), np.float32)
    pe[:, 0::2] = np.sin(pos / div)
    pe[:, 1::2] = np.cos(pos / div)
    return jnp.asarray(pe[None, None])  # [1, 1, T, dim]


def z_score(x):
    """Global z-score with population std (SequenSolverMerged.py:289-293)."""
    return (x - jnp.mean(x)) / (jnp.std(x) + 1e-8)


def _default_encoder(H, W, layers=8, hidden=32, heads=1, slice_num=16):
    """The pretrained-encoder config both reference solvers hard-code
    (``SequenSolverMerged.py:67-78``); layer/width knobs exposed for tests."""
    return Transolver(
        space_dim=2, n_layers=layers, n_hidden=hidden, n_head=heads,
        slice_num=slice_num, fun_dim=1, out_dim=1, unified_pos=True, ref=8,
        geometry="grid2d", variant="encoder", H=H, W=W,
    )


class _TemporalBlock(nn.Module):
    """Pre-LN attention + MLP over the T-token sequence (shared weights reused
    ``layers`` times in the reference -- reproduced by calling one block in a
    loop with shared parameters)."""

    dim: int
    sequential_head: int
    mlp_ratio: int
    act: str
    dropout: float
    causal: bool

    def setup(self):
        self.seq_dim = self.dim // self.sequential_head
        self.to_q = self.param("to_q_kernel", trunc_normal_002, (self.seq_dim, self.seq_dim))
        self.to_k = self.param("to_k_kernel", trunc_normal_002, (self.seq_dim, self.seq_dim))
        self.to_v = self.param("to_v_kernel", trunc_normal_002, (self.seq_dim, self.seq_dim))
        self.ln_1 = LN("ln_1")
        self.ln_2 = LN("ln_2")
        self.mlp = MLP(
            n_hidden=self.dim * self.mlp_ratio, n_output=self.dim,
            n_layers=0, res=False, act=self.act, name="mlp",
        )

    def attention(self, tokens):
        # tokens: [B, 1, T, dim] -> heads [B, sh, T, seq_dim]
        B, _, T, dim = tokens.shape
        h = tokens.reshape(B, self.sequential_head, T, self.seq_dim)
        q = h @ self.to_q
        k = h @ self.to_k
        v = h @ self.to_v
        # NOTE reference scale: dim ** -0.5 on the FULL dim (``self.scale``),
        # not per-head -- preserved for parity.
        dots = jnp.einsum("bhtd,bhsd->bhts", q, k) * (self.dim**-0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((T, T), bool))
            dots = jnp.where(mask, dots, -jnp.inf)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        return out.reshape(B, 1, T, dim)

    def __call__(self, tokens):
        tokens = self.attention(self.ln_1(tokens)) + tokens
        tokens = self.mlp(self.ln_2(tokens)) + tokens
        return tokens


class SequenSolverMerged(nn.Module):
    """Joint code + slice-weight learner over a frozen Transolver encoder."""

    T: int = 10
    H: int = 64
    W: int = 64
    M: int = 16
    C: int = 32
    layers: int = 8
    sequential_head: int = 16
    mlp_ratio: int = 4
    act: str = "gelu"
    dropout: float = 0.0
    ref: int = 8
    slice_hidden: int = 256
    encoder_layers: int = 8
    # Joint fine-tuning extension (no reference counterpart — the reference
    # keeps the encoder frozen forever, SequenSolverMerged.py:84-86): when
    # True, encoder outputs are NOT stop-gradiented so a late training
    # phase can adapt the encoder to the rollout objective (the optimizer
    # must also unmask the ``encoder`` subtree; cli/sequen_solver.py
    # --finetune_epochs).
    finetune_encoder: bool = False

    @property
    def dim(self):
        return self.M * self.C

    def setup(self):
        # encoder hidden width == C and slice count == M by construction
        self.encoder = _default_encoder(
            self.H, self.W, self.encoder_layers, self.C, slice_num=self.M
        )
        self.block = _TemporalBlock(
            dim=self.dim, sequential_head=self.sequential_head,
            mlp_ratio=self.mlp_ratio, act=self.act, dropout=self.dropout,
            causal=True, name="block",
        )
        nh = self.slice_hidden
        self.preprocess = MLP(
            n_hidden=nh * 2, n_output=nh, n_layers=0, res=False,
            act=self.act, name="preprocess",
        )
        fan_in = nh * 9
        self.in_project_x = nn.Conv(
            nh, kernel_size=(3, 3), padding="SAME",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_conv_bias_init(fan_in),
            name="in_project_x",
        )
        self.in_project_slice = MLP(
            n_hidden=(nh + self.dim) // 2, n_output=self.M,
            n_layers=0, res=False, act=self.act, name="in_project_slice",
        )
        self.temperature = self.param(
            "temperature", lambda k, s: jnp.full(s, 0.5, jnp.float32), (1, 1, 1, 1)
        )
        self.ln_3 = LN("ln_3")
        self.mlp2 = nn.Dense(
            1, kernel_init=trunc_normal_002, bias_init=zeros, name="mlp2"
        )

    # --- frozen-encoder helpers -------------------------------------------

    def encode_frames(self, x, fx):
        """Encode T frames in ONE batched frozen-encoder call.

        fx: [B, N, T] -> tokens [B, 1, T, M*C] (stop-gradient).
        """
        B, N, T = fx.shape
        frames = fx.transpose(0, 2, 1).reshape(B * T, N, 1)
        xs = jnp.broadcast_to(x[:, None], (B, T) + x.shape[1:]).reshape(
            (B * T,) + x.shape[1:]
        )
        code, _ = self.encoder.encode(xs, frames)  # [B*T, 1, M, C]
        tokens = code.reshape(B, T, self.dim)[:, None]  # [B, 1, T, M*C]
        if self.finetune_encoder:
            return tokens
        return jax.lax.stop_gradient(tokens)

    def target_slice(self, x, y):
        """Ground-truth slice weights from encoding the target frame."""
        _, w = self.encoder.encode(x, y)
        if self.finetune_encoder:
            return w
        return jax.lax.stop_gradient(w)  # [B, 1, N, M]

    # --- temporal transformer ---------------------------------------------

    def predict_code(self, tokens):
        tokens = tokens + sinusoidal_token_pe(tokens.shape[2], self.dim)
        for _ in range(self.layers):  # shared weights, like the reference
            tokens = self.block(tokens)
        B = tokens.shape[0]
        return tokens[:, :, -1].reshape(B, 1, self.M, self.C)

    # --- learned slice weights --------------------------------------------

    def forward_slice(self, x, fx, code):
        """Predict deslice weights from (pos, history, z-scored code)."""
        z = self.preprocess(jnp.concatenate([x, fx], axis=-1))  # [B, N, nh]
        B, N, C = z.shape
        zg = z.reshape(B, self.H, self.W, C)
        x_mid = self.in_project_x(zg).reshape(B, 1, N, C)
        codef = code.reshape(B, 1, 1, self.dim)
        codef = jnp.broadcast_to(z_score(codef), (B, 1, N, self.dim))
        x_mid = jnp.concatenate([z_score(x_mid), codef], axis=-1)
        logits = self.in_project_slice(x_mid)
        temp = jnp.clip(self.temperature, 0.1, 5.0)
        return jax.nn.softmax(logits / temp, axis=-1)  # [B, 1, N, M]

    # --- decode ------------------------------------------------------------

    def decode(self, code, slice_weights):
        decoded = jnp.einsum("bhgc,bhng->bhnc", code, slice_weights)
        B, H, N, C = decoded.shape
        decoded = decoded.transpose(0, 2, 1, 3).reshape(B, N, H * C)
        return self.mlp2(self.ln_3(decoded))

    def solve_with_slice_learner(self, x, fx, slice_weights):
        """Decode the predicted code with externally predicted slice weights
        (see SequenSolver.solve_with_slice_learner)."""
        code = self.predict_code(self.encode_frames(x, fx))
        return self.decode(code, slice_weights)

    def __call__(self, x, fx, y=None, use_gt: bool = False):
        """x: [B, N, ref^2] unified pos; fx: [B, N, T] history; y unused by the
        merged forward (the reference's use_gt slice assignment is immediately
        overwritten by ``forward_slice`` -- SequenSolverMerged.py:133-153)."""
        tokens = self.encode_frames(x, fx)
        code = self.predict_code(tokens)
        slice_weights = self.forward_slice(x, fx, code)
        return self.decode(code, slice_weights)

    def closed_loop_outputs(self, x, fx, n_steps: int):
        """Closed-loop rollout with INCREMENTAL encoding.

        The naive loop re-encodes the whole T-frame window every step
        (O(T^2) frozen-encoder passes over the rollout); here the token
        window slides and only each newly predicted frame is encoded --
        identical outputs, T x fewer encoder passes.

        Returns [B, N, n_steps].
        """
        tokens = self.encode_frames(x, fx)  # [B, 1, T, dim]
        fx_win = fx
        outs = []
        for _ in range(n_steps):
            code = self.predict_code(tokens)
            w = self.forward_slice(x, fx_win, code)
            im = self.decode(code, w)  # [B, N, 1]
            outs.append(im)
            new_tok = self.encode_frames(x, im)  # one frame
            tokens = jnp.concatenate([tokens[:, :, 1:], new_tok], axis=2)
            fx_win = jnp.concatenate([fx_win[..., 1:], im], axis=-1)
        return jnp.concatenate(outs, axis=-1)

    def teacher_forced_outputs(self, x, fx, yy):
        """All T_out teacher-forced predictions with each frame encoded ONCE.

        The step-by-step loop re-encodes every history frame ~T times (the
        reference encodes 10 frames per forward x 10 rollout steps = 100
        frozen-encoder passes per sample); since teacher forcing slides over
        ground-truth frames only, all T_in + T_out encodings are computed in
        one batched call and the temporal transformer runs on sliding token
        windows.  Mathematically identical to looping ``__call__`` with gt
        re-insertion; ~T_in x less encoder compute.

        Returns [B, N, T_out].
        """
        T_out = yy.shape[-1]
        frames = jnp.concatenate([fx, yy], axis=-1)
        tokens_all = self.encode_frames(x, frames)  # [B, 1, T_in+T_out, dim]
        outs = []
        for t in range(T_out):
            window = jax.lax.dynamic_slice_in_dim(tokens_all, t, self.T, axis=2)
            code = self.predict_code(window)
            hist = jax.lax.dynamic_slice_in_dim(frames, t, self.T, axis=-1)
            w = self.forward_slice(x, hist, code)
            outs.append(self.decode(code, w))
        return jnp.concatenate(outs, axis=-1)


class SequenSolver(nn.Module):
    """Original variant: unmasked single-head temporal attention, gt or
    per-point-MLP slice weights (reference ``SequenSolver.py:45-186``)."""

    T: int = 10
    H: int = 64
    W: int = 64
    M: int = 16
    C: int = 32
    layers: int = 5
    mlp_ratio: int = 4
    act: str = "gelu"
    dropout: float = 0.0
    encoder_layers: int = 8

    @property
    def dim(self):
        return self.M * self.C

    def setup(self):
        self.encoder = _default_encoder(
            self.H, self.W, self.encoder_layers, self.C, slice_num=self.M
        )
        self.block = _TemporalBlock(
            dim=self.dim, sequential_head=1, mlp_ratio=self.mlp_ratio,
            act=self.act, dropout=self.dropout, causal=False, name="block",
        )
        # per-point slice head: MLP(C+2 -> 64 -> 1) over cat(code, pos)
        self.weight_projection = MLP(
            n_hidden=64, n_output=1, n_layers=0, res=False, act=self.act,
            name="weight_projection",
        )
        self.ln_3 = LN("ln_3")
        self.mlp2 = nn.Dense(
            1, kernel_init=trunc_normal_002, bias_init=zeros, name="mlp2"
        )

    def encode_frames(self, x, fx):
        B, N, T = fx.shape
        frames = fx.transpose(0, 2, 1).reshape(B * T, N, 1)
        xs = jnp.broadcast_to(x[:, None], (B, T) + x.shape[1:]).reshape(
            (B * T,) + x.shape[1:]
        )
        code, _ = self.encoder.encode(xs, frames)
        return jax.lax.stop_gradient(code.reshape(B, T, self.dim)[:, None])

    def predict_code(self, tokens):
        for _ in range(self.layers):
            tokens = self.block(tokens)
        B = tokens.shape[0]
        return tokens[:, :, -1].reshape(B, 1, self.M, self.C)

    def predicted_slice(self, pos, code):
        """Per-point MLP over cat(code [B,1,M,C], pos_i): vmapped over N
        instead of the reference's Python loop (SequenSolver.py:159-170)."""
        B, _, M, C = code.shape
        N = pos.shape[1]
        codeb = jnp.broadcast_to(code[:, 0][:, None], (B, N, M, C))
        posb = jnp.broadcast_to(pos[:, :, None, :], (B, N, M, pos.shape[-1]))
        concat = jnp.concatenate([codeb, posb], axis=-1)  # [B, N, M, C+2]
        logits = self.weight_projection(concat)[..., 0]  # [B, N, M]
        return jax.nn.softmax(logits, axis=-1)[:, None]  # [B, 1, N, M]

    def decode(self, code, slice_weights):
        decoded = jnp.einsum("bhgc,bhng->bhnc", code, slice_weights)
        B, H, N, C = decoded.shape
        decoded = decoded.transpose(0, 2, 1, 3).reshape(B, N, H * C)
        return self.mlp2(self.ln_3(decoded))

    def get_code(self, x, fx):
        return self.predict_code(self.encode_frames(x, fx))

    def solve_with_slice_learner(self, x, fx, slice_weights):
        """Decode the predicted code with EXTERNALLY predicted slice weights.

        Functional form of ``SequenSolver.solve_with_slice_learner``
        (``SequenSolver.py:182-291``): the caller runs a trained
        :class:`~..models.slice_learners.LearnSlice`/``SliceLearner`` head to
        produce ``slice_weights [B, 1, N, M]`` and passes them in (the
        reference loads the learner checkpoint inside the method and mutates
        ``self.slice_weights``).
        """
        code = self.predict_code(self.encode_frames(x, fx))
        return self.decode(code, slice_weights)

    def get_last_slice_weight(self, x, fx):
        _, w = self.encoder.encode(x, fx[:, :, -1:])
        return jax.lax.stop_gradient(w)

    def __call__(self, x, fx, y=None, use_gt: bool = True):
        tokens = self.encode_frames(x, fx)
        code = self.predict_code(tokens)
        if use_gt:
            assert y is not None, "use_gt=True requires the target frame y"
            _, w = self.encoder.encode(x, y)
            slice_weights = jax.lax.stop_gradient(w)
        else:
            # the original feeds raw 2D coordinates to the slice head
            slice_weights = self.predicted_slice(x, code)
        return self.decode(code, slice_weights)
