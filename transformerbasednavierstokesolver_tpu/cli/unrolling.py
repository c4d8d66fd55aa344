"""Solver-in-the-loop curriculum unrolling trainers.

Three fork variants built on the scan-based :class:`SOLTransolver`:

* ``ns_velocity_unrolling`` (reference ``ns_velocity_unrolling.py``):
  velocity .npy data, step=2, T=20 channels; per batch ONE unrolled forward,
  loss on the look-ahead-th frame only (``:225-233``); look_ahead +1 every
  40 epochs up to 8 (``:210-214``); eval rolls the INNER model; checkpoints
  save the inner model (``:299,306``).
* ``ns_vorticity_unrolling`` (reference ``ns_vorticity_unrolling.py``):
  FNO vorticity, step=1, T=10; outer loop slides by look_ahead with
  ground-truth re-insertion (``:232-238``); look_ahead doubles at
  epochs/2, threshold halving each time (``:216-223``).
* ``ns_unrolling2_with_t`` (reference ``ns_unrolling2_with_t.py``): slides
  over all t by step with gt re-insertion (``:223-229``); look_ahead +1
  every 10 epochs up to 4 (``:208-212``).

The look-ahead value is a static scan length -- each distinct value triggers
one recompile (<= 5 values over a run), as planned in SURVEY.md section 7.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_ns_velocity_npy, load_ns_vorticity, meshgrid_pos
from ..models import SOLTransolver, Transolver
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..train.autoregressive import closed_loop_rollout
from ..utils.losses import rel_lp
from .common import dp_put, base_parser, checkpoint_path, count_parameters, epoch_batches


def advance_curriculum(variant, ep, look_ahead, thresh, max_look_ahead):
    """Reference-exact look-ahead schedules; returns (look_ahead, thresh).

    * velocity: +1 every 40 epochs from ep 40 while <= cap
      (``ns_velocity_unrolling.py:210-214``).  The reference's
      pre-increment guard (``look_ahead <= max_look_ahead`` THEN ``+= 1``)
      lets look_ahead reach cap+1 -- preserved exactly (a round-3 review
      found an earlier ``min()`` clamp silently trained the last 180
      epochs at 8 instead of the reference's 9);
    * vorticity: x2 whenever ``ep % thresh == 0 and ep >= thresh`` (float
      modulo), and here the reference DOES clamp at the cap after the
      doubling (``ns_vorticity_unrolling.py:216-223``), threshold halving
      each time;
    * with_t: +1 every 10 epochs from ep 10 while <= cap, reaching cap+1
      like velocity (``ns_unrolling2_with_t.py:208-212``).
    """
    if variant == "velocity":
        if ep % 40 == 0 and ep >= 40 and look_ahead <= max_look_ahead:
            look_ahead += 1
    elif variant == "vorticity":
        if thresh > 0 and ep % thresh == 0 and ep >= thresh and look_ahead <= max_look_ahead:
            look_ahead = min(look_ahead * 2, max_look_ahead)
            thresh = thresh / 2
    elif variant == "with_t":
        if ep % 10 == 0 and ep >= 10 and look_ahead <= max_look_ahead:
            look_ahead += 1
    else:
        raise ValueError(variant)
    return look_ahead, thresh


def _sol_model(args, h, fun_dim, out_dim, step, look_ahead):
    return SOLTransolver(
        look_ahead=look_ahead,
        step=step,
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        mlp_ratio=args.mlp_ratio,
        fun_dim=fun_dim,
        out_dim=out_dim,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=h,
        W=h,
        impl=args.impl,
        precision=args.precision,
    )


def _inner_model(args, h, fun_dim, out_dim):
    return Transolver(
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        mlp_ratio=args.mlp_ratio,
        fun_dim=fun_dim,
        out_dim=out_dim,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        geometry="grid2d",
        H=h,
        W=h,
        impl=args.impl,
        precision=args.precision,
    )


def _run(args, variant, data_tuple, h, fun_dim, out_dim, step, T,
         look_ahead0, max_look_ahead):
    """Shared driver; ``variant`` selects the loss scheme + curriculum."""
    put = dp_put(getattr(args, "mesh", "auto"))
    train_a, train_u, test_a, test_u = data_tuple
    ntrain, ntest = train_a.shape[0], test_a.shape[0]
    pos = meshgrid_pos(h)
    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay,
        args.max_grad_norm,
    )
    model = _sol_model(args, h, fun_dim, out_dim, step, look_ahead0)
    inner = _inner_model(args, h, fun_dim, out_dim)
    sample = (jnp.zeros((1, h * h, 2)), jnp.zeros((1, h * h, fun_dim)))

    def inner_params(params):
        return params["unroll"]["transolver_model"]

    @jax.jit
    def eval_batch(params, x, fx, yy):
        ip = {"params": inner_params(params)}
        forward = lambda x_, f_: inner.apply(ip, x_, f_)
        pred = closed_loop_rollout(forward, x, fx, T // step, step)
        b = x.shape[0]
        step_loss = sum(
            rel_lp(pred[..., t : t + step].reshape(b, -1),
                   yy[..., t : t + step].reshape(b, -1), reduction="sum")
            for t in range(0, T, step)
        )
        full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
        return step_loss, full

    def evaluate(params):
        s_sum = f_sum = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            x = put(pos.repeat(len(idx), 0))
            s, f = eval_batch(
                params, x, put(test_a[idx]), put(test_u[idx])
            )
            s_sum += float(s)
            f_sum += float(f)
        return s_sum / ntest / (T / step), f_sum / ntest

    # --- per-variant loss builders (look_ahead is static per compile) ---
    def make_loss(look_ahead):
        offset = step * look_ahead

        def sol_forward(params, apply_fn, x, fx):
            return apply_fn({"params": params}, x, fx, look_ahead)

        if variant == "velocity":
            def loss_fn(params, apply_fn, x, fx, yy):
                b = x.shape[0]
                y = yy[..., offset - step : offset]
                im = sol_forward(params, apply_fn, x, fx)
                return rel_lp(im.reshape(b, -1), y.reshape(b, -1),
                              reduction="sum"), {}
        elif variant == "vorticity":
            def loss_fn(params, apply_fn, x, fx, yy):
                b = x.shape[0]
                loss = 0.0
                for t in range(0, T - look_ahead + 1, look_ahead):
                    y = yy[..., t + offset - step : t + offset]
                    im = sol_forward(params, apply_fn, x, fx)
                    loss = loss + rel_lp(
                        im.reshape(b, -1), y.reshape(b, -1), reduction="sum"
                    )
                    y_next = yy[..., t : t + look_ahead]
                    fx = jnp.concatenate([fx[..., look_ahead:], y_next], -1)
                return loss, {}
        elif variant == "with_t":
            def loss_fn(params, apply_fn, x, fx, yy):
                b = x.shape[0]
                loss = 0.0
                for t in range(0, T - offset + step, step):
                    y = yy[..., t + offset - step : t + offset]
                    im = sol_forward(params, apply_fn, x, fx)
                    loss = loss + rel_lp(
                        im.reshape(b, -1), y.reshape(b, -1), reduction="sum"
                    )
                    next_y = yy[..., t : t + step]
                    fx = jnp.concatenate([fx[..., step:], next_y], -1)
                return loss, {}
        else:
            raise ValueError(variant)

        return loss_fn

    ckpt = checkpoint_path(args.save_name)

    if args.eval:
        from ..train.checkpoint import restore_params
        from .common import maybe_load_params

        template = inner.init(jax.random.PRNGKey(0), *sample)["params"]
        ip = maybe_load_params(args.save_name, template, geometry="grid2d")
        params = {"unroll": {"transolver_model": ip}}
        _, full = evaluate(params)
        print(full / 1.0)
        return full

    state = create_train_state(jax.random.PRNGKey(args.seed), model, sample, tx)
    count_parameters(state.params)

    update_cache = {}

    def get_update(look_ahead):
        if look_ahead not in update_cache:
            update_cache[look_ahead] = make_update_fn(
                make_loss(look_ahead), donate=False
            )
        return update_cache[look_ahead]

    look_ahead = look_ahead0
    thresh = args.epochs / 2  # vorticity curriculum threshold
    data_rng = np.random.default_rng(args.seed)
    for ep in range(args.epochs):
        new_la, thresh = advance_curriculum(
            variant, ep, look_ahead, thresh, max_look_ahead
        )
        if new_la != look_ahead:
            look_ahead = new_la
            print(f"look ahead increased {look_ahead}")

        update = get_update(look_ahead)
        train_l = 0.0
        for idx in epoch_batches(data_rng, ntrain, bsz):
            x = put(pos.repeat(len(idx), 0))
            state, (loss, _) = update(
                state, x, put(train_a[idx]), put(train_u[idx])
            )
            train_l += float(loss)
        ts, tf = evaluate(state.params)
        print(
            "Epoch {} , train_step_loss:{:.5f} , test_step_loss:{:.5f} , "
            "test_full_loss:{:.5f}".format(ep, train_l, ts, tf)
        )
        if ep % 100 == 0:
            print("save model")
            save_params(ckpt, inner_params(state.params), state.step)

    print("save model")
    # the reference saves the INNER model's state dict only
    save_params(ckpt, inner_params(state.params), state.step)
    return evaluate(state.params)[1]


# ---------------------------------------------------------------------------


def _load_velocity(args, t_in_ch, t_out_ch, ntrain, ntest,
                   fname="ns_50_20.npy", default_sims=50):
    path = args.data_path
    if os.path.isdir(path):
        path = os.path.join(path, fname)
    frames = (t_in_ch + t_out_ch) // 2
    data = load_ns_velocity_npy(
        path, sims=args.synth_n or default_sims, frames=frames
    )
    ntrain = min(ntrain, max(data.shape[0] - 2, 1))
    # keep at least one test sim (overlapping train only in the degenerate
    # 1-sim smoke case) -- ntest=0 would divide evaluate() by zero
    ntest = max(min(ntest, data.shape[0] - ntrain), 1)
    r = args.downsample
    h = int(((64 - 1) / r) + 1)

    def prep(block):
        return block.reshape(block.shape[0], -1, block.shape[-1]).copy()

    return (
        prep(data[:ntrain, ::r, ::r, :t_in_ch][:, :h, :h, :]),
        prep(data[:ntrain, ::r, ::r, t_in_ch : t_in_ch + t_out_ch][:, :h, :h, :]),
        prep(data[-ntest:, ::r, ::r, :t_in_ch][:, :h, :h, :]),
        prep(data[-ntest:, ::r, ::r, t_in_ch : t_in_ch + t_out_ch][:, :h, :h, :]),
    ), h


def ns_velocity_unrolling_main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = base_parser(
        "SOL velocity unrolling", save_name="ns_velocity_unrolling",
        epochs=500, downsample=1,
    ).parse_args(argv)
    data, h = _load_velocity(args, 20, 20, 40, 10)
    return _run(args, "velocity", data, h, fun_dim=20, out_dim=2, step=2,
                T=20, look_ahead0=1, max_look_ahead=8)


def ns_vorticity_unrolling_main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = base_parser(
        "SOL vorticity unrolling", save_name="ns_vorticity_unrolling",
        epochs=500, downsample=1,
    ).parse_args(argv)
    train_a, train_u, test_a, test_u, h = load_ns_vorticity(
        args.data_path, 100, 50, 10, 10, args.downsample,
        synth_sims=args.synth_n,
    )
    return _run(args, "vorticity", (train_a, train_u, test_a, test_u), h,
                fun_dim=10, out_dim=1, step=1, T=10,
                look_ahead0=1, max_look_ahead=10)


def ns_unrolling2_with_t_main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = base_parser(
        "SOL unrolling2", save_name="ns_unrolling2_with_t",
        epochs=500, downsample=1,
    ).parse_args(argv)
    # reference config: ns_20_20.npy, T_in = T = 10 channels, 16/4 split
    # (ns_unrolling2_with_t.py:40-48) -- a round-3 review found this
    # trainer had silently run the velocity trainer's 20/20/40/10 config
    data, h = _load_velocity(args, 10, 10, 16, 4,
                             fname="ns_20_20.npy", default_sims=20)
    return _run(args, "with_t", data, h, fun_dim=10, out_dim=2, step=2,
                T=10, look_ahead0=1, max_look_ahead=4)
