"""Navier-Stokes vorticity benchmark trainer (reference: ``exp_ns.py``).

Autoregressive next-frame prediction on 64x64 vorticity: teacher-forced
training over T=10 steps with summed per-step rel-L2 (one backward through
the whole unroll, ``exp_ns.py:198-214``), closed-loop rollout for eval
(``exp_ns.py:230-238``).  Both loops are ``lax.scan`` under jit here.
The reference hard-codes its Windows data path over ``--data_path``
(``exp_ns.py:38``); here the flag is honored.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_ns_vorticity, meshgrid_pos
from ..models import get_model
from ..train.autoregressive import (
    closed_loop_rollout,
    make_teacher_forced_loss,
)
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import rel_lp
from .common import (
    base_parser,
    checkpoint_path,
    count_parameters,
    epoch_batches,
    maybe_load_params,
    save_figures,
)

T_IN = 10
T_OUT = 10
STEP = 1


def build_argparser():
    return base_parser(
        "Training Transolver (NS)",
        model="Transolver_2D",
        save_name="ns_2d_UniPDE",
        epochs=30,
        downsample=1,
    )


def build_model(args, h):
    return get_model(args.model)(
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        Time_Input=False,
        mlp_ratio=args.mlp_ratio,
        fun_dim=T_IN,
        out_dim=1,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=h,
        W=h,
        impl=args.impl,
        precision=args.precision,
    )


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)

    ntrain = ntest = 50
    train_a, train_u, test_a, test_u, h = load_ns_vorticity(
        args.data_path, ntrain, ntest, T_IN, T_OUT, args.downsample,
        synth_sims=args.synth_n,
    )
    ntrain, ntest = train_a.shape[0], test_a.shape[0]
    pos = meshgrid_pos(h)
    print("Dataloading is over.")

    model = build_model(args, h)
    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay, args.max_grad_norm
    )
    sample = (jnp.zeros((1, h * h, 2)), jnp.zeros((1, h * h, T_IN)))

    def forward(params):
        return lambda x, fx: model.apply({"params": params}, x, fx)

    @jax.jit
    def eval_batch(params, x, fx, yy):
        pred = closed_loop_rollout(forward(params), x, fx, T_OUT // STEP, STEP)
        b = x.shape[0]
        step_loss = sum(
            rel_lp(pred[..., t : t + 1].reshape(b, -1),
                   yy[..., t : t + 1].reshape(b, -1), reduction="sum")
            for t in range(T_OUT)
        )
        full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
        return step_loss, full, pred

    def evaluate(params):
        step_sum = full_sum = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            x = jnp.asarray(pos.repeat(len(idx), 0))
            s, f, _ = eval_batch(
                params, x, jnp.asarray(test_a[idx]), jnp.asarray(test_u[idx])
            )
            step_sum += float(s)
            full_sum += float(f)
        return step_sum / ntest / (T_OUT / STEP), full_sum / ntest

    if args.eval:
        template = model.init(jax.random.PRNGKey(0), *sample)["params"]
        params = maybe_load_params(args.save_name, template, geometry="grid2d")
        print("evaluation mode")
        count_parameters(params)
        _, full = evaluate(params)
        # figure dumps
        x = jnp.asarray(pos)
        _, _, pred = eval_batch(
            params, x, jnp.asarray(test_a[:1]), jnp.asarray(test_u[:1])
        )
        pred0 = np.asarray(pred)[0, :, -1].reshape(h, h)
        gt0 = test_u[0, :, -1].reshape(h, h)
        save_figures(
            args.save_name, 1,
            {"pred_20": pred0, "gt_20": gt0, "error_20": pred0 - gt0},
            clims={"pred_20": (-3, 3), "gt_20": (-3, 3), "error_20": (-2, 2)},
        )
        print(full)
        return full

    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(rng, model, sample, tx)
    count_parameters(state.params)
    update = make_update_fn(make_teacher_forced_loss(STEP))

    data_rng = np.random.default_rng(args.seed)
    for ep in range(args.epochs):
        train_step_l = train_full_l = 0.0
        for idx in epoch_batches(data_rng, ntrain, bsz):
            x = jnp.asarray(pos.repeat(len(idx), 0))
            fx = jnp.asarray(train_a[idx])
            yy = jnp.asarray(train_u[idx])
            state, (loss, aux) = update(state, x, fx, yy)
            train_step_l += float(aux["step_loss"])
            train_full_l += float(aux["full_loss"])
        test_step, test_full = evaluate(state.params)
        print(
            "Epoch {} , train_step_loss:{:.5f} , train_full_loss:{:.5f} , "
            "test_step_loss:{:.5f} , test_full_loss:{:.5f}".format(
                ep,
                train_step_l / ntrain / (T_OUT / STEP),
                train_full_l / ntrain,
                test_step,
                test_full,
            )
        )
        if ep % 100 == 0:
            print("save model")
            save_params(checkpoint_path(args.save_name), state.params, state.step)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    return evaluate(state.params)[1]


if __name__ == "__main__":
    main()
