"""End-to-end CLI smokes: every entry point runs its real ``main()``.

Each trainer runs 1 epoch on tiny synthetic data.  These are the rebuild's
replacement for the reference's manual notebook verification (SURVEY.md
section 4): every one of the 13 reference entry points (plus the exp_3d
scaling trainer) must train, evaluate and checkpoint end to end.
"""

import numpy as np
import pytest

TINY = [
    "--epochs", "1", "--synth_n", "6", "--batch-size", "2",
    "--n-hidden", "16", "--n-layers", "2", "--n-heads", "2",
    "--slice_num", "4",
]


def _run(module, extra=(), tiny=True):
    import importlib

    mod = importlib.import_module(
        f"transformerbasednavierstokesolver_tpu.cli.{module}"
    )
    return mod.main((TINY if tiny else []) + list(extra))


def _run_fn(module, fn, extra=()):
    import importlib

    mod = importlib.import_module(
        f"transformerbasednavierstokesolver_tpu.cli.{module}"
    )
    return getattr(mod, fn)(TINY + list(extra))


def _finite(value):
    assert value is None or np.isfinite(float(value))


def test_exp_darcy(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_darcy", ["--downsample", "20", "--save_name", "t"]))


def test_exp_ns(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_ns", ["--save_name", "t"]))


def test_exp_airfoil(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_airfoil", ["--downsamplex", "8", "--downsampley", "4",
                                 "--save_name", "t"]))


def test_exp_elas(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_elas", ["--save_name", "t"]))


def test_exp_pipe(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_pipe", ["--downsamplex", "8", "--downsampley", "8",
                              "--save_name", "t"]))


def test_exp_plas(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_plas", ["--save_name", "t"]))


def test_exp_3d(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("exp_3d", ["--size", "8", "--save_name", "t"]))


def test_ns_velocity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("ns_velocity", ["--save_name", "t"]))


@pytest.mark.parametrize(
    "entry",
    [
        "ns_velocity_unrolling_main",
        "ns_vorticity_unrolling_main",
        "ns_unrolling2_with_t_main",
    ],
)
def test_unrolling_variants(entry, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run_fn("unrolling", entry,
                    ["--downsample", "4", "--save_name", "t"]))


def test_auto_encoder(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(_run("auto_encoder", ["--downsample", "4", "--save_name", "t"]))


@pytest.mark.parametrize("variant", ["merged", "original"])
def test_sequen_solver(variant, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(
        _run(
            "sequen_solver",
            ["--variant", variant, "--sim_num", "2", "--epochs", "1",
             "--layers", "1", "--encoder_layers", "1", "--synth_n", "4",
             "--save_name", "t"],
            tiny=False,
        )
    )


def test_sequen_solver_finetune(tmp_path, monkeypatch):
    """--finetune_epochs unfreezes the encoder for the tail epochs.

    Asserts the phase actually trains the encoder: its params must change
    during the ft epoch (they are provably frozen before the switch).
    """
    monkeypatch.chdir(tmp_path)
    import jax
    from flax import serialization
    from transformerbasednavierstokesolver_tpu.cli import sequen_solver as ss

    base = ["--variant", "merged", "--sim_num", "2", "--epochs", "2",
            "--layers", "1", "--encoder_layers", "1", "--synth_n", "4"]
    _finite(ss.main(base + ["--finetune_epochs", "1", "--save_name", "t"]))
    # same seed, frozen all the way: its encoder stays at the (identical)
    # init, so any encoder delta is the ft epoch's training
    _finite(ss.main(base + ["--save_name", "t2"]))

    def enc(name):
        with open(ss.seq_ckpt(name), "rb") as f:
            return serialization.msgpack_restore(f.read())["params"]["encoder"]

    deltas = jax.tree_util.tree_map(
        lambda a, b: float(abs(a - b).sum()), enc("t"), enc("t2")
    )
    assert sum(jax.tree_util.tree_leaves(deltas)) > 0.0


def test_sequen_ft_phase_resume(tmp_path, monkeypatch, capsys):
    """Phase-aware resume (session-4 quirk fix): a run killed during the
    joint-ft phase must resume INTO ft — not re-enter the main phase at a
    bogus epoch (the ft phase restarts state.step at 0)."""
    monkeypatch.chdir(tmp_path)
    import os

    from transformerbasednavierstokesolver_tpu.cli import sequen_solver as ss
    from transformerbasednavierstokesolver_tpu.cli.common import (
        train_state_path,
    )

    base = ["--variant", "merged", "--sim_num", "2", "--epochs", "3",
            "--layers", "1", "--encoder_layers", "1", "--synth_n", "4",
            "--finetune_epochs", "2", "--save_name", "t"]
    _finite(ss.main(base))
    capsys.readouterr()
    assert os.path.exists(train_state_path("t_ft"))  # ft phase saved state

    # full ft-state resume: re-enters ft at its saved step, never touches
    # the main phase again
    _finite(ss.main(base + ["--resume", "1"]))
    out = capsys.readouterr().out
    assert "resumed ft phase" in out
    assert "unfreezing encoder" not in out

    # params-only resume (wipe scenario: .state files gone, ckpt survives):
    # the globally-stamped checkpoint step maps back into the ft phase
    os.remove(train_state_path("t_ft"))
    os.remove(train_state_path("t"))
    _finite(ss.main(base + ["--resume", "1"]))
    out = capsys.readouterr().out
    assert "resumed params+schedule" in out
    assert "unfreezing encoder" not in out
    # no main-phase epoch line may appear below the switch epoch
    assert "Epoch 0 " not in out


def test_sequen_rollout_loss(tmp_path, monkeypatch):
    """--rollout_loss trains on the closed-loop objective (merged variant);
    smoke both feedback-gradient modes."""
    monkeypatch.chdir(tmp_path)
    from transformerbasednavierstokesolver_tpu.cli import sequen_solver as ss

    base = ["--variant", "merged", "--sim_num", "2", "--epochs", "1",
            "--layers", "1", "--encoder_layers", "1", "--synth_n", "4",
            "--rollout_loss", "1"]
    _finite(ss.main(base + ["--rollout_bptt", "1", "--save_name", "rb"]))
    _finite(ss.main(base + ["--rollout_bptt", "0", "--save_name", "rs"]))


@pytest.mark.parametrize("mode", ["code", "previous", "vorticity",
                                  "slice_learner"])
def test_learn_slice(mode, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _finite(
        _run(
            "learn_slice",
            ["--mode", mode, "--sim_num", "2", "--epochs", "1",
             "--encoder_layers", "1", "--synth_n", "4", "--save_name", "t"],
            tiny=False,
        )
    )


def test_slice_learner_rollout_eval(tmp_path, monkeypatch, capsys):
    """End-to-end solve_with_slice_learner workflow: train a merged model,
    train a slice head against its (randomly-init, frozen) encoder, then
    roll out closed-loop decoding the merged codes with the head's slice
    weights (reference: SequenSolver.py:182-291 + shipped slice_*.pt)."""
    monkeypatch.chdir(tmp_path)
    import json

    from transformerbasednavierstokesolver_tpu.cli import learn_slice as ls

    _run(
        "sequen_solver",
        ["--variant", "merged", "--sim_num", "2", "--epochs", "1",
         "--layers", "1", "--encoder_layers", "1", "--synth_n", "4",
         "--save_name", "m"],
        tiny=False,
    )
    common = ["--mode", "vorticity", "--sim_num", "2", "--epochs", "1",
              "--encoder_layers", "1", "--synth_n", "4", "--save_name", "s"]
    ls.main(common)
    capsys.readouterr()
    ls.main(common + ["--rollout_eval", "1", "--merged_layers", "1",
                      "--merged_path", ls.seq_ckpt("m")])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    paths = {r["path"]: r for r in out}
    assert set(paths) == {"slice_learner", "merged_forward_slice"}
    for r in paths.values():
        assert np.isfinite(r["full_rel_l2"])
        assert len(r["per_frame_rel_l2"]) == 10

    # distillation target (--target merged): head trained against the
    # merged model's own forward_slice weights/codes (round-5 consistency
    # fix — gt-trained heads decode to skill zero through the merged
    # decoder), same rollout path
    common_m = ["--mode", "vorticity", "--sim_num", "2", "--epochs", "1",
                "--encoder_layers", "1", "--synth_n", "4",
                "--merged_layers", "1", "--merged_path", ls.seq_ckpt("m"),
                "--target", "merged", "--save_name", "sm"]
    ls.main(common_m)
    capsys.readouterr()
    ls.main(common_m + ["--rollout_eval", "1"])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    paths = {r["path"]: r for r in out}
    assert set(paths) == {"slice_learner", "merged_forward_slice"}
    assert all(np.isfinite(r["full_rel_l2"]) for r in paths.values())
