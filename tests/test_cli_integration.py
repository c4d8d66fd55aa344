"""End-to-end CLI integration smokes (opt-in: slow on CPU).

Run with ``TBNSS_RUN_CLI_TESTS=1 python -m pytest tests/test_cli_integration.py``.
Each trainer runs 1-2 epochs on tiny synthetic data through its real main().
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TBNSS_RUN_CLI_TESTS") != "1",
    reason="set TBNSS_RUN_CLI_TESTS=1 to run CLI integration tests",
)

TINY = [
    "--epochs", "1", "--synth_n", "6", "--batch-size", "2",
    "--n-hidden", "16", "--n-layers", "2", "--n-heads", "2",
    "--slice_num", "4",
]


def _run(module, extra=()):
    import importlib

    mod = importlib.import_module(
        f"transformerbasednavierstokesolver_tpu.cli.{module}"
    )
    return mod.main(TINY + list(extra))


def test_exp_darcy(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rel = _run("exp_darcy", ["--downsample", "20", "--save_name", "t"])
    assert rel == rel  # finite


def test_exp_ns(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run("exp_ns", ["--save_name", "t"])


def test_exp_airfoil(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run("exp_airfoil", ["--downsamplex", "8", "--downsampley", "4",
                         "--save_name", "t"])


def test_exp_elas(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run("exp_elas", ["--save_name", "t"])
