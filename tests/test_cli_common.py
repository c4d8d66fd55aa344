"""CLI plumbing: dp_put sharding and the metrics logger."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.cli.common import (
    MetricsLogger,
    dp_put,
    epoch_batches,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_put_shards_divisible_batches():
    put = dp_put()
    a = put(np.zeros((8, 6, 3), np.float32))
    assert "data" in str(a.sharding)
    b = put(np.zeros((5, 6, 3), np.float32))  # non-divisible -> unsharded
    assert "data" not in str(b.sharding) or b.sharding.is_fully_replicated


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, samples_per_epoch=10)
    log.log(0, loss=1.5)
    log.log(1, loss=jnp.float32(0.75), note="x")
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["epoch"] == 0 and recs[0]["loss"] == 1.5
    assert recs[1]["loss"] == 0.75 and recs[1]["note"] == "x"
    assert all("wall_s" in r and "samples_per_sec" in r for r in recs)


def test_epoch_batches_covers_everything():
    rng = np.random.default_rng(0)
    seen = np.concatenate(list(epoch_batches(rng, 10, 3)))
    assert sorted(seen.tolist()) == list(range(10))


def test_runtime_flags_profile_and_nan_debug(tmp_path, monkeypatch):
    """--profile opens a jax.profiler trace; --nan_debug flips jax_debug_nans
    (the observability wiring the reference lacks, SURVEY.md section 5)."""
    from transformerbasednavierstokesolver_tpu.cli.common import base_parser
    from transformerbasednavierstokesolver_tpu.utils import profiling

    assert not jax.config.jax_debug_nans
    args = base_parser("t").parse_args(
        ["--profile", str(tmp_path / "prof"), "--nan_debug", "1"]
    )
    try:
        assert jax.config.jax_debug_nans
        assert profiling._TRACE_ACTIVE[0]
        # something must actually be traced and written on stop
        float(jnp.sum(jnp.ones((4, 4)) @ jnp.ones((4, 4))))
    finally:
        profiling.enable_nan_debugging(False)
        jax.profiler.stop_trace()
        profiling._TRACE_ACTIVE[0] = False
    import glob

    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)
