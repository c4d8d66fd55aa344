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
