"""Observability: ScalarWriter / StepTimer / StepProfiler (SURVEY.md §5)."""

import json
import os
import time

import numpy as np

from scene_graph_commonsense_tpu.utils.profiling import (
    ScalarWriter, StepProfiler, StepTimer)


def test_scalar_writer_disabled_is_noop(tmp_path):
    w = ScalarWriter(str(tmp_path / "tb"), enabled=False)
    w.scalar("x", 1.0, 0)
    w.close()
    assert not os.path.exists(tmp_path / "tb")


def test_scalar_writer_records(tmp_path):
    logdir = str(tmp_path / "tb")
    w = ScalarWriter(logdir, enabled=True)
    w.scalars({"loss_relationship": 1.5, "loss_connectivity": 0.2}, step=3,
              prefix="train/")
    w.close()
    # either a TB event file or the JSONL fallback must exist
    files = os.listdir(logdir)
    assert files
    jsonl = os.path.join(logdir, "scalars.jsonl")
    if os.path.exists(jsonl):
        recs = [json.loads(line) for line in open(jsonl)]
        tags = {r["tag"] for r in recs}
        assert "train/loss_relationship" in tags


def test_step_timer_summary():
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    s = t.summary(items_per_step=4)
    assert s["step_ms_mean"] >= 9.0
    assert np.isclose(s["throughput"], 4 / (s["step_ms_mean"] / 1e3),
                      rtol=1e-6)


def test_step_profiler_window(tmp_path):
    logdir = str(tmp_path / "trace")
    p = StepProfiler(logdir, start=1, num=2)
    import jax
    for i in range(5):
        p.step(i)
        jax.numpy.ones(4).block_until_ready()
    p.close()
    # jax writes plugins/profile/<run>/ under the logdir
    found = any("profile" in dirs
                for _, dirs, _ in os.walk(logdir))
    assert found


def test_step_profiler_disabled():
    p = StepProfiler("", start=0, num=2)
    for i in range(3):
        p.step(i)
    p.close()
