"""Eval engines (pc/sgc/sgd) and the training loop on synthetic data."""

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.eval import engines  # noqa: E402
from scene_graph_commonsense_tpu.models.relation_head import (  # noqa: E402
    make_relation_classifier)


def _batches(rng, cfg, n):
    return [tiny_batch(rng, cfg, with_aug=False) for _ in range(n)]


def test_run_eval_pc(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    res = engines.run_eval_pc(cfg, model, params, _batches(rng, cfg, 2))
    assert len(res["recall"]) == 3
    assert all(0 <= r <= 1 for r in res["recall"])
    assert "top3" in res      # hierarchical VG reports Recall@k*
    assert all(0 <= r <= 1 for r in res["top3"]["recall"])


def fake_detect_fn(rng, cfg):
    """Synthesizes detections near the GT boxes with ~80% correct labels."""

    def detect(batch):
        boxes = np.asarray(batch["boxes"]).copy()
        cats = np.asarray(batch["cats"]).copy()
        valid = np.asarray(batch["valid"]).copy()
        flip = rng.random(cats.shape) < 0.2
        cats = np.where(flip, (cats + 3) % cfg.model.num_classes, cats)
        conf = rng.random(cats.shape).astype(np.float32) * 0.5 + 0.5
        return {"cats": cats.astype(np.int32),
                "cat_conf": conf * valid,
                "boxes": boxes, "valid": valid}

    return detect


def test_run_eval_sgc(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    res = engines.run_eval_sgc(cfg, model, params, _batches(rng, cfg, 2),
                               detect_fn=fake_detect_fn(rng, cfg))
    assert all(0 <= r <= 1 for r in res["recall"])


def test_run_eval_sgd(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    res = engines.run_eval_sgd(cfg, model, params, _batches(rng, cfg, 2),
                               detect_fn=fake_detect_fn(rng, cfg))
    assert all(0 <= r <= 1 for r in res["recall"])


def test_match_predicted_labels(rng):
    det = {"boxes": np.array([[[0, 10, 0, 10], [12, 20, 12, 20]]],
                             np.float32),
           "cats": np.array([[7, 9]], np.int32),
           "cat_conf": np.array([[0.9, 0.8]], np.float32),
           "valid": np.ones((1, 2), bool)}
    gt_boxes = np.array([[[0, 10, 0, 10], [12, 20, 12, 20],
                          [0, 0, 0, 0]]], np.float32)
    gt_valid = np.array([[True, True, False]])
    cats, conf = engines.match_predicted_labels(det, gt_boxes, gt_valid)
    np.testing.assert_array_equal(cats[0, :2], [7, 9])
    np.testing.assert_allclose(conf[0, :2], [0.9, 0.8], atol=1e-6)
    assert cats[0, 2] == 0 and conf[0, 2] == 0


def test_fit_smoke(tmp_path, rng):
    from scene_graph_commonsense_tpu.train.loop import fit
    from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib

    cfg = tiny_cfg()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, num_epoch=1, print_freq=1,
        checkpoint_path=str(tmp_path) + "/",
        result_path=str(tmp_path) + "/results/"))
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    train_batches = [tiny_batch(rng, cfg) for _ in range(2)]
    test_batches = [tiny_batch(rng, cfg, with_aug=False)]

    lines = []
    state = fit(cfg, model, params,
                train_batches_fn=lambda e: iter(train_batches),
                test_batches_fn=lambda e: iter(test_batches),
                steps_per_epoch=2, log_fn=lines.append)
    assert int(state.step) == 2
    assert any("TEST" in ln for ln in lines)

    # checkpoint restorable and equal
    name = ckpt_lib.checkpoint_name(True, "train", "motif", 0)
    restored = ckpt_lib.restore(str(tmp_path) + "/" + name,
                                template=jax.device_get(state.params))
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a)
                                                   - np.asarray(b)).max()),
                         jax.device_get(state.params), restored)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_cli_synthetic_smoke(tmp_path):
    """main.py --synthetic end-to-end (eval pc)."""
    import subprocess
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "main.py", "--run_mode", "eval", "--eval_mode",
         "pc", "--hierar", "--synthetic", "1", "--batch_size", "2"],
        capture_output=True, text=True, env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "recall" in out.stdout


def test_checkpoint_restore(tmp_path, rng):
    """continue_train + start_epoch resumes from the previous epoch's
    checkpoint (reference train_test.py:83-94)."""
    from scene_graph_commonsense_tpu.train.loop import fit

    cfg = tiny_cfg()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, num_epoch=1, print_freq=1, eval_freq=0,
        checkpoint_path=str(tmp_path) + "/",
        result_path=str(tmp_path) + "/results/"))
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    train_batches = [tiny_batch(rng, cfg)]
    state0 = fit(cfg, model, params,
                 train_batches_fn=lambda e: iter(train_batches),
                 steps_per_epoch=1, log_fn=lambda s: None)
    trained = jax.device_get(state0.params)

    # resume run: epoch 1 must start from the epoch-0 checkpoint
    cfg2 = cfg.replace(training=dataclasses.replace(
        cfg.training, num_epoch=2, start_epoch=1, continue_train=True,
        checkpoint_path=str(tmp_path) + "/",
        result_path=str(tmp_path) + "/results/"))
    fresh = init_params(cfg, model, rng)
    lines = []
    state1 = fit(cfg2, model, fresh,
                 train_batches_fn=lambda e: iter([]),  # no batches: params
                 steps_per_epoch=1, log_fn=lines.append)  # stay as loaded
    assert any("Resumed relation weights" in ln for ln in lines)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state1.params), trained)
    assert max(jax.tree.leaves(diffs)) == 0.0
