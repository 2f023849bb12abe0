"""End-to-end engine for the plug-and-play predictor families."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scene_graph_commonsense_tpu.config import derive
from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
from scene_graph_commonsense_tpu.train import pnp_engine
from scene_graph_commonsense_tpu.train.engine import TrainState


def _cfg():
    return derive("vg", hierarchical_pred=True,
                  data={"max_objects": 6},
                  training={"batch_size": 2, "num_epoch": 1,
                            "print_freq": 1, "pair_capacity": 0})


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = synthetic_batch(rng, batch_size=cfg.training.batch_size,
                        max_objects=cfg.data.max_objects,
                        feature_size=cfg.model.feature_size,
                        num_channels=cfg.model.num_img_feature,
                        with_aug=False)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_roi_pool_is_box_local():
    """Features outside an object's box must not leak into its pooled
    feature."""
    cfg = _cfg()
    feats = jnp.zeros((1, 32, 32, 4))
    feats = feats.at[0, :8, :8, :].set(1.0)   # content only in topleft
    # box grid convention (x_min, x_max, y_min, y_max) on the feature grid
    boxes = jnp.asarray([[[0, 8, 0, 8], [16, 32, 16, 32]]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    pooled = pnp_engine.roi_pool_features(feats, boxes, valid)
    assert float(pooled[0, 0, 0]) > 0.9
    assert float(pooled[0, 1, 0]) < 1e-6


@pytest.mark.parametrize("family", ["motifs", "vctree"])
def test_pnp_train_step_decreases_loss(family):
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, family)
    params = pnp_engine.init_predictor_params(cfg, predictor)
    opt = optax.adamw(1e-3)
    step = pnp_engine.make_pnp_train_step(predictor, cfg, opt)
    state = TrainState(params, opt.init(params), jnp.int32(0))
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pnp_train_step_with_commonsense_penalty():
    """train_cs composition for pnp families (reference composes the
    commonsense penalty with every model it trains, train_utils.py:36-60):
    the penalty is positive with empty aligned tables (every prediction
    pays the weak term), zero when every triplet is aligned."""
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "motifs")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    opt = optax.adamw(1e-3)
    n_ids = 150 * 50 * 150
    empty = jnp.zeros(n_ids, bool)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)

    def fresh_state():   # the step donates (and deletes) its state input
        p = jax.tree.map(jnp.array, params)
        return TrainState(p, opt.init(p), jnp.int32(0))

    step = pnp_engine.make_pnp_train_step(
        predictor, cfg, opt, cs_tables=(empty, empty))
    _, metrics = step(fresh_state(), batch, rng)
    assert float(metrics["loss_commonsense"]) > 0

    step_ok = pnp_engine.make_pnp_train_step(
        predictor, cfg, opt, cs_tables=(jnp.ones(n_ids, bool), empty))
    _, metrics_ok = step_ok(fresh_state(), batch, rng)
    assert float(metrics_ok["loss_commonsense"]) == 0.0
    assert float(metrics["loss"]) > float(metrics_ok["loss"])


def test_pnp_eval_produces_recall():
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "transformer")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    batches = [_batch(cfg, seed=i) for i in range(2)]
    res = pnp_engine.run_eval_pc_predictor(cfg, predictor, params, batches)
    assert len(res["recall"]) == 3
    assert all(0.0 <= r <= 1.0 for r in res["recall"])


def test_cli_predictor_smoke():
    cmd = [sys.executable, "main.py", "--run_mode", "train", "--eval_mode",
           "pc", "--hierar", "--synthetic", "2", "--batch_size", "2",
           "--predictor", "motifs", "--epochs", "1"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[pnp:motifs]" in out.stdout
    assert "TEST" in out.stdout


def test_vctree_structure_params_receive_gradient():
    """The supervised structure loss must give score_q/score_k/rootness
    nonzero gradients (Prim's argmax alone would leave them dead)."""
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "vctree")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    opt = optax.adamw(1e-3)
    step = pnp_engine.make_pnp_train_step(predictor, cfg, opt)
    # the step donates its input state; keep host copies of the old kernels
    ctx_old = jax.tree.map(np.asarray, params["params"]["context"])
    state = TrainState(params, opt.init(params), jnp.int32(0))
    batch = _batch(cfg)
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    ctx_new = new_state.params["params"]["context"]
    for name in ("score_q", "score_k", "rootness"):
        delta = float(jnp.max(jnp.abs(ctx_new[name]["kernel"]
                                      - ctx_old[name]["kernel"])))
        assert delta > 0, f"{name} received no update"


def test_vtranse_train_step_decreases_loss():
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "vtranse")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    opt = optax.adamw(1e-3)
    step = pnp_engine.make_pnp_train_step(predictor, cfg, opt)
    state = TrainState(params, opt.init(params), jnp.int32(0))
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_tde_zero_when_visual_uninformative():
    """TDE = factual - counterfactual(mean visual features); when the
    feature map is constant, pooled features already equal their mean, so
    every TDE relation score must be exactly zero while the factual scores
    are not."""
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "motifs")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    batch = _batch(cfg)
    batch["features"] = jnp.ones_like(batch["features"]) * 0.3
    plain = pnp_engine.make_pnp_eval_step(predictor, cfg)(params, batch)
    tde = pnp_engine.make_pnp_eval_step(predictor, cfg, tde=True)(
        params, batch)
    assert float(jnp.max(jnp.abs(tde["relation"]))) < 1e-5
    assert float(jnp.max(jnp.abs(plain["relation"]))) > 1e-3


def test_tde_keeps_masks_and_connectivity():
    """TDE only re-scores relation/super outputs; pair bookkeeping and the
    connectivity logit stay factual."""
    cfg = _cfg()
    predictor = pnp_engine.make_predictor(cfg, "vtranse")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    batch = _batch(cfg)
    plain = pnp_engine.make_pnp_eval_step(predictor, cfg)(params, batch)
    tde = pnp_engine.make_pnp_eval_step(predictor, cfg, tde=True)(
        params, batch)
    np.testing.assert_array_equal(np.asarray(tde["pair_mask"]),
                                  np.asarray(plain["pair_mask"]))
    np.testing.assert_array_equal(np.asarray(tde["connectivity"]),
                                  np.asarray(plain["connectivity"]))
    assert float(jnp.max(jnp.abs(tde["relation"]
                                 - plain["relation"]))) > 1e-4


def test_pnp_sharded_eval_matches_single_device():
    """GSPMD-sharded predictor eval (incl. the TDE global-mean
    counterfactual) must reproduce single-device outputs exactly."""
    from scene_graph_commonsense_tpu.parallel.mesh import make_mesh

    cfg = derive("vg", hierarchical_pred=True,
                 data={"max_objects": 6},
                 training={"batch_size": 8, "pair_capacity": 0})
    predictor = pnp_engine.make_predictor(cfg, "motifs")
    params = pnp_engine.init_predictor_params(cfg, predictor)
    batch = _batch(cfg)
    mesh = make_mesh(data=8, model=1)
    for tde in (False, True):
        e1 = pnp_engine.make_pnp_eval_step(predictor, cfg, tde=tde)
        e8 = pnp_engine.make_pnp_eval_step(predictor, cfg, tde=tde,
                                           mesh=mesh)
        o1 = jax.tree.map(np.asarray, e1(params, batch))
        o8 = jax.tree.map(np.asarray, e8(params, batch))
        for k in o1:
            np.testing.assert_allclose(o1[k], o8[k], atol=1e-5,
                                       err_msg=f"tde={tde} key={k}")
