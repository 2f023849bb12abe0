"""Full-ladder CLI dress rehearsal on a fabricated mini-VG.

Drives `python main.py` end to end through every run_mode of the reference's
mode matrix (reference main.py:103-123) on a miniature dataset in the
reference's on-disk format (tools/make_mini_vg.py):

  train -> eval pc -> prepare_cs (--mock-llm) -> train_cs -> eval_cs
        -> eval sgc -> eval sgd (random DETR) -> --predictor motifs
        train / eval / eval --tde

Asserts each stage exits 0 and produces its artifact (checkpoints,
commonsense triplet tables, recall JSON lines), and that PredCLS recall
beats chance after training (the mini scenes follow a class-pair ->
predicate grammar the label-conditioned head can learn).

Marked slow: the ladder compiles the full DETR encoder on CPU once (a
shared JAX compilation cache keeps the later stages fast).
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_vg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mini_vg")
    out = tmp / "data"
    subprocess.run(
        [sys.executable, "tools/make_mini_vg.py", "--out", str(out),
         "--images", "48", "--feature-size", "8", "--image-size", "256",
         "--max-objects", "8", "--num-classes", "10"],
        cwd=ROOT, check=True, timeout=300)
    art = out / "artifacts"
    art.mkdir()
    # real converted zero-shot / sub2super tables, in a private copy so
    # prepare_cs output cannot clobber the repo artifact
    import shutil
    shutil.copy(os.path.join(ROOT, "datasets/artifacts/vg_artifacts.npz"),
                art / "vg_artifacts.npz")
    (tmp / "ckpt").mkdir()
    (tmp / "results").mkdir()

    cfg = f"""
data:
  image_dir: {out}/images
  annot_dir: {out}/annot
  annotation_train: {out}/instances_vg_train.json
  annotation_test: {out}/instances_vg_test.json
  artifacts_dir: {art}
  max_objects: 8
model:
  image_size: 256
  feature_size: 8
  hidden_dim: 16
  compute_dtype: float32
  detr_pretrained: {tmp}/no_such_checkpoint.msgpack
training:
  batch_size: 2
  num_epoch: 3
  learning_rate: 0.003
  grad_clip_norm: 1.0
  lambda_contrast: 0.0   # SupCon diverges on the tiny toy set and drowns
                         # the relationship gradient; the contrastive path
                         # has its own unit/parity coverage (test_losses)
  print_freq: 5
  eval_freq: 0
  test_epoch: 2
  checkpoint_path: {tmp}/ckpt/
  result_path: {tmp}/results/
"""
    cfg_path = tmp / "mini.yaml"
    cfg_path.write_text(cfg)
    return {"tmp": tmp, "cfg": str(cfg_path), "art": art}


def run_cli(mini, *args, timeout=1800):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=str(mini["tmp"] / "jaxcache"))
    proc = subprocess.run(
        [sys.executable, "main.py", "--config", mini["cfg"], *args],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, \
        f"CLI {' '.join(args)} failed:\n{proc.stdout[-3000:]}\n" \
        f"{proc.stderr[-3000:]}"
    return proc.stdout


def _last_json(stdout):
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON result line in:\n{stdout[-2000:]}")


@pytest.mark.slow
def test_full_ladder(mini_vg):
    tmp = mini_vg["tmp"]

    # ---- train (baseline) ----
    out = run_cli(mini_vg, "--run_mode", "train", "--eval_mode", "pc",
                  "--hierar")
    assert "Saved checkpoint" in out
    assert (tmp / "ckpt" / "HierRelationModel_Baseline_motif2").exists()
    test_lines = re.findall(r"TEST, epoch \d+, R@k: ([\d.]+), ([\d.]+), "
                            r"([\d.]+)", out)
    assert test_lines, out[-2000:]

    # ---- eval pc: beats chance on the learnable grammar ----
    out = run_cli(mini_vg, "--run_mode", "eval", "--eval_mode", "pc",
                  "--hierar")
    res = _last_json(out)
    assert res["recall"][2] > 0.2, res      # R@100 well above random

    # ---- prepare_cs with the mock LLM ----
    out = run_cli(mini_vg, "--run_mode", "prepare_cs", "--eval_mode", "pc",
                  "--hierar", "--mock-llm")
    cs_path = mini_vg["art"] / "commonsense_triplets.npz"
    assert cs_path.exists()
    cs = np.load(cs_path)
    assert len(cs["cs_aligned_sub"]) > 0

    # ---- train_cs (commonsense penalty active) ----
    out = run_cli(mini_vg, "--run_mode", "train_cs", "--eval_mode", "pc",
                  "--hierar")
    assert (tmp / "ckpt" / "HierRelationModel_CS_motif2").exists()
    # the penalty must be LIVE, not just the checkpoint written: the raw
    # recorded loss_commonsense (full precision, unlike the 4-decimal
    # stdout line) nonzero somewhere — the mock LLM rejects ~25% of
    # edges, so the violated table is non-empty
    with open(tmp / "results" / "train_results.json") as f:
        recs = json.load(f)
    cs_terms = [r["loss_commonsense"] for r in recs
                if "loss_commonsense" in r]
    assert cs_terms and any(abs(c) > 0 for c in cs_terms), \
        f"commonsense term never live: {cs_terms[:8]}"

    # ---- eval_cs ----
    out = run_cli(mini_vg, "--run_mode", "eval_cs", "--eval_mode", "pc",
                  "--hierar")
    res_cs = _last_json(out)
    assert res_cs["num_targets"] > 0

    # ---- eval sgc / sgd with the random-weight DETR ----
    for mode in ("sgc", "sgd"):
        out = run_cli(mini_vg, "--run_mode", "eval", "--eval_mode", mode,
                      "--hierar")
        res = _last_json(out)
        assert "recall" in res and len(res["recall"]) == 3

    # ---- plug-and-play predictor: train, train_cs, eval, eval --tde ----
    out = run_cli(mini_vg, "--run_mode", "train", "--eval_mode", "pc",
                  "--hierar", "--predictor", "motifs")
    assert (tmp / "ckpt" / "PnpMotifsModel_motif2").exists(), out[-2000:]
    out = run_cli(mini_vg, "--run_mode", "train_cs", "--eval_mode", "pc",
                  "--hierar", "--predictor", "motifs")
    assert "resumed baseline weights" in out
    assert (tmp / "ckpt" / "PnpMotifsModel_CS_motif2").exists()
    out = run_cli(mini_vg, "--run_mode", "eval", "--eval_mode", "pc",
                  "--hierar", "--predictor", "motifs")
    assert "recall" in _last_json(out)
    out = run_cli(mini_vg, "--run_mode", "eval", "--eval_mode", "pc",
                  "--hierar", "--predictor", "motifs", "--tde")
    assert "recall" in _last_json(out)


@pytest.mark.slow
def test_full_loss_training(mini_vg):
    """The flagship loss configuration — SupCon contrastive term active
    (lambda_contrast > 0) AND faithful_dynamics (the reference's
    per-direction triangular re-accumulation + dynamic LR factor,
    reference train_test.py:260-272) — trains end to end: every printed
    loss term stays finite and eval recall still beats chance.

    The main ladder trains with lambda_contrast 0 because SupCon at the
    reference's weight drowns the relation gradient on the toy grammar;
    this leg runs the full composition at lambda_contrast 0.3 — the term
    is live in the backward (asserted below) without monopolizing the
    clipped gradient the way weight 1.0 does on 23-target toy data
    (measured: weight 1.0 pins R@100 at one lucky hit, 0.3 clears the
    0.1 bar by epoch 1)."""
    tmp = mini_vg["tmp"]
    base = open(mini_vg["cfg"]).read()
    (tmp / "ckpt_full").mkdir(exist_ok=True)
    (tmp / "results_full").mkdir(exist_ok=True)
    cfg = base.replace("lambda_contrast: 0.0", "lambda_contrast: 0.3")
    cfg = cfg.replace(f"checkpoint_path: {tmp}/ckpt/",
                      f"checkpoint_path: {tmp}/ckpt_full/")
    cfg = cfg.replace(f"result_path: {tmp}/results/",
                      f"result_path: {tmp}/results_full/")
    cfg += "  faithful_dynamics: true\n"
    assert "lambda_contrast: 0.3" in cfg and "faithful_dynamics" in cfg
    cfg_path = tmp / "mini_full_loss.yaml"
    cfg_path.write_text(cfg)
    mini = dict(mini_vg, cfg=str(cfg_path))

    out = run_cli(mini, "--run_mode", "train", "--eval_mode", "pc",
                  "--hierar")
    assert (tmp / "ckpt_full" / "HierRelationModel_Baseline_motif2"
            ).exists()
    # every printed loss term finite, and the contrast term actually live
    loss_terms = re.findall(r"(\w+)=([-\w.]+)", out)
    assert loss_terms, out[-2000:]
    bad = [(k, v) for k, v in loss_terms
           if v in ("nan", "inf", "-inf") or "nan" in v]
    assert not bad, f"non-finite loss terms {bad}\n{out[-2000:]}"
    contrast = [float(v) for k, v in loss_terms if k == "contrast"]
    assert contrast and any(abs(c) > 1e-6 for c in contrast), \
        f"contrast term never live: {contrast[:5]}"

    out = run_cli(mini, "--run_mode", "eval", "--eval_mode", "pc",
                  "--hierar")
    res = _last_json(out)
    assert res["recall"][2] > 0.1, res


@pytest.mark.slow
def test_sgrc_native_training(mini_vg):
    """Training routed through the C++ SGRC pipeline: v2 records with
    embedded images (tools/preprocess_vg.py --embed-images), per-epoch
    ColorJitter + Pillow-exact resize on native threads
    (data/native/sgc_pack.cc), the Python side only drawing the RNG
    sample.  Trains through the CLI to the same above-chance recall as
    the Python-loader ladder — the input-pipeline serialization the
    reference suffers (train_test.py:52, num_workers=0) is beaten on the
    path where epochs are actually spent."""
    tmp = mini_vg["tmp"]
    sgrc_dir = tmp / "sgrc_train"
    proc = subprocess.run(
        [sys.executable, "tools/preprocess_vg.py", "--stage", "sgrecords",
         "--split", "train", "--out", str(sgrc_dir), "--embed-images",
         "--config", mini_vg["cfg"]],
        cwd=ROOT, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, \
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    n_recs = len(list(sgrc_dir.glob("*.sgrec")))
    assert n_recs >= 30, proc.stdout

    base = open(mini_vg["cfg"]).read()
    (tmp / "ckpt_sgrc").mkdir(exist_ok=True)
    (tmp / "results_sgrc").mkdir(exist_ok=True)
    cfg = base.replace(f"checkpoint_path: {tmp}/ckpt/",
                       f"checkpoint_path: {tmp}/ckpt_sgrc/")
    cfg = cfg.replace(f"result_path: {tmp}/results/",
                      f"result_path: {tmp}/results_sgrc/")
    train_cfg = cfg.replace("data:\n", f"data:\n  sgrc_dir: {sgrc_dir}\n")
    assert "sgrc_dir" in train_cfg
    cfg_path = tmp / "mini_sgrc.yaml"
    cfg_path.write_text(train_cfg)

    out = run_cli(dict(mini_vg, cfg=str(cfg_path)),
                  "--run_mode", "train", "--eval_mode", "pc", "--hierar")
    assert (tmp / "ckpt_sgrc" / "HierRelationModel_Baseline_motif2"
            ).exists()
    # in-training test eval falls back to the Python loader (no feature
    # cache), so recall here compares native-trained weights on the same
    # test pixels the main ladder used
    eval_cfg_path = tmp / "mini_sgrc_eval.yaml"
    eval_cfg_path.write_text(cfg)
    out = run_cli(dict(mini_vg, cfg=str(eval_cfg_path)),
                  "--run_mode", "eval", "--eval_mode", "pc", "--hierar")
    res = _last_json(out)
    assert res["recall"][2] > 0.2, res


@pytest.fixture(scope="module")
def mini_oiv6(tmp_path_factory):
    """SGTR-style OIv6 fixture: vrd-*-anno.json + images."""
    from PIL import Image
    rng = np.random.default_rng(3)
    tmp = tmp_path_factory.mktemp("mini_oiv6")
    img_dir = tmp / "images"
    img_dir.mkdir()
    records = []
    for i in range(24):
        n = int(rng.integers(2, 6))
        w, h = 200, 160
        bbox = []
        for _ in range(n):
            x0, y0 = int(rng.integers(0, w - 40)), int(rng.integers(0,
                                                                    h - 40))
            bbox.append([x0, y0, x0 + int(rng.integers(20, 40)),
                         y0 + int(rng.integers(20, 40))])
        labels = [int(c) for c in rng.integers(0, 30, n)]
        rels = []
        for a in range(n):
            for b in range(n):
                if a != b and rng.random() < 0.3:
                    rels.append([a, b, int((labels[a] + labels[b]) % 30)])
        records.append({"img_fn": f"oimg{i}", "img_size": [w, h],
                        "det_labels": labels, "bbox": bbox,
                        "rel": rels or [[0, 1, 0]]})
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"oimg{i}.jpg")
    train_json = tmp / "vrd-train-anno.json"
    test_json = tmp / "vrd-test-anno.json"
    train_json.write_text(json.dumps(records[:18]))
    test_json.write_text(json.dumps(records[18:]))
    (tmp / "ckpt").mkdir()
    (tmp / "results").mkdir()
    cfg = f"""
data:
  dataset: oiv6
  image_dir: {img_dir}
  annotation_train: {train_json}
  annotation_test: {test_json}
  max_objects: 6
model:
  image_size: 256
  feature_size: 8
  hidden_dim: 16
  compute_dtype: float32
  detr_pretrained: {tmp}/no_such_checkpoint.msgpack
training:
  batch_size: 2
  num_epoch: 1
  learning_rate: 0.001
  grad_clip_norm: 1.0
  print_freq: 5
  eval_freq: 0
  test_epoch: 0
  checkpoint_path: {tmp}/ckpt/
  result_path: {tmp}/results/
"""
    cfg_path = tmp / "oiv6.yaml"
    cfg_path.write_text(cfg)
    return {"tmp": tmp, "cfg": str(cfg_path)}


@pytest.mark.slow
def test_oiv6_cli_ladder(mini_oiv6):
    """OIv6 through the CLI: train one epoch, then PredCLS eval reporting
    wmap_rel / wmap_phrase (reference evaluator.py:522-566)."""
    out = run_cli(mini_oiv6, "--run_mode", "train", "--eval_mode", "pc",
                  "--hierar", "--dataset", "oiv6")
    assert "Saved checkpoint" in out
    out = run_cli(mini_oiv6, "--run_mode", "eval", "--eval_mode", "pc",
                  "--hierar", "--dataset", "oiv6")
    res = _last_json(out)
    assert "wmap_rel" in res and "wmap_phrase" in res
    assert 0 <= res["wmap_rel"] <= 1 and 0 <= res["wmap_phrase"] <= 1
