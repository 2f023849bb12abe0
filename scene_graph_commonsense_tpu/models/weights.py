"""Checkpoint conversion: torch DETR-101 state dict -> Flax param tree.

The reference loads a VG/OIv6-pretrained DETR checkpoint after remapping
detectron2-style key names through two text tables (reference
utils.py:88-119, datasets/vg_scene_graph_annot/detr101_key_before/after.txt).
`apply_key_remap` reproduces that pre-step; `convert_detr_state_dict`
translates DETR-named torch tensors into the Flax module tree of
models.detr.DETR (Dense kernels transposed, Conv OIHW->HWIO, fused
in_proj split into q/k/v).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def apply_key_remap(state: Dict[str, np.ndarray], before_path: str,
                    after_path: str) -> Dict[str, np.ndarray]:
    """Renames keys listed in `before` to the parallel entry in `after`
    (reference utils.py:96-112)."""
    with open(before_path) as f:
        before = [ln.rstrip("\n") for ln in f if ln.strip()]
    with open(after_path) as f:
        after = [ln.rstrip("\n") for ln in f if ln.strip()]
    remap = dict(zip(before, after))
    return {remap.get(k, k): v for k, v in state.items()}


def _conv(w):   # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):  # (out, in) -> (in, out)
    return np.transpose(np.asarray(w), (1, 0))


def _bn(state, prefix):
    return {"weight": np.asarray(state[f"{prefix}.weight"]),
            "bias": np.asarray(state[f"{prefix}.bias"]),
            "running_mean": np.asarray(state[f"{prefix}.running_mean"]),
            "running_var": np.asarray(state[f"{prefix}.running_var"])}


def _attn(state, prefix):
    """Splits torch MultiheadAttention's fused in_proj into q/k/v Dense."""
    w = np.asarray(state[f"{prefix}.in_proj_weight"])
    b = np.asarray(state[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    out = {}
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        out[name] = {"kernel": _dense(w[i * d:(i + 1) * d]),
                     "bias": b[i * d:(i + 1) * d]}
    out["out_proj"] = {"kernel": _dense(state[f"{prefix}.out_proj.weight"]),
                       "bias": np.asarray(state[f"{prefix}.out_proj.bias"])}
    return out


def _norm(state, prefix):
    return {"scale": np.asarray(state[f"{prefix}.weight"]),
            "bias": np.asarray(state[f"{prefix}.bias"])}


def convert_detr_state_dict(state: Mapping[str, np.ndarray],
                            num_encoder_layers: int = 6,
                            num_decoder_layers: int = 6,
                            blocks=(3, 4, 23, 3)) -> Dict:
    """DETR-named torch tensors -> Flax params for models.detr.DETR."""
    state = {k: np.asarray(v) for k, v in state.items()}
    p: Dict = {}

    # ---- ResNet-101 backbone ----
    bb = {"conv1": {"kernel": _conv(state["backbone.0.body.conv1.weight"])},
          "bn1": _bn(state, "backbone.0.body.bn1")}
    for stage, nblocks in enumerate(blocks, start=1):
        for i in range(nblocks):
            pre = f"backbone.0.body.layer{stage}.{i}"
            blk = {}
            for c in range(1, 4):
                blk[f"conv{c}"] = {
                    "kernel": _conv(state[f"{pre}.conv{c}.weight"])}
                blk[f"bn{c}"] = _bn(state, f"{pre}.bn{c}")
            if f"{pre}.downsample.0.weight" in state:
                blk["downsample_conv"] = {
                    "kernel": _conv(state[f"{pre}.downsample.0.weight"])}
                blk["downsample_bn"] = _bn(state, f"{pre}.downsample.1")
            bb[f"layer{stage}_{i}"] = blk
    p["backbone"] = bb

    p["input_proj"] = {"kernel": _conv(state["input_proj.weight"]),
                       "bias": np.asarray(state["input_proj.bias"])}

    for i in range(num_encoder_layers):
        pre = f"transformer.encoder.layers.{i}"
        p[f"encoder_{i}"] = {
            "self_attn": _attn(state, f"{pre}.self_attn"),
            "linear1": {"kernel": _dense(state[f"{pre}.linear1.weight"]),
                        "bias": np.asarray(state[f"{pre}.linear1.bias"])},
            "linear2": {"kernel": _dense(state[f"{pre}.linear2.weight"]),
                        "bias": np.asarray(state[f"{pre}.linear2.bias"])},
            "norm1": _norm(state, f"{pre}.norm1"),
            "norm2": _norm(state, f"{pre}.norm2"),
        }
    for i in range(num_decoder_layers):
        pre = f"transformer.decoder.layers.{i}"
        p[f"decoder_{i}"] = {
            "self_attn": _attn(state, f"{pre}.self_attn"),
            "cross_attn": _attn(state, f"{pre}.multihead_attn"),
            "linear1": {"kernel": _dense(state[f"{pre}.linear1.weight"]),
                        "bias": np.asarray(state[f"{pre}.linear1.bias"])},
            "linear2": {"kernel": _dense(state[f"{pre}.linear2.weight"]),
                        "bias": np.asarray(state[f"{pre}.linear2.bias"])},
            "norm1": _norm(state, f"{pre}.norm1"),
            "norm2": _norm(state, f"{pre}.norm2"),
            "norm3": _norm(state, f"{pre}.norm3"),
        }
    p["decoder_norm"] = _norm(state, "transformer.decoder.norm")
    p["query_embed"] = {"embedding": np.asarray(state["query_embed.weight"])}
    p["class_embed"] = {"kernel": _dense(state["class_embed.weight"]),
                        "bias": np.asarray(state["class_embed.bias"])}
    for i in range(3):
        p[f"bbox_embed_{i}"] = {
            "kernel": _dense(state[f"bbox_embed.layers.{i}.weight"]),
            "bias": np.asarray(state[f"bbox_embed.layers.{i}.bias"])}
    return {"params": p}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch .pth checkpoint into numpy (CPU torch is available in
    the toolchain for offline conversion only)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


# ---------------------------------------------------------------------------
# Relation-head checkpoint conversion
# ---------------------------------------------------------------------------

def strip_ddp_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Removes DDP's 'module.' prefixes (reference utils.py:207-214)."""
    return {k.removeprefix("module."): v for k, v in state.items()}


def convert_relation_state_dict(state: Mapping[str, np.ndarray],
                                hierarchical: bool = True,
                                use_super: bool = True,
                                num_classes: int = 150,
                                num_super_classes: int = 17,
                                hidden_dim: int = 128,
                                feature_size: int = 32) -> Dict:
    """Reference relation-classifier checkpoint -> factored Flax params.

    Maps the reference's BayesianRelationClassifier / FlatRelationClassifier
    tensors (reference model.py:105-186) onto this framework's factored
    layout (models/relation_head.py):

      * conv1_1 / conv1_2        -> conv1_sub / conv1_obj (OIHW -> HWIO);
      * conv2_1 splits along its input channels into conv2_sub (subject
        half, no bias) + conv2_obj (object half, carries the bias);
      * fc1 rows permute from the torch NCHW flatten order (c, y, x) to the
        NHWC flatten order (y, x, c);
      * fc2 rows split into fc2_h (hidden), emb_c1/emb_c2 (one-hot class
        blocks become embedding tables), fc2_s1/fc2_s2 (super multi-hots);
      * heads (fc3*, fc4, fc5) transpose as plain Dense kernels.
    """
    state = strip_ddp_prefix({k: np.asarray(v) for k, v in state.items()})
    h = hidden_dim
    p: Dict = {}

    p["conv1_sub"] = {"kernel": _conv(state["conv1_1.weight"]),
                      "bias": np.asarray(state["conv1_1.bias"])}
    p["conv1_obj"] = {"kernel": _conv(state["conv1_2.weight"]),
                      "bias": np.asarray(state["conv1_2.bias"])}
    k2 = _conv(state["conv2_1.weight"])          # (3, 3, 2h, 4h)
    p["conv2_sub"] = {"kernel": k2[:, :, :h, :]}
    p["conv2_obj"] = {"kernel": k2[:, :, h:, :],
                      "bias": np.asarray(state["conv2_1.bias"])}
    p["conv3"] = {"kernel": _conv(state["conv3_1.weight"]),
                  "bias": np.asarray(state["conv3_1.bias"])}

    # fc1: torch flattens (C=8h, y=S/4, x=S/4) C-major; NHWC flattens
    # (y, x, C) -> permute input rows
    w1 = _dense(state["fc1.weight"])             # (8h*(S/4)^2, 4096)
    c8, sp = 8 * h, feature_size // 4
    w1 = w1.reshape(c8, sp, sp, -1).transpose(1, 2, 0, 3).reshape(
        c8 * sp * sp, -1)
    p["fc1"] = {"kernel": w1, "bias": np.asarray(state["fc1.bias"])}

    # fc2: rows [hidden(4096) | onehot c1 | onehot c2 | super1 | super2]
    w2 = _dense(state["fc2.weight"])
    off = 4096
    p["fc2_h"] = {"kernel": w2[:off], "bias": np.asarray(state["fc2.bias"])}
    p["emb_c1"] = {"embedding": w2[off:off + num_classes]}
    off += num_classes
    p["emb_c2"] = {"embedding": w2[off:off + num_classes]}
    off += num_classes
    if use_super:
        p["fc2_s1"] = {"kernel": w2[off:off + num_super_classes]}
        off += num_super_classes
        p["fc2_s2"] = {"kernel": w2[off:off + num_super_classes]}
        off += num_super_classes
    assert off == w2.shape[0], (off, w2.shape)

    def dense(name, src):
        p[name] = {"kernel": _dense(state[f"{src}.weight"]),
                   "bias": np.asarray(state[f"{src}.bias"])}

    dense("fc4", "fc4")
    if hierarchical:
        dense("fc3_1", "fc3_1")
        dense("fc3_2", "fc3_2")
        dense("fc3_3", "fc3_3")
        dense("fc5", "fc5")
    else:
        dense("fc3", "fc3")
    return {"params": p}
