"""DETR-101 architecture, converter structure, and detection postprocess."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.detr import (
    DETR, sine_position_embedding)
from scene_graph_commonsense_tpu.models.weights import (
    convert_detr_state_dict)
from scene_graph_commonsense_tpu.ops.detection import postprocess_detections
from scene_graph_commonsense_tpu.constants import OBJ_ALP2FRE


def small_detr():
    return DETR(num_classes=151, num_queries=10, d_model=32, nhead=4,
                num_encoder_layers=2, num_decoder_layers=2, dim_ff=64)


def test_detr_shapes(rng):
    mdl = small_detr()
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    mask = jnp.ones((2, 64, 64), bool)
    params = mdl.init(jax.random.PRNGKey(0), img, mask)
    out = mdl.apply(params, img, mask)
    assert out["pred_logits"].shape == (2, 10, 151)
    assert out["pred_boxes"].shape == (2, 10, 4)
    assert (np.asarray(out["pred_boxes"]) >= 0).all()
    assert (np.asarray(out["pred_boxes"]) <= 1).all()
    feats = mdl.apply(params, img, mask, method=DETR.encode_features)
    assert feats.shape == (2, 2, 2, 32)   # stride 32


def test_attention_key_padding_mask(rng):
    """Keys behind the padding mask must not influence attention outputs
    (conv halos in the backbone legitimately see padding, like torch DETR;
    the guarantee lives at the attention level)."""
    from scene_graph_commonsense_tpu.models.detr import MHA
    mha = MHA(d_model=32, nhead=4)
    q = jnp.asarray(rng.standard_normal((1, 5, 32)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((1, 8, 32)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), q, kv, kv,
                      jnp.ones((1, 8), bool))
    mask = jnp.asarray([[True] * 5 + [False] * 3])
    out_masked = mha.apply(params, q, kv, kv, mask)
    # replace masked keys with garbage: output must be identical
    kv_garbage = kv.at[:, 5:].set(1000.0)
    out_garbage = mha.apply(params, q, kv_garbage, kv_garbage, mask)
    np.testing.assert_allclose(out_masked, out_garbage, atol=1e-5)
    # and equal to attention over only the valid keys
    out_sliced = mha.apply(params, q, kv[:, :5], kv[:, :5],
                           jnp.ones((1, 5), bool))
    np.testing.assert_allclose(out_masked, out_sliced, atol=1e-5)


def test_sine_position_embedding_properties():
    mask = jnp.ones((1, 4, 6), bool)
    pos = sine_position_embedding(mask, num_pos_feats=8)
    assert pos.shape == (1, 4, 6, 16)
    p = np.asarray(pos)
    # first half encodes y: constant along x; second half encodes x
    np.testing.assert_allclose(p[0, :, 0, :8], p[0, :, 3, :8], atol=1e-6)
    np.testing.assert_allclose(p[0, 0, :, 8:], p[0, 2, :, 8:], atol=1e-6)
    assert np.abs(p).max() <= 1.0 + 1e-6


def _fake_torch_state(rng):
    """Synthesizes a DETR-named numpy state dict with correct shapes for the
    small test model (d=32, heads=4, 2+2 layers, resnet101 trunk)."""
    st = {}
    d, ff, q, ncls = 32, 64, 10, 151

    def add_conv(name, cout, cin, k):
        # fan-in scaled so the 101-layer trunk doesn't overflow
        st[name] = (rng.standard_normal((cout, cin, k, k))
                    / np.sqrt(cin * k * k)).astype(np.float32)

    def add_bn(prefix, c):
        st[f"{prefix}.weight"] = np.ones(c, np.float32)
        st[f"{prefix}.bias"] = (0.01 * rng.standard_normal(c)).astype(
            np.float32)
        st[f"{prefix}.running_mean"] = (
            0.01 * rng.standard_normal(c)).astype(np.float32)
        st[f"{prefix}.running_var"] = np.ones(c, np.float32)

    add_conv("backbone.0.body.conv1.weight", 64, 3, 7)
    add_bn("backbone.0.body.bn1", 64)
    inplanes = 64
    for stage, (planes, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 23), (512, 3)], start=1):
        for i in range(blocks):
            pre = f"backbone.0.body.layer{stage}.{i}"
            add_conv(f"{pre}.conv1.weight", planes, inplanes, 1)
            add_bn(f"{pre}.bn1", planes)
            add_conv(f"{pre}.conv2.weight", planes, planes, 3)
            add_bn(f"{pre}.bn2", planes)
            add_conv(f"{pre}.conv3.weight", planes * 4, planes, 1)
            add_bn(f"{pre}.bn3", planes * 4)
            if i == 0:
                add_conv(f"{pre}.downsample.0.weight", planes * 4,
                         inplanes, 1)
                add_bn(f"{pre}.downsample.1", planes * 4)
                inplanes = planes * 4

    st["input_proj.weight"] = (rng.standard_normal((d, 2048, 1, 1))
                               / np.sqrt(2048)).astype(np.float32)
    st["input_proj.bias"] = (0.01 * rng.standard_normal(d)).astype(
        np.float32)

    def add_attn(prefix):
        st[f"{prefix}.in_proj_weight"] = (rng.standard_normal(
            (3 * d, d)) / np.sqrt(d)).astype(np.float32)
        st[f"{prefix}.in_proj_bias"] = (0.01 * rng.standard_normal(
            3 * d)).astype(np.float32)
        st[f"{prefix}.out_proj.weight"] = (rng.standard_normal(
            (d, d)) / np.sqrt(d)).astype(np.float32)
        st[f"{prefix}.out_proj.bias"] = (0.01 * rng.standard_normal(
            d)).astype(np.float32)

    def add_dense(prefix, cout, cin):
        st[f"{prefix}.weight"] = (rng.standard_normal((cout, cin))
                                  / np.sqrt(cin)).astype(np.float32)
        st[f"{prefix}.bias"] = (0.01 * rng.standard_normal(cout)).astype(
            np.float32)

    def add_ln(prefix):
        st[f"{prefix}.weight"] = np.ones(d, np.float32)
        st[f"{prefix}.bias"] = (0.01 * rng.standard_normal(d)).astype(
            np.float32)

    for i in range(2):
        pre = f"transformer.encoder.layers.{i}"
        add_attn(f"{pre}.self_attn")
        add_dense(f"{pre}.linear1", ff, d)
        add_dense(f"{pre}.linear2", d, ff)
        add_ln(f"{pre}.norm1")
        add_ln(f"{pre}.norm2")
    for i in range(2):
        pre = f"transformer.decoder.layers.{i}"
        add_attn(f"{pre}.self_attn")
        add_attn(f"{pre}.multihead_attn")
        add_dense(f"{pre}.linear1", ff, d)
        add_dense(f"{pre}.linear2", d, ff)
        add_ln(f"{pre}.norm1")
        add_ln(f"{pre}.norm2")
        add_ln(f"{pre}.norm3")
    add_ln("transformer.decoder.norm")
    st["query_embed.weight"] = (rng.standard_normal((q, d))
                                / np.sqrt(d)).astype(np.float32)
    add_dense("class_embed", ncls, d)
    for i in range(3):
        add_dense(f"bbox_embed.layers.{i}",
                  4 if i == 2 else d, d)
    return st


def test_converter_structure_matches_model(rng):
    mdl = small_detr()
    img = jnp.zeros((1, 64, 64, 3))
    params = mdl.init(jax.random.PRNGKey(0), img,
                      jnp.ones((1, 64, 64), bool))
    converted = convert_detr_state_dict(_fake_torch_state(rng),
                                        num_encoder_layers=2,
                                        num_decoder_layers=2)
    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    got_shapes = jax.tree.map(lambda a: a.shape, converted)
    assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
    mismatches = [
        (p1, s1, s2) for (p1, s1), (_, s2) in zip(
            jax.tree_util.tree_leaves_with_path(ref_shapes),
            jax.tree_util.tree_leaves_with_path(got_shapes)) if s1 != s2]
    assert not mismatches, mismatches[:5]
    # converted params actually run
    out = mdl.apply(converted, img, jnp.ones((1, 64, 64), bool))
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_postprocess_detections(rng):
    b, q, c = 2, 16, 150
    logits = rng.standard_normal((b, q, c + 1)).astype(np.float32)
    # make a few queries confidently no-object
    logits[:, :4, c] = 10.0
    boxes = rng.random((b, q, 4)).astype(np.float32) * 0.5 + 0.25
    out = postprocess_detections(
        jnp.asarray(logits), jnp.asarray(boxes), OBJ_ALP2FRE,
        num_classes=c, topk_cat=2, feature_size=32, nms_iou=0.5,
        max_objects=20)
    assert out["cats"].shape == (b, 20)
    assert out["boxes"].shape == (b, 20, 4)
    v = np.asarray(out["valid"])
    # no-object queries never produce slots with their top-1; boxes of valid
    # slots are well-formed and in range
    bx = np.asarray(out["boxes"])
    assert (bx[v][:, 1] >= bx[v][:, 0]).all()   # x_max >= x_min
    assert (bx[v][:, 3] >= bx[v][:, 2]).all()
    assert bx.min() >= 0 and bx.max() <= 32
    cats = np.asarray(out["cats"])
    assert ((cats[v] >= 0) & (cats[v] < c)).all()
    # confidences of valid slots are sorted descending (compaction order)
    conf = np.asarray(out["cat_conf"])
    for bi in range(b):
        cc = conf[bi][v[bi]]
        assert (np.diff(cc) <= 1e-6).all()


def test_sharded_detect_fn_matches_single_device(rng):
    """make_detr_detect_fn(mesh=...) — GSPMD batch sharding of the whole
    detection path — must produce the single-device outputs."""
    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.eval.engines import make_detr_detect_fn
    from scene_graph_commonsense_tpu.parallel.mesh import make_mesh

    mdl = small_detr()
    img = np.asarray(rng.standard_normal((8, 64, 64, 3)), np.float32)
    mask = np.ones((8, 64, 64), bool)
    params = mdl.init(jax.random.PRNGKey(0), jnp.asarray(img[:1]),
                      jnp.asarray(mask[:1]))
    cfg = derive("vg", data={"max_objects": 6})
    batch = {"image_nonsq": img, "pixel_mask": mask}
    d1 = jax.tree.map(np.asarray,
                      make_detr_detect_fn(cfg, mdl, params)(batch))
    mesh = make_mesh(data=8, model=1)
    d8 = jax.tree.map(np.asarray,
                      make_detr_detect_fn(cfg, mdl, params,
                                          mesh=mesh)(batch))
    for k in d1:
        np.testing.assert_allclose(d1[k], d8[k], atol=1e-4,
                                   err_msg=f"mismatch in {k}")
