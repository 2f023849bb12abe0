"""apply_key_remap against the REAL shipped remap tables.

The reference loads its pretrained DETR-101 from a detectron2-named
checkpoint and renames 713 keys (mostly backbone) to hub names via
detr101_key_before/after.txt (reference utils.py:96-119).  No released
checkpoint exists in this environment, so we synthesize one: take a
full-depth hub-named TorchDETR state dict (tests/torch_detr.py), rename
its backbone keys BACKWARD through the same tables (hub -> detectron2),
then assert apply_key_remap restores every key and the result feeds
convert_detr_state_dict into valid Flax params.
"""

import os
import sys

import numpy as np
import pytest
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from scene_graph_commonsense_tpu.models import weights

from torch_detr import TorchDETR

ANNOT = "/root/reference/datasets/vg_scene_graph_annot"
BEFORE = os.path.join(ANNOT, "detr101_key_before.txt")
AFTER = os.path.join(ANNOT, "detr101_key_after.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BEFORE), reason="reference remap tables absent")


@pytest.mark.slow
def test_apply_key_remap_real_tables_round_trip():
    with open(BEFORE) as f:
        before = [ln.rstrip("\n") for ln in f if ln.strip()]
    with open(AFTER) as f:
        after = [ln.rstrip("\n") for ln in f if ln.strip()]
    assert len(before) == len(after) == 713
    inv = dict(zip(after, before))

    torch.manual_seed(0)
    tm = TorchDETR()           # full depth (3, 4, 23, 3): all 712 keys live
    hub = {k: v.numpy() for k, v in tm.state_dict().items()}

    # every 'after' name must exist in the hub-named dict, except BN
    # bookkeeping the hub model may or may not carry
    missing = [k for k in after
               if k not in hub and not k.endswith("num_batches_tracked")]
    assert not missing, missing[:5]

    # synthesize the detectron2-named checkpoint the reference starts from
    d2 = {inv.get(k, k): v for k, v in hub.items()}
    renamed = [k for k in d2 if k.startswith(("backbone.stem",
                                              "backbone.res"))]
    assert len(renamed) >= 500, len(renamed)   # the backbone truly renamed
    assert not any(k.startswith("backbone.0.body") and
                   not k.endswith("num_batches_tracked") for k in d2)

    restored = weights.apply_key_remap(d2, BEFORE, AFTER)
    assert set(restored) == set(hub)
    for k in ("backbone.0.body.conv1.weight",
              "backbone.0.body.layer3.10.bn2.running_var",
              "backbone.0.body.layer4.0.downsample.0.weight"):
        np.testing.assert_array_equal(restored[k], hub[k])

    params = weights.convert_detr_state_dict(restored)
    assert params["params"]["backbone"]["conv1"]["kernel"].shape == \
        (7, 7, 3, 64)
    assert params["params"]["backbone"]["layer3_10"]["bn2"][
        "running_var"].shape == (256,)
