"""scene_graph_commonsense_tpu — a TPU-native scene-graph-generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bowen-upenn/scene_graph_commonsense ("HIERCOM", WACV 2025):

  * frozen DETR-101 features + depth cues -> pairwise two-directional relation
    classification with an optional hierarchical (Bayesian) head,
  * Recall@k / mean-Recall@k / zero-shot-Recall@k evaluation on Visual Genome
    and weighted-mAP on OpenImages V6,
  * an LLM/VLM commonsense-validation loop (prepare_cs / train_cs / eval_cs).

Design (TPU-first, not a port):
  * The reference's O(N^2) Python pair loop (reference train_test.py:190-258)
    becomes a static-shape directed pair grid: images are padded to N_MAX
    objects, all N_MAX*(N_MAX-1) directed pairs are packed into a fixed-size
    pair buffer and processed by one batched trunk on the MXU.
  * The relation head's subject/object streams are algebraically factored so
    per-object work (1x1 conv + the first 3x3 conv, which is linear before its
    ReLU) is computed once per object instead of once per pair.
  * Data parallelism via jax.sharding over a device Mesh (reference uses
    torch DDP + gloo, reference train_test.py:25-28); metrics/grads reduce
    with XLA collectives over ICI.
  * Everything under jit uses static shapes and masking; raggedness
    (variable object counts, connected-pair sets, NMS survivors) is expressed
    with validity masks instead of dynamic shapes.
"""

__version__ = "0.1.0"

from scene_graph_commonsense_tpu.config import Config, load_config  # noqa: F401
