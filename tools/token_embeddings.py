"""Unsupervised predicate super-category discovery via token embeddings.

Re-implements the reference's clustering tool (reference
token_embeddings.py:1-132): embed the 50 predicate names with GPT-2 / BERT /
CLIP, KMeans(k=3) the embeddings, and emit the cluster sizes plus the
frequency-order -> cluster-order index permutation the dataloader consumes.

The precomputed results for all three models are already baked into
constants.py (CLUSTER_INDEX_MAPS / config.CLUSTER_SIZES, reference
dataset_utils.py:760-787); this tool regenerates them when the embedding
models are available locally (it needs no network if the HF cache is warm).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from scene_graph_commonsense_tpu.constants import (  # noqa: E402
    VG_RELATIONS_BY_FREQ)


def get_embeddings(model_name: str, sentences):
    """Mean-pooled last-hidden-state embeddings (reference utils.py:123-133
    semantics) without torch: uses transformers+numpy via torch CPU."""
    import torch
    from transformers import AutoModel, AutoTokenizer
    tok = AutoTokenizer.from_pretrained(model_name)
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token or "[PAD]"
    model = AutoModel.from_pretrained(model_name)
    model.eval()
    inputs = tok(list(sentences), padding=True, truncation=True,
                 return_tensors="pt")
    with torch.no_grad():
        out = model(**inputs)
    return out.last_hidden_state.mean(dim=1).numpy()


def kmeans(x: np.ndarray, k: int = 3, iters: int = 200, seed: int = 0):
    """Plain Lloyd's k-means (replaces sklearn.KMeans, reference
    token_embeddings.py)."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), k, replace=False)]
    assign = np.zeros(len(x), np.int64)
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        new_assign = d.argmin(1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(k):
            if (assign == c).any():
                centers[c] = x[assign == c].mean(0)
    return assign


def cluster_and_map(assign: np.ndarray):
    """Builds the freq-order -> cluster-order permutation: predicates are
    renumbered cluster-by-cluster preserving frequency order within each
    cluster (the layout of reference dataset_utils.py:764-787)."""
    index_map = np.zeros(len(assign), np.int64)
    next_id = 0
    sizes = []
    for c in range(assign.max() + 1):
        members = np.nonzero(assign == c)[0]
        sizes.append(len(members))
        for m in members:
            index_map[m] = next_id
            next_id += 1
    return index_map, sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2",
                    help="HF model id: gpt2 / bert-base-uncased / "
                         "openai/clip-vit-base-patch32")
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()
    emb = get_embeddings(args.model, VG_RELATIONS_BY_FREQ)
    assign = kmeans(emb, args.k)
    index_map, sizes = cluster_and_map(assign)
    print("cluster sizes:", sizes)
    print("index map:", index_map.tolist())
    for c in range(args.k):
        names = [VG_RELATIONS_BY_FREQ[i]
                 for i in np.nonzero(assign == c)[0]]
        print(f"cluster {c}: {names}")


if __name__ == "__main__":
    main()
