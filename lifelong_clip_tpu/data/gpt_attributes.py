"""Class visual-attribute cache for ProtoCLIP (offline ingestion).

Parity target: reference ``datasets/gpt/attributes.py`` +
``Trainer_ProtoCLIP.py:718-785``: per-class visual-attribute texts are
generated once via an external LLM API, cached as JSON
(``datasets/gpt/gpt_data/attribute/<dataset>.json``), then embedded with
the text tower and KMeans-clustered into per-class attribute centroids.

Differences by design:
  * NO online API calls (the reference embeds a hardcoded OpenAI key at
    ``attributes.py:9`` — deliberately not carried; this environment is
    zero-egress anyway). Only the offline JSON cache format is supported.
  * embedding is one batched jitted text-tower pass, clustering is
    sklearn KMeans (reference parity) with a numpy fallback.

JSON format: {class_name: [attribute_string, ...]} where each string is a
'|'-separated list of attribute phrases.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import numpy as np

log = logging.getLogger("lifelong_clip_tpu")


def load_attribute_cache(path: str) -> Dict[str, List[str]]:
    """Load and flatten the attribute JSON: class -> phrase list."""
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for cls, entries in raw.items():
        phrases: List[str] = []
        for entry in entries:
            phrases.extend(p.strip() for p in entry.split("|")
                           if p.strip())
        out[cls] = phrases
    return out


def _kmeans_numpy(x: np.ndarray, k: int, iters: int = 50, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack([x[assign == i].mean(0) if (assign == i).any()
                        else centers[i] for i in range(len(centers))])
        if np.allclose(new, centers):
            break
        centers = new
    return centers


def class_attribute_centroids(frozen,
                              clip_cfg,
                              cache: Dict[str, List[str]],
                              class_names: List[str],
                              *,
                              n_clusters: int = 3,
                              template: str = "{}",
                              compute_dtype=None):
    """Embed each class's attribute phrases and cluster to centroids.

    Returns (n_classes, n_clusters, embed_dim) float32; classes missing
    from the cache get zero centroids. One fused text pass embeds every
    phrase (the reference loops per class through the encoder).
    """
    import jax
    import jax.numpy as jnp

    from ..models import clip as clip_fns
    from ..utils.tokenizer import tokenize

    compute_dtype = compute_dtype or jnp.bfloat16
    all_phrases: List[str] = []
    spans = []
    for name in class_names:
        phrases = cache.get(name, [])[:64]
        spans.append((len(all_phrases), len(phrases)))
        all_phrases.extend(template.format(p) for p in phrases)

    if not all_phrases:
        return np.zeros((len(class_names), n_clusters,
                         clip_cfg.embed_dim), np.float32)

    tokens = tokenize(all_phrases)
    feats = []
    bs = 256
    encode = jax.jit(lambda t: clip_fns.normalize(clip_fns.encode_text(
        frozen, t, clip_cfg, compute_dtype=compute_dtype)))
    for lo in range(0, len(tokens), bs):
        chunk = tokens[lo:lo + bs]
        if len(chunk) < bs:
            chunk = np.concatenate(
                [chunk, np.zeros((bs - len(chunk), chunk.shape[1]),
                                 chunk.dtype)])
        f = np.asarray(encode(jnp.asarray(chunk)), np.float32)
        feats.append(f[:min(bs, len(tokens) - lo)])
    feats = np.concatenate(feats)

    out = np.zeros((len(class_names), n_clusters, feats.shape[-1]),
                   np.float32)
    try:
        from sklearn.cluster import KMeans
        use_sklearn = True
    except ImportError:  # pragma: no cover
        use_sklearn = False
    for ci, (lo, n) in enumerate(spans):
        if n == 0:
            continue
        x = feats[lo:lo + n]
        k = min(n_clusters, len(x))
        if use_sklearn and len(x) >= k:
            km = KMeans(n_clusters=k, n_init=4, random_state=0).fit(x)
            centers = km.cluster_centers_
        else:
            centers = _kmeans_numpy(x, k)
        out[ci, :k] = centers
    return out


def find_attribute_cache(gpt_dir: str, dataset: str) -> str:
    """Locate <gpt_dir>/attribute/<dataset>.json if present."""
    p = os.path.join(gpt_dir, "attribute", f"{dataset}.json")
    return p if os.path.exists(p) else ""
