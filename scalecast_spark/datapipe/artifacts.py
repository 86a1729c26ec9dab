"""JSON persistence for datapipe model artifacts.

Curation pipelines are multi-job: the BPE merge table, quality-
classifier weights, PQ codebooks, and k-means centroids are trained
once and applied across many later runs (and across clusters). These
helpers serialize exactly those driver-side artifacts — plain JSON, no
pickle (engine-portable, diff-able, safe to check into a config repo).

Each artifact is wrapped in an envelope {"kind", "version", "payload"}
so loads fail loudly on the wrong artifact type instead of silently
mis-applying, e.g., centroids as classifier weights.
"""

from __future__ import annotations

import json
import os

_VERSION = 1


def _save(path: str, kind: str, payload) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"kind": kind, "version": _VERSION, "payload": payload}, f)
    os.replace(tmp, path)


def _load(path: str, kind: str):
    with open(path) as f:
        env = json.load(f)
    if not isinstance(env, dict) or env.get("kind") != kind:
        raise ValueError(
            f"{path} holds a {env.get('kind') if isinstance(env, dict) else 'raw'} "
            f"artifact, expected {kind}"
        )
    if env.get("version") != _VERSION:
        raise ValueError(
            f"{path}: artifact version {env.get('version')} != {_VERSION}"
        )
    return env["payload"]


def save_bpe_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist tokenizer.train_bpe output (ORDER is the model)."""
    _save(path, "bpe_merges", [list(m) for m in merges])


def load_bpe_merges(path: str) -> list[tuple[str, str]]:
    return [tuple(m) for m in _load(path, "bpe_merges")]


def save_classifier_weights(weights: list[float], path: str) -> None:
    """Persist quality_model.train_quality_classifier output
    (n_features+1 floats, last = bias)."""
    _save(path, "classifier_weights", [float(w) for w in weights])


def load_classifier_weights(path: str) -> list[float]:
    return [float(w) for w in _load(path, "classifier_weights")]


def save_centroids(cents: list[tuple[int, list[float]]], path: str) -> None:
    """Persist ivf_centroids / kmeans_ivf_centroids output
    ([(cell_id, vector)] — cell ids are part of the index)."""
    _save(
        path, "centroids",
        [[int(ci), [float(x) for x in v]] for ci, v in cents],
    )


def load_centroids(path: str) -> list[tuple[int, list[float]]]:
    return [(int(ci), list(v)) for ci, v in _load(path, "centroids")]


def save_pq_codebooks(
    books: list[list[tuple[int, list[float]]]], path: str
) -> None:
    """Persist similarity.pq_codebooks output (per-subspace codeword
    lists; code ids are part of the index)."""
    _save(
        path, "pq_codebooks",
        [[[int(c), [float(x) for x in v]] for c, v in b] for b in books],
    )


def load_pq_codebooks(path: str) -> list[list[tuple[int, list[float]]]]:
    return [
        [(int(c), list(v)) for c, v in b] for b in _load(path, "pq_codebooks")
    ]
