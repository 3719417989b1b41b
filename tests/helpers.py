"""Shared test fixtures: synthetic quadruplet chunks + deterministic mock
embedder (the hash-based analogue of the reference's mock-LLM / blank-image
fakes, SURVEY.md §4)."""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np

from qst_tpu.core.config import (
    KEY_PART_POSITIVE,
    KEY_POSITIVE,
    KEY_REFERENCE,
)
from qst_tpu.data.chunks import write_chunk, write_meta

# Every caption contains its topic key so the hash embedder (below) maps the
# whole group near one topic centroid.
TOPICS = [
    ("cat", ["a cat sits on the mat", "the cat rests on a mat",
             "a small cat lying on the rug", "a young cat on the carpet"]),
    ("dog", ["a dog runs in the park", "the dog sprints across the grass",
             "a young dog playing in the field", "a dog chasing a ball outside"]),
    ("car", ["a red car drives down the road", "the red car on the street",
             "a crimson car moving on the highway", "a red car in traffic"]),
    ("pasta", ["a plate of pasta with sauce", "pasta with tomato sauce on a dish",
               "a bowl of pasta and red sauce", "pasta served with marinara"]),
    ("beach", ["people relax on a sandy beach", "a crowd enjoying the beach",
               "beach sunbathers on the sand", "families at the beach"]),
    ("plane", ["an airplane flies through clouds", "a plane soaring in the sky",
               "a plane above the clouds", "a plane cruising at altitude"]),
]


def make_instances(n: int, offset: int = 0) -> List[dict]:
    out = []
    for i in range(n):
        topic, caps = TOPICS[(offset + i) % len(TOPICS)]
        variant = (offset + i) // len(TOPICS)
        ref = caps[0] + f" variant {variant}"
        out.append({
            "id": offset + i,
            KEY_REFERENCE: ref,
            KEY_POSITIVE: [c + f" variant {variant}" for c in caps[1:]],
            KEY_PART_POSITIVE: [f"{topic} scene {variant}",
                                f"a {topic} variant {variant}"],
        })
    return out


def write_synthetic_dataset(root: str, n_chunks: int = 4,
                            chunk_dim: int = 6) -> int:
    for c in range(n_chunks):
        write_chunk(root, c, make_instances(chunk_dim, offset=c * chunk_dim),
                    dataset_name="synthetic")
    write_meta(root, n_chunks)
    return n_chunks * chunk_dim


def hash_embed(texts: Sequence[str], dim: int = 128) -> np.ndarray:
    """Deterministic per-text unit vector; texts sharing a leading topic word
    get correlated vectors (topic centroid + small text-specific noise), so
    cosine structure exists for mining/IR tests."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        words = t.lower().split()
        topic = ""
        for w in words:
            if any(w.startswith(k) or k in w for k, _ in TOPICS):
                topic = next(k for k, _ in TOPICS if k in w)
                break
        base_seed = int.from_bytes(hashlib.md5(topic.encode()).digest()[:4], "little")
        text_seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "little")
        base = np.random.default_rng(base_seed).standard_normal(dim)
        noise = np.random.default_rng(text_seed).standard_normal(dim)
        v = base + 0.15 * noise if topic else noise
        out[i] = v / np.linalg.norm(v)
    return out
