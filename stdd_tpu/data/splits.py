"""Dataset split construction — video-grouped, deterministic, leak-free.

Covers the reference's split tooling (``dualrun/data/makeFF_splits.py:64``,
``makeCDF_splits.py:53``, ``makeSplit.py:123``, ``combine_splits.py:43``,
``flatten_split``): clips are grouped by their video key so no video spans
two phases, per-technique ratios/caps are honored, and seeds make the split
reproducible. One generic implementation replaces the three dataset-specific
scripts; JSON in/out matches the flat ``{"train": [...], "val": [...],
"test": [...]}`` layout consumed by the trainer.
"""

from __future__ import annotations

import json
import os
import random
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .dataset import ids_from_dir, infer_tech_from_path, label_from_dir

PHASES = ("train", "val", "test")


def group_by_video(clip_dirs: Sequence[str]) -> Dict[str, List[str]]:
    groups: Dict[str, List[str]] = defaultdict(list)
    for d in clip_dirs:
        vk, _ = ids_from_dir(d)
        groups[vk].append(d)
    return dict(groups)


def make_split(
    clip_dirs: Sequence[str],
    ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
    per_tech_cap: Optional[int] = None,
) -> Dict[str, List[str]]:
    """Video-grouped 3-way split with per-technique stratification."""
    assert abs(sum(ratios) - 1.0) < 1e-6
    groups = group_by_video(clip_dirs)
    # bucket videos by (tech, label) for stratification
    buckets: Dict[Tuple[str, int], List[str]] = defaultdict(list)
    for vk, dirs in groups.items():
        tech = infer_tech_from_path(dirs[0])
        lab = label_from_dir(dirs[0])
        buckets[(tech, lab)].append(vk)

    rng = random.Random(seed)
    out: Dict[str, List[str]] = {p: [] for p in PHASES}
    for key in sorted(buckets):
        vids = sorted(buckets[key])
        rng.shuffle(vids)
        if per_tech_cap:
            vids = vids[:per_tech_cap]
        n = len(vids)
        n_train = int(round(n * ratios[0]))
        n_val = int(round(n * ratios[1]))
        phases = (
            [("train", v) for v in vids[:n_train]]
            + [("val", v) for v in vids[n_train : n_train + n_val]]
            + [("test", v) for v in vids[n_train + n_val :]]
        )
        for phase, vk in phases:
            out[phase].extend(groups[vk])
    for p in PHASES:
        out[p].sort()
    return out


def combine_splits(splits: Iterable[Dict[str, List[str]]]) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {p: [] for p in PHASES}
    for s in splits:
        for p in PHASES:
            out[p].extend(s.get(p, []))
    for p in PHASES:
        out[p] = sorted(set(out[p]))
    return out


def flatten_split(split: Dict[str, List[str]]) -> List[Tuple[str, str]]:
    return [(p, d) for p in PHASES for d in split.get(p, [])]


def save_split(split: Dict[str, List[str]], path: str) -> None:
    with open(path, "w") as f:
        json.dump(split, f, indent=1)


def load_split(path: str) -> Dict[str, List[str]]:
    with open(path) as f:
        return json.load(f)


def check_no_leakage(split: Dict[str, List[str]]) -> bool:
    """No video key may appear in two phases."""
    seen: Dict[str, str] = {}
    for p in PHASES:
        for d in split.get(p, []):
            vk, _ = ids_from_dir(d)
            if vk in seen and seen[vk] != p:
                return False
            seen[vk] = p
    return True
