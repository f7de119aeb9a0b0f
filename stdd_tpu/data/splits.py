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


def _identity_tokens(vid: str, all_vids) -> List[str]:
    """Identity-linking tokens of a video name: underscore parts that are
    themselves a video name in the tree (FF++ fakes are named
    ``<source>_<target>`` after the original videos they manipulate) or
    CelebDF-style ``id<k>`` actor ids. Tokens like bare clip numbers that
    name no video link nothing."""
    import re

    toks = vid.split("_")
    out = [t for t in toks if t in all_vids or re.match(r"^id\d+$", t)]
    return out or [vid]


def link_identity_groups(groups: Dict[str, List[str]]) -> Dict[str, List[str]]:
    """Merge per-video groups that share a manipulated identity, so a fake
    and the original it was generated from can never span phases (the FF++
    leak: ``original/000`` in train while ``deepfakes/000_003`` — same actor
    footage — sits in test inflates generalization metrics; the reference's
    split tooling shuffles bare clip-dir lists and has this leak)."""
    all_vids = {vk.split("/", 1)[-1] for vk in groups}
    parent: Dict[str, str] = {}

    def find(a: str) -> str:
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: str, b: str) -> None:
        parent[find(a)] = find(b)

    tok_owner: Dict[str, str] = {}
    for vk in sorted(groups):
        vid = vk.split("/", 1)[-1]
        for tok in _identity_tokens(vid, all_vids):
            if tok in tok_owner:
                union(vk, tok_owner[tok])
            else:
                tok_owner[tok] = vk
    merged: Dict[str, List[str]] = defaultdict(list)
    for vk in sorted(groups):
        merged[find(vk)].extend(groups[vk])
    return dict(merged)


def make_split(
    clip_dirs: Sequence[str],
    ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
    per_tech_cap: Optional[int] = None,
    link_identities: bool = True,
) -> Dict[str, List[str]]:
    """Video-grouped 3-way split with per-technique stratification.

    ``link_identities`` additionally merges groups sharing a manipulated
    identity (see :func:`link_identity_groups`) — per-tech ratios then hold
    approximately, since an identity's original AND all its fakes must land
    in one phase for the split to be leak-free."""
    assert abs(sum(ratios) - 1.0) < 1e-6
    groups = group_by_video(clip_dirs)
    if link_identities:
        groups = link_identity_groups(groups)
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


def check_no_leakage(split: Dict[str, List[str]], identities: bool = True) -> bool:
    """No video key — and (by default) no manipulated identity — may appear
    in two phases."""
    dir_phase = {d: p for p in PHASES for d in split.get(p, [])}
    groups = group_by_video(list(dir_phase))
    if identities:
        groups = link_identity_groups(groups)
    return all(
        len({dir_phase[d] for d in dirs}) <= 1 for dirs in groups.values()
    )
