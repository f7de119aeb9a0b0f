"""Checkpointing: epoch-indexed pytree checkpoints with GC, resume and a
tolerant partial loader.

Mirrors the reference's three schemes (SURVEY §5):
- ``{name}_{epoch}.msgpack`` with ``max_to_keep`` GC and ``find_last`` resume
  (reference model/_base.py:28-116 ModelBase)
- tolerant load: key-prefix stripping and shape-filtered merging
  (model/_base.py:56-95 — every reference entry point relies on this)
- sidecar metadata JSON (dualrun best.pt + args.json convention)
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    directory: str,
    name: str,
    epoch: int,
    tree: Any,
    max_to_keep: int = 5,
    metadata: Optional[Dict] = None,
    protect: Optional[str] = None,
) -> str:
    """``protect`` names one checkpoint file the GC must never delete —
    the best-validation epoch (run_i3d's best.json pointer). Without it a
    long schedule whose best epoch came early GCs the very checkpoint
    serving is told to load (bit a real 10-epoch run: best at epoch 1,
    max_to_keep 5 kept only 6-10)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}_{epoch}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, tree)))
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=1, default=str)
    # GC old checkpoints (ModelBase.save_models max_to_keep). Never delete
    # the file just written: saving an epoch LOWER than existing ones
    # (resume from an older checkpoint) would otherwise GC it immediately
    # and return a dangling path.
    if max_to_keep and max_to_keep > 0:
        found = list_checkpoints(directory, name)
        for ep, p in found[:-max_to_keep]:
            if os.path.abspath(p) == os.path.abspath(path):
                continue
            if protect and os.path.basename(p) == protect:
                continue
            try:
                os.remove(p)
                if os.path.exists(p + ".json"):
                    os.remove(p + ".json")
            except OSError:
                pass
    return path


def list_checkpoints(directory: str, name: str) -> List[Tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(directory, f"{name}_*.msgpack")):
        m = re.match(rf".*{re.escape(name)}_(\d+)\.msgpack$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def find_last(directory: str, name: str) -> Optional[Tuple[int, str]]:
    """Latest epoch checkpoint (ModelBase.find_last)."""
    found = list_checkpoints(directory, name)
    return found[-1] if found else None


def load_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
        return out
    return {prefix: tree}


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Any:
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


def tolerant_merge(
    target: Any, source: Any, strip_prefixes: Tuple[str, ...] = ()
) -> Tuple[Any, Dict[str, List[str]]]:
    """Merge ``source`` leaves into ``target`` wherever path+shape match.

    Reproduces the reference's tolerant checkpoint loader semantics
    (model/_base.py:56-95): strip known prefixes, drop keys missing from the
    model, skip shape mismatches, report the diff.
    """
    tgt = _flatten(jax.tree.map(np.asarray, target))
    src = _flatten(jax.tree.map(np.asarray, source))

    def strip(path: Tuple[str, ...]) -> Tuple[str, ...]:
        while path and path[0] in strip_prefixes:
            path = path[1:]
        return path

    src = {strip(k): v for k, v in src.items()}
    report = {"loaded": [], "missing": [], "unexpected": [], "shape_mismatch": []}
    merged = dict(tgt)
    for path, v in src.items():
        if path not in tgt:
            report["unexpected"].append("/".join(path))
            continue
        if np.shape(tgt[path]) != np.shape(v):
            report["shape_mismatch"].append("/".join(path))
            continue
        merged[path] = np.asarray(v, dtype=np.asarray(tgt[path]).dtype)
        report["loaded"].append("/".join(path))
    for path in tgt:
        if path not in src:
            report["missing"].append("/".join(path))
    return _unflatten(merged), report
