"""RGB late-fusion training (reference ``dualrun/rgb/engine_rgb.py:424``
train_mmlp + ``fusion.py:413`` train_dual_video, ``csv_alignment.py:85``).

Two pieces:
- :func:`align_scores` joins AltFreezing per-video scores (from the streaming
  harness's per_video.csv) with dual-encoder per-video logits by video key —
  the reference's CSV-alignment step.
- :func:`train_moe` fits the :class:`~stdd_tpu.models.dual_rgb.GatedMoE` on
  (z_rgb, z_dual, y) triples with BCE on the fused logit.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dual_rgb import GatedMoE
from ..train.losses import bce_with_logits
from ..train.metrics import np_logit


def align_scores(
    rgb_csv_path: str,
    dual_scores: Dict[str, float],
    key_column: str = "video_path",
    score_column: str = "video_score",
    label_column: str = "gt_label",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Join per-video RGB scores (harness CSV) with dual-encoder scores by
    video key → (z_rgb, z_dual, y, keys) in logit space."""
    import os

    z_rgb, z_dual, ys, keys = [], [], [], []
    with open(rgb_csv_path) as f:
        for row in csv.DictReader(f):
            key = os.path.splitext(os.path.basename(row[key_column]))[0]
            if key not in dual_scores:
                continue
            z_rgb.append(np_logit(np.asarray([float(row[score_column])]))[0])
            z_dual.append(np_logit(np.asarray([float(dual_scores[key])]))[0])
            ys.append(int(row[label_column]))
            keys.append(key)
    return (np.asarray(z_rgb, np.float32), np.asarray(z_dual, np.float32),
            np.asarray(ys, np.float32), keys)


def train_moe(
    z_rgb: np.ndarray,
    z_dual: np.ndarray,
    y: np.ndarray,
    epochs: int = 200,
    lr: float = 1e-2,
    seed: int = 0,
    log=print,
) -> Dict:
    """Fit the gated fusion on per-video logits (engine_rgb.py:424)."""
    model = GatedMoE()
    zr = jnp.asarray(z_rgb)[:, None]
    zd = jnp.asarray(z_dual)[:, None]
    yy = jnp.asarray(y)
    variables = model.init(jax.random.PRNGKey(seed), zr, zd)
    tx = optax.adam(lr)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            z, g = model.apply({"params": p}, zr, zd)
            return bce_with_logits(z[:, 0], yy), g

        (loss, g), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, g

    params = variables["params"]
    for e in range(epochs):
        params, opt, loss, g = step(params, opt)
        if (e + 1) % max(1, epochs // 4) == 0:
            log(f"[moe {e + 1}/{epochs}] loss={float(loss):.4f} "
                f"gate_mean={float(jnp.mean(g)):.3f}")

    z, g = model.apply({"params": params}, zr, zd)
    fused = np.asarray(jax.nn.sigmoid(z[:, 0]))
    out = {"params": params, "fused_probs": fused, "gates": np.asarray(g[:, 0])}
    try:
        from sklearn.metrics import roc_auc_score

        out["auc_fused"] = float(roc_auc_score(y, fused))
        out["auc_rgb"] = float(roc_auc_score(y, 1 / (1 + np.exp(-z_rgb))))
        out["auc_dual"] = float(roc_auc_score(y, 1 / (1 + np.exp(-z_dual))))
    except Exception:
        pass
    return out
