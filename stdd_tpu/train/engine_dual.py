"""Dual-encoder training engine (the reference's active trainer,
``dualrun/train/engine.py:267`` — 900 lines of torch rebuilt as one jitted
JAX step + a thin host loop).

Loss assembly (engine.py:517-645): main BCE/focal (or track/video-aggregated
noisy-OR), consistency on degraded views, LMK→AU smooth-L1 on reals,
temporal InfoNCE, gradient-reversal DAT cross-entropy, attention
entropy/agreement regularizers, alignment/uniformity on the normalized fused
embedding, optional per-class SLERP embedding augmentation (engine.py:21-47).

Data parallel: jit with the batch sharded over the mesh's data axis — XLA
inserts the gradient collectives (no DDP machinery).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dual_encoder import DualEncoderAU_LMK, grad_reverse
from . import metrics as M
from .altfreeze import (
    AltFreezeCfg,
    active_mask_from_labels,
    dual_labels,
    dual_phase,
    dual_phase_active,
    masked_update,
)
from .losses import (
    alignment,
    bce_with_logits,
    binary_focal_loss,
    mse_masked,
    temporal_infonce,
    uniformity,
)
from .step import TrainState


@dataclass
class DualTrainArgs:
    """Shipped-run defaults (dualrun/checkpoints/test7/args.json)."""

    epochs: int = 30
    batch: int = 256
    lr: float = 3e-4
    wd: float = 1e-4
    clip_grad: float = 1.0
    scheduler: str = "onecycle"          # onecycle | cosine | none
    onecycle_pct_start: float = 0.3
    onecycle_div_factor: float = 25.0
    onecycle_final_div: float = 1e4
    focal: bool = False
    focal_gamma: float = 1.0
    focal_alpha: float = 0.45
    pos_weight: Optional[float] = None
    # 'none' = per-clip main loss; 'track'/'video' = BCE/focal on per-group
    # noisy-OR logits within the batch (reference train_agg, engine.py:517)
    train_agg: str = "none"
    lam_align: float = 0.05
    lam_uniform: float = 0.005
    uniform_t: float = 2.0
    aux_pred_w: float = 0.0
    aux_con_w: float = 0.0
    contrastive_tau: float = 0.1
    cons_w: float = 0.0
    attn_entropy: float = 0.0
    attn_agree: float = 0.0
    dat: bool = True
    dat_lambda: float = 0.1
    dat_schedule: str = "linear"
    slerp: bool = True
    slerp_range: Tuple[float, float] = (0.1, 0.4)
    altfreeze: AltFreezeCfg = field(default_factory=lambda: AltFreezeCfg(enabled=False))
    es_metric: str = "auc"
    es_warmup: int = 4
    patience: int = 10
    seed: int = 123
    threshold_metric: str = "youden"
    target_fpr: Optional[float] = None


class EarlyStopper:
    """Patience-based early stopping on a maximized metric (engine.py:49)."""

    def __init__(self, patience: int = 10, warmup: int = 0):
        self.patience = patience
        self.warmup = warmup
        self.best = -math.inf
        self.best_epoch = -1
        self.count = 0

    def update(self, value: float, epoch: int) -> bool:
        """Returns True when training should stop."""
        if value > self.best:
            self.best = value
            self.best_epoch = epoch
            self.count = 0
            return False
        if epoch < self.warmup:
            return False
        self.count += 1
        return self.count > self.patience


def _slerp_same_class(z: jnp.ndarray, y: jnp.ndarray, t0: float, t1: float, rng) -> jnp.ndarray:
    """Per-class spherical interpolation of unit embeddings
    (dualrun/data/slerp.py:8 + engine.py:21 _slerp_aug_per_class): each sample
    is slerped toward a random same-class partner with t ~ U[t0, t1]."""
    n = z.shape[0]
    k1, k2 = jax.random.split(rng)
    same = y[:, None] == y[None, :]
    gumbel = jax.random.gumbel(k1, (n, n))
    partner = jnp.argmax(jnp.where(same, gumbel, -jnp.inf), axis=1)
    z2 = z[partner]
    t = jax.random.uniform(k2, (n, 1), minval=t0, maxval=t1)
    dot = jnp.clip(jnp.sum(z * z2, axis=-1, keepdims=True), -1 + 1e-7, 1 - 1e-7)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    out = (jnp.sin((1 - t) * omega) / so) * z + (jnp.sin(t * omega) / so) * z2
    # degenerate (parallel) pairs fall back to linear
    out = jnp.where(so < 1e-6, (1 - t) * z + t * z2, out)
    return out


def smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def make_dual_train_step(model: DualEncoderAU_LMK, tx, args: DualTrainArgs):
    """Returns jitted ``step(state, batch, mask_tree, dat_lambda, rng)``."""

    def loss_fn(params, batch, dat_lambda, rng):
        drop_rng, slerp_rng = jax.random.split(rng)
        out = model.apply(
            {"params": params},
            batch["A"], batch["L"],
            lengths=batch.get("lengths"),
            train=True,
            need_aux=args.aux_pred_w > 0 or args.aux_con_w > 0,
            return_z=True,
            return_seq=True,
            rngs={"dropout": drop_rng},
        )
        y = batch["y"].astype(jnp.float32)
        z = out["z"]
        pad = None
        if batch.get("lengths") is not None:
            from ..models.dual_encoder import lengths_to_mask

            pad = lengths_to_mask(batch["lengths"], batch["A"].shape[1])

        z_clean = z
        if args.slerp:
            z_norm0 = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            z_clean = _slerp_same_class(
                z_norm0, y.astype(jnp.int32), args.slerp_range[0], args.slerp_range[1],
                slerp_rng,
            )
        # binary head (+ reversed domain head) on the (possibly slerped)
        # embedding — engine.py:514
        head_out = model.apply(
            {"params": params}, None, None,
            z_override=z_clean, train=True, dat_lambda=dat_lambda,
            rngs={"dropout": drop_rng},
        )
        bin_logits = head_out["bin_logits"]

        if args.train_agg != "none" and "grp" in batch:
            # aggregated main objective (engine.py:517-567): BCE/focal on
            # per-GROUP logits — noisy-OR in logit space over the group's
            # clips within the batch (group = track or video, dense ids
            # computed host-side). A group is fake if any clip is fake.
            from .losses import noisy_or_group_logits

            B = bin_logits.shape[0]
            g = batch["grp"].astype(jnp.int32)
            g_logits = noisy_or_group_logits(bin_logits, g, B)
            cnt = jax.ops.segment_sum(jnp.ones((B,), jnp.float32), g,
                                      num_segments=B)
            g_y = jax.ops.segment_max(y, g, num_segments=B)
            if args.focal:
                per = binary_focal_loss(g_logits, g_y, args.focal_gamma,
                                        args.focal_alpha, reduction="none")
            else:
                per = bce_with_logits(g_logits, g_y,
                                      pos_weight=args.pos_weight,
                                      reduction="none")
            main = (jnp.sum(jnp.where(cnt > 0, per, 0.0))
                    / jnp.maximum(jnp.sum(cnt > 0), 1.0))
        elif args.focal:
            main = binary_focal_loss(bin_logits, y, args.focal_gamma, args.focal_alpha)
        else:
            main = bce_with_logits(bin_logits, y, pos_weight=args.pos_weight)

        loss = main
        parts = {"main": main}

        if args.aux_pred_w > 0:
            is_real = (y == 0)[:, None] & jnp.ones_like(batch["A"][..., 0], bool)
            valid = is_real if pad is None else (~pad) & is_real
            diff = smooth_l1(out["au_pred"], batch["A"])
            auxp = jnp.sum(diff * valid[..., None]) / jnp.maximum(jnp.sum(valid), 1.0)
            loss = loss + args.aux_pred_w * auxp
            parts["aux_pred"] = auxp
        if args.aux_con_w > 0:
            auxc = temporal_infonce(
                out["proj_lmk"], out["proj_au"], pad, args.contrastive_tau
            )
            loss = loss + args.aux_con_w * auxc
            parts["aux_con"] = auxc

        if args.dat and model.use_dat and "dom_id" in batch:
            dom_logits = head_out["dom_logits"]
            did = batch["dom_id"].astype(jnp.int32)
            C = dom_logits.shape[-1]
            valid = (did >= 0) & (did < C)
            logp = jax.nn.log_softmax(dom_logits, axis=-1)
            ce = -jnp.take_along_axis(logp, jnp.clip(did, 0, C - 1)[:, None], axis=1)[:, 0]
            dat_term = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
            loss = loss + dat_term
            parts["dat"] = dat_term

        if args.attn_entropy > 0 or args.attn_agree > 0:
            wa, wl = out["weights"]["au"], out["weights"]["lmk"]
            eps = 1e-8
            if args.attn_entropy > 0:
                Tn = wa.shape[1]

                def ent(w):
                    wc = jnp.maximum(w, eps)
                    return -jnp.sum(wc * jnp.log(wc), axis=1) / math.log(max(Tn, 2))

                attn_e = jnp.mean(ent(wa)) + jnp.mean(ent(wl))
                loss = loss + args.attn_entropy * attn_e
                parts["attn_entropy"] = attn_e
            if args.attn_agree > 0:
                wac = jnp.maximum(wa, eps)
                wlc = jnp.maximum(wl, eps)
                kl1 = jnp.mean(jnp.sum(wlc * (jnp.log(wlc) - jnp.log(wac)), axis=1))
                kl2 = jnp.mean(jnp.sum(wac * (jnp.log(wac) - jnp.log(wlc)), axis=1))
                loss = loss + args.attn_agree * (kl1 + kl2)
                parts["attn_agree"] = kl1 + kl2

        if args.lam_align > 0 or args.lam_uniform > 0:
            z_norm = z_clean / jnp.maximum(
                jnp.linalg.norm(z_clean, axis=-1, keepdims=True), 1e-12
            )
            if args.lam_align > 0:
                al = alignment(z_norm, y.astype(jnp.int32))
                loss = loss + args.lam_align * al
                parts["align"] = al
            if args.lam_uniform > 0:
                un = uniformity(z_norm, t=args.uniform_t)
                loss = loss + args.lam_uniform * un
                parts["uniform"] = un

        acc = jnp.mean((jax.nn.sigmoid(bin_logits) > 0.5) == (y > 0.5))
        parts.update(loss=loss, acc=acc)
        return loss, parts

    def step(state: TrainState, batch, active_mask, dat_lambda, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dat_lambda, rng
        )
        parts["grad_norm"] = optax.global_norm(grads)
        new_params, new_opt = masked_update(
            tx, grads, state.opt_state, state.params, active_mask
        )
        return (
            TrainState(new_params, state.batch_stats, new_opt, state.step + 1),
            parts,
        )

    return jax.jit(step)




def make_eval_fn(model: DualEncoderAU_LMK):
    @jax.jit
    def eval_fn(params, A, L, lengths):
        out = model.apply({"params": params}, A, L, lengths=lengths)
        return out["bin_logits"]

    return eval_fn


def collect_logits(
    eval_fn, params, data: Dict[str, np.ndarray], batch: int = 256,
    smooth_alpha: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched eval logits over a host dataset dict (metrics.py:22)."""
    N = len(data["y"])
    logits = []
    for i in range(0, N, batch):
        A = data["A"][i : i + batch]
        L = data["L"][i : i + batch]
        if smooth_alpha > 0:
            A = M.ema_1d(A, smooth_alpha)
            L = M.ema_1d(L, smooth_alpha)
        lengths = data.get("lengths")
        lengths = None if lengths is None else jnp.asarray(lengths[i : i + batch])
        logits.append(np.asarray(eval_fn(params, jnp.asarray(A), jnp.asarray(L), lengths)))
    return np.concatenate(logits), np.asarray(data["y"])


def make_schedule(args: DualTrainArgs, steps_per_epoch: int):
    total = max(1, args.epochs * steps_per_epoch)
    if args.scheduler == "onecycle":
        # optax's onecycle needs each phase >= 1 step; with fewer total steps
        # its internal interval division yields NaN LR for EVERY step (which
        # then NaNs the params silently) — fall back to a constant LR
        if int(total * args.onecycle_pct_start) < 1 or total < 4:
            return args.lr
        return optax.cosine_onecycle_schedule(
            transition_steps=total,
            peak_value=args.lr,
            pct_start=args.onecycle_pct_start,
            div_factor=args.onecycle_div_factor,
            final_div_factor=args.onecycle_final_div,
        )
    if args.scheduler == "cosine":
        return optax.cosine_decay_schedule(args.lr, total)
    return args.lr


def train_dual(
    model: DualEncoderAU_LMK,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    args: DualTrainArgs,
    out_dir: Optional[str] = None,
    sampler=None,
    test_data: Optional[Dict[str, np.ndarray]] = None,
    log: Callable[[str], None] = print,
    train_provider: Optional[Callable[[], Dict[str, np.ndarray]]] = None,
) -> Dict[str, Any]:
    """Full training loop (engine.py:267 train): balanced sampling, AltFreeze
    phases, early stopping on val AUC, best-checkpoint reload, temperature
    fit, calibrated threshold, final test metrics."""
    from flax import serialization

    rng = jax.random.PRNGKey(args.seed)
    N = len(train_data["y"])
    steps_per_epoch = max(1, (len(sampler) if sampler is not None else N) // args.batch)

    sched = make_schedule(args, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(args.clip_grad) if args.clip_grad else optax.identity(),
        optax.adamw(sched, weight_decay=args.wd),
    )

    T = train_data["A"].shape[1]
    sampleA = jnp.zeros((1, T, train_data["A"].shape[2]))
    sampleL = jnp.zeros((1, T, train_data["L"].shape[2]))
    variables = model.init(rng, sampleA, sampleL)
    params = variables["params"]
    state = TrainState(params, {}, tx.init(params), jnp.zeros((), jnp.int32))

    agg_key = {"track": "trk", "video": "vid"}.get(args.train_agg)
    if args.train_agg != "none":
        if agg_key is None:
            raise ValueError(
                f"train_agg must be 'none', 'track' or 'video' (got "
                f"{args.train_agg!r})")
        if agg_key not in train_data:
            raise ValueError(
                f"train_agg={args.train_agg!r} needs train_data[{agg_key!r}] "
                "group ids (dataset batches carry them — see data/dataset.py)")

    labels = dual_labels(params)
    step_fn = make_dual_train_step(model, tx, args)
    eval_fn = make_eval_fn(model)
    stopper = EarlyStopper(args.patience, args.es_warmup)
    best_blob = None
    best_auc = -1.0
    best_thr = 0.5
    history: List[Dict[str, float]] = []

    for epoch in range(1, args.epochs + 1):
        if train_provider is not None and epoch > 1:
            # re-materialize so feature-space augmentations (noise, temporal
            # crop) are re-SAMPLED per epoch — a single load_all would bake
            # one fixed noise draw into all epochs (the reference's torch
            # DataLoader re-runs __getitem__ every epoch)
            train_data = train_provider()
        phase = dual_phase(args.altfreeze, epoch, args.epochs)
        active = active_mask_from_labels(labels, dual_phase_active(phase))
        dat_lam = (
            args.dat_lambda * (epoch / max(1, args.epochs))
            if args.dat_schedule == "linear"
            else args.dat_lambda
        )
        if sampler is not None:
            sampler.set_epoch(epoch)
            order = np.fromiter(iter(sampler), dtype=np.int64)
        else:
            order = np.random.RandomState(args.seed + epoch).permutation(N)

        ep_loss = []
        for s in range(steps_per_epoch):
            idx = order[s * args.batch : (s + 1) * args.batch]
            if len(idx) < 2:
                continue
            batch = {
                "A": jnp.asarray(train_data["A"][idx]),
                "L": jnp.asarray(train_data["L"][idx]),
                "y": jnp.asarray(train_data["y"][idx]),
            }
            if "lengths" in train_data:
                batch["lengths"] = jnp.asarray(train_data["lengths"][idx])
            if "dom_id" in train_data:
                batch["dom_id"] = jnp.asarray(train_data["dom_id"][idx])
            if agg_key is not None:
                # dense [0, B) group ids for the jitted segment ops
                _, dense = np.unique(train_data[agg_key][idx],
                                     return_inverse=True)
                batch["grp"] = jnp.asarray(dense, jnp.int32)
            state, parts = step_fn(state, batch, active, jnp.float32(dat_lam), rng)
            # keep the device array — a float() here would sync every step
            # and serialize host batch prep against device compute
            ep_loss.append(parts["loss"])

        val_logits, val_y = collect_logits(eval_fn, state.params, val_data)
        vm = M.metrics_from_logits(val_logits, val_y)
        thr, _ = M.threshold_from_roc(
            vm["probs"], val_y, metric=args.threshold_metric, target_fpr=args.target_fpr
        )
        ep_loss = [float(l) for l in ep_loss]   # one sync point per epoch
        history.append(
            {"epoch": epoch, "phase": phase, "loss": float(np.mean(ep_loss or [0])),
             "val_auc": vm["roc_auc"], "val_acc": vm["acc"], "thr": thr}
        )
        log(
            f"[epoch {epoch}/{args.epochs}] phase={phase} "
            f"loss={history[-1]['loss']:.4f} val_auc={vm['roc_auc']:.4f} thr={thr:.4f}"
        )
        metric = vm["roc_auc"] if args.es_metric == "auc" else vm["acc"]
        if metric > best_auc:
            best_auc = metric
            best_thr = thr
            best_blob = serialization.to_bytes(state.params)
        if stopper.update(metric, epoch):
            log(f"early stop at epoch {epoch} (best={stopper.best:.4f} @ {stopper.best_epoch})")
            break

    if best_blob is not None:
        params = serialization.from_bytes(state.params, best_blob)
    else:
        params = state.params

    # temperature scaling + calibrated threshold on val (engine.py:790-840)
    val_logits, val_y = collect_logits(eval_fn, params, val_data)
    T_star = M.fit_temperature(val_logits, val_y)
    probs_cal = M.sigmoid(val_logits / T_star)
    thr_cal, _ = M.threshold_from_roc(probs_cal, val_y, metric=args.threshold_metric)

    result: Dict[str, Any] = {
        "best_val_auc": best_auc,
        "best_threshold": best_thr,
        "temperature": T_star,
        "threshold_calibrated": thr_cal,
        "history": history,
        "params": params,
    }

    if test_data is not None:
        test_logits, test_y = collect_logits(eval_fn, params, test_data)
        tm = M.metrics_from_logits(test_logits / T_star, test_y, threshold=thr_cal)
        result["test"] = {k: tm[k] for k in ("acc", "roc_auc", "pr_auc", "f1", "balacc")}
        if "trk" in test_data:
            p_person, y_person = M.agg_person_median(test_logits, test_y, test_data["trk"])
            from sklearn.metrics import roc_auc_score

            try:
                result["test"]["track_auc"] = roc_auc_score(y_person, p_person)
            except Exception:
                result["test"]["track_auc"] = float("nan")
            if "vid" in test_data:
                p_vid, y_vid = M.agg_video_noisyor(
                    test_logits, test_y, test_data["trk"], test_data["vid"]
                )
                try:
                    result["test"]["video_auc"] = roc_auc_score(y_vid, p_vid)
                except Exception:
                    result["test"]["video_auc"] = float("nan")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "best.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))
        # sidecar files mirroring the reference layout (engine.py:111-123)
        for name, val in [
            ("best_threshold.txt", best_thr),
            ("best_threshold_calibrated.txt", thr_cal),
            ("temperature.txt", T_star),
        ]:
            with open(os.path.join(out_dir, name), "w") as f:
                f.write(f"{val:.6f}\n")
        with open(os.path.join(out_dir, "args.json"), "w") as f:
            json.dump(dataclasses.asdict(args), f, indent=2, default=str)
        with open(os.path.join(out_dir, "history.json"), "w") as f:
            json.dump(history, f, indent=2)
    return result
