"""Train the dense FaceMesh-topology landmarker on device-rendered faces.

The reference obtains dense landmarks from MediaPipe's shipped model; no
such weights are obtainable here (zero egress), so the landmarker is
DISTILLED from a procedural face model: ``models/facemesh.render_faces``
renders parameterized faces entirely on device (parameters → image, exact
landmark ground truth by construction), and :class:`LandmarkNet` learns to
invert the renderer. There is no input pipeline at all — each step draws
fresh parameters from the PRNG and renders on the TPU, so the single host
core never touches a training byte.

Loss = parameter regression (rigid + theta) + landmark reconstruction on the
semantically-used indices (KEY_LANDMARKS ∪ MP68) — the quantity downstream
features actually consume (``data/features.py``).

CLI::

    python -m stdd_tpu.train.train_landmarker --steps 3000 \
        --out runs/landmarker.pkl
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.facemesh import (
    THETA_DIM, DenseLandmarker, LandmarkNet, augment_renders, canonical_mesh,
    reconstruct, render_faces, sample_holdout_params, sample_params,
)


def _key_indices() -> np.ndarray:
    from ..data.features import KEY_LANDMARKS_IDXS, MP68_IDX

    return np.asarray(sorted(set(KEY_LANDMARKS_IDXS) | set(MP68_IDX)), np.int32)


def make_train_step(net: LandmarkNet, tx, canon, key_idx, batch: int = 256,
                    w_param: float = 1.0, w_lmk: float = 20.0,
                    exclude_holdout: bool = True, augment: bool = True):
    """One jitted train step: render → randomize → forward → param +
    landmark loss. Defaults hold out the HOLDOUT_ROT/HOLDOUT_LIGHT bands
    (off-domain eval set) and apply augment_renders domain randomization
    (round-2 VERDICT #3a/#3c)."""

    def loss_fn(params, key):
        kp, kn = jax.random.split(key)
        rigid, theta, style = sample_params(
            kp, batch, exclude_holdout=exclude_holdout)
        if augment:
            imgs = augment_renders(kn, render_faces(rigid, theta, style))
        else:
            imgs = render_faces(rigid, theta, style, key=kn)
        pred_rigid, pred_theta = net.apply(params, imgs)
        l_param = jnp.mean((pred_rigid - rigid) ** 2) + jnp.mean(
            (pred_theta - theta) ** 2)
        gt = reconstruct(canon, rigid, theta)[:, key_idx]
        pr = reconstruct(canon, pred_rigid, pred_theta)[:, key_idx]
        l_lmk = jnp.mean((gt - pr) ** 2)
        return w_param * l_param + w_lmk * l_lmk, (l_param, l_lmk)

    @jax.jit
    def step(params, opt_state, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def holdout_error(lm: DenseLandmarker, n: int = 64, seed: int = 11) -> float:
    """Mean |err| (crop-normalized units) on the key landmarks over renders
    drawn ENTIRELY from the held-out bands (roll + lighting out of the
    training domain) — the off-domain generalization number PARITY.md §2.1
    reports."""
    key_idx = _key_indices()
    canon = jnp.asarray(canonical_mesh())
    rigid, theta, style = sample_holdout_params(jax.random.PRNGKey(seed), n)
    imgs = render_faces(rigid, theta, style)
    gt = np.asarray(reconstruct(canon, rigid, theta))[:, key_idx]
    pr, _ = lm._fwd(lm.variables, imgs)
    return float(np.abs(np.asarray(pr)[:, key_idx] - gt).mean())


def train(steps: int = 3000, lr: float = 3e-4, seed: int = 0, batch: int = 256,
          log_every: int = 100, params=None, verbose: bool = True,
          exclude_holdout: bool = True, augment: bool = True):
    """Train and return a ready :class:`DenseLandmarker`."""
    net = LandmarkNet()
    key = jax.random.PRNGKey(seed)
    if params is None:
        params = net.init(key, jnp.zeros((1, 128, 128, 3)))
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.1))
    opt_state = tx.init(params)
    canon = jnp.asarray(canonical_mesh())
    key_idx = jnp.asarray(_key_indices())
    step = make_train_step(net, tx, canon, key_idx, batch=batch,
                           exclude_holdout=exclude_holdout, augment=augment)

    history = []
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, (l_param, l_lmk) = step(params, opt_state, k)
        if verbose and (i % log_every == 0 or i == steps - 1):
            lf = float(loss)       # host fetch = honest sync point
            history.append(lf)
            print(f"step {i:5d}  loss {lf:.5f}  param {float(l_param):.5f} "
                  f"lmk {float(l_lmk):.5f}  {time.perf_counter() - t0:.1f}s",
                  flush=True)
    lm = DenseLandmarker(variables=params)
    lm.history = history
    return lm


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="landmarker.pkl")
    ap.add_argument("--include_holdout", action="store_true",
                    help="train on the full parameter space (no held-out bands)")
    ap.add_argument("--no_augment", action="store_true")
    args = ap.parse_args(argv)
    lm = train(steps=args.steps, lr=args.lr, seed=args.seed, batch=args.batch,
               exclude_holdout=not args.include_holdout,
               augment=not args.no_augment)
    print(f"holdout_error {holdout_error(lm):.5f}  (crop-normalized units)")
    lm.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
