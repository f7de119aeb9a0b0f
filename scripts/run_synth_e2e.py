"""End-to-end synthetic benchmark: the COMPLETE production workflow on one
self-contained, reproducible dataset.

The rig has no real face footage (zero egress), so accuracy evidence has so
far lived in per-component oracle tests plus separable-data trainer runs.
This script composes the WHOLE pipeline the way a user would, through the
shipped CLIs, ending in an honest video AUC:

  1. **Render** a video benchmark: real = smooth procedural talking heads
     (``eval/bench_scene.BenchScene``); fake = the SAME identity/motion/style
     with the talking loop temporally scrambled (``expr_order`` permutation).
     Real/fake pairs share seeds, so identity, geometry and photometrics are
     identical across classes — the ONLY separating signal is temporal
     incoherence, the cue AltFreezing's temporal kernels exist to catch.
     Detection/tracking cannot shortcut (head position is smooth in both).
  2. **Preprocess** via the ``stdd_tpu.data.preprocess`` CLI: YuNet detect →
     ByteTrack → per-track 8-frame clip tree (the reference's
     ``preprocessing_parallel.py`` workflow).
  3. **Train** via the ``stdd_tpu.train.run_i3d`` CLI: AltFreezing I3D
     (alternating temporal/spatial masking, warmup-cosine SGD, precise-BN,
     epoch checkpoints) on the clip tree.
  4. **Evaluate** via the ``stdd_tpu.eval.harness`` CLI serving the JAX
     checkpoint (``--jax_ckpt``) over HELD-OUT videos (disjoint seeds =
     unseen identities/motions) → per_video.csv / summary.csv and the video
     AUC (the reference's ``TEST2.py`` workflow).
  5. **(--dual)** the SECOND detector family end to end: phase 2 also runs
     the dense landmarker + AU net and writes feature sequences; the
     dual-encoder trains on them via the ``stdd_tpu.train.run_dual`` CLI
     (threshold selection, temperature scaling, report_median.json) — the
     reference's ``dualrun`` workflow on the same benchmark.

Two preprocess trees: the I3D tree uses plain crops at window-length
clips (the best-measured full-scale configuration — see the round-5
serving-gap study in docs/PERF.md, which A/B'd aligned/union/jittered
alternatives and found them all worse through the harness), and the dual
tree keeps the reference preprocessing semantics (plain crops,
CLIP_LENGTH=8, feature sequences).

Usage:  timeout 3600 python scripts/run_synth_e2e.py [--smoke] [--out DIR]
Prints one JSON line; paste the result into docs/PERF.md.
"""

import argparse
import csv
import json
import os
import shutil
import sys
import time

import numpy as np


def _write_video(path: str, scene, n_frames: int, fps: float = 30.0) -> None:
    import cv2

    H, W = scene.frame_hw
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (W, H))
    if not wr.isOpened():  # fallback: uncompressed
        wr = cv2.VideoWriter(path, 0, fps, (W, H))
    if not wr.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed for {path}")
    try:
        for i in range(n_frames):
            wr.write(scene.frame(i))
    finally:
        wr.release()


def render_benchmark(root: str, seeds, n_frames: int, frame_hw, face_px: int,
                     loop: int = 24) -> int:
    """Paired real/fake videos: vid seed s → real/vid_s.avi (identity talking
    smoothly) + fake/vid_s.avi (same identity, scrambled expression order)."""
    from stdd_tpu.eval.bench_scene import BenchScene

    n = 0
    for s in seeds:
        scene = BenchScene(frame_hw, n_faces=1, seed=s, face_px=face_px,
                           loop=loop)
        _write_video(os.path.join(root, "real", f"vid_{s:03d}.avi"),
                     scene, n_frames)
        rng = np.random.RandomState(10_000 + s)
        perm = rng.permutation(loop)
        while np.mean(np.abs(perm - np.arange(loop))) < loop / 4:
            perm = rng.permutation(loop)
        scene_f = BenchScene(frame_hw, n_faces=1, seed=s, face_px=face_px,
                             loop=loop, expr_order=perm)
        _write_video(os.path.join(root, "fake", f"vid_{s:03d}.avi"),
                     scene_f, n_frames)
        n += 2
    return n


def lm_sentinel_stats(clips_dir: str) -> dict:
    """Aggregate the landmark-quality sentinel columns the preprocess CLI
    logs per clip (``master_clip_log.csv``: lm5_agreement, lm_flagged) into
    the capstone JSON (VERDICT r4 #6 — the CSV columns existed; nothing
    surfaced them). Returns {} when the log is absent or has no landmarked
    clips."""
    path = os.path.join(clips_dir, "master_clip_log.csv")
    if not os.path.exists(path):
        return {}
    agr, flagged, n = [], 0, 0
    with open(path) as f:
        for row in csv.DictReader(f):
            n += 1
            if row.get("lm_flagged") == "True":
                flagged += 1
            try:
                a = float(row.get("lm5_agreement", "nan"))
            except ValueError:
                a = float("nan")
            if np.isfinite(a):
                agr.append(a)
    if n == 0 or (not agr and flagged == 0):
        # no landmarker ran on this tree — a vacuous flag_rate of 0.0
        # would read as "sentinel checked and passed"
        return {}
    out = {"lm_clips": n, "lm_flag_rate": round(flagged / n, 4)}
    if agr:
        out["lm5_agreement_mean"] = round(float(np.mean(agr)), 4)
        out["lm5_agreement_p90"] = round(float(np.percentile(agr, 90)), 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_e2e")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU — validates the composition only")
    ap.add_argument("--train_pairs", type=int, default=None)
    ap.add_argument("--eval_pairs", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --out first (preprocess resume-skips otherwise)")
    ap.add_argument("--require_tpu", action="store_true",
                    help="abort (exit 3, one JSON error line) instead of "
                         "degrading to --smoke when the probe ladder fails — "
                         "for orchestrated retry loops where a CPU smoke run "
                         "would silently hold the slot for hours")
    ap.add_argument("--dual", action=argparse.BooleanOptionalAction, default=None,
                    help="also run the SECOND detector family end to end: "
                         "preprocess with dense landmarks + AU features, "
                         "train the dual-encoder (run_dual CLI), report its "
                         "video AUC (default: on for the full run, off in "
                         "--smoke)")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import tpu_available

    if not args.smoke and not tpu_available(150, attempts=3):
        if args.require_tpu:
            print(json.dumps({"metric": "synth_e2e",
                              "error": "tpu_unavailable(ladder_exhausted)"}))
            sys.exit(3)
        print("TPU unavailable -> smoke mode", file=sys.stderr)
        args.smoke = True
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.smoke:
        cfg = dict(frame_hw=(360, 640), face_px=288, frames=48,
                   train_pairs=2, eval_pairs=2, crop=112, clip_size=8,
                   batch=4, epochs=2, stride=4, crop_buffer=128,
                   batch_clips=2, precise_bn=2, dual_epochs=2,
                   dual_batch=32, dual_samples=256)
    else:
        cfg = dict(frame_hw=(720, 1280), face_px=288, frames=140,
                   train_pairs=8, eval_pairs=6, crop=224, clip_size=32,
                   batch=8, epochs=5, stride=5, crop_buffer=256,
                   batch_clips=2, precise_bn=4, dual_epochs=12,
                   dual_batch=64, dual_samples=4096)
    dual = args.dual if args.dual is not None else (not args.smoke)
    for k in ("train_pairs", "eval_pairs", "frames", "epochs"):
        if getattr(args, k) is not None:
            cfg[k] = getattr(args, k)

    out = args.out
    if args.fresh and os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    wall = {}

    # -- 1. render ---------------------------------------------------------
    t0 = time.perf_counter()
    train_root = os.path.join(out, "videos_train")
    eval_root = os.path.join(out, "videos_eval")
    n_train = render_benchmark(train_root, range(0, cfg["train_pairs"]),
                               cfg["frames"], cfg["frame_hw"], cfg["face_px"])
    n_eval = render_benchmark(eval_root, range(100, 100 + cfg["eval_pairs"]),
                              cfg["frames"], cfg["frame_hw"], cfg["face_px"])
    wall["render"] = round(time.perf_counter() - t0, 1)
    print(f"rendered {n_train} train / {n_eval} eval videos", file=sys.stderr)

    # -- 2. preprocess (dataset-production CLI) -----------------------------
    # Two trees:
    # - I3D tree: PLAIN crops at window-length clips — the best-measured
    #   full-scale configuration (held-out video AUC 0.847; the round-5
    #   serving-gap study in docs/PERF.md A/B'd five alternatives — both
    #   --aligned variants, union domains, geometric jitter — and every
    #   one scored lower through the harness because the aligned domain
    #   saturates validation instantly, leaving thin-margin checkpoints
    #   that serve-time geometry noise reorders). --aligned remains
    #   available on the preprocess CLI for future rounds.
    # - dual tree (when phase 5 is on): the reference preprocessing
    #   semantics — plain crops, CLIP_LENGTH=8, dense landmarks + AUs →
    #   feature sequences (preprocessing_parallel.py:270).
    t0 = time.perf_counter()
    clips_dir = os.path.join(out, "clips_i3d")
    from stdd_tpu.data import preprocess as pp

    pp.main(["--video_root", train_root, "--out_dir", clips_dir,
             "--det_conf", "0.25", "--track_thresh", "0.35",
             "--crop_size", str(cfg["crop"]),
             "--clip_length", str(cfg["clip_size"]), "--clip_step", "4",
             "--landmarker", "none"])
    dual_dir_clips = os.path.join(out, "clips_dual")
    if dual:
        pp.main(["--video_root", train_root, "--out_dir", dual_dir_clips,
                 "--det_conf", "0.25", "--track_thresh", "0.35",
                 "--crop_size", str(cfg["crop"]),
                 "--landmarker", "dense", "--au_ckpt", "random", "--features"])
    wall["preprocess"] = round(time.perf_counter() - t0, 1)

    # -- 3. train (AltFreezing CLI) -----------------------------------------
    t0 = time.perf_counter()
    ckpt_dir = os.path.join(out, "ckpt")
    from stdd_tpu.train import run_i3d

    # val floor: run_i3d refuses a silent val=0 carve; at the 1-pair toy
    # scale there is no video group to hold out, so validation is
    # explicitly disabled instead (best-ckpt selection degenerates to
    # last-epoch there, which the smoke test only uses for plumbing)
    val_ratio = "0.15" if cfg["train_pairs"] >= 2 else "0"
    # --resume: a capstone retry after a relay outage continues from the
    # last epoch checkpoint instead of restarting training (no-op on a
    # fresh tree) — the same idempotent-resume story as the preprocess
    # phase (preprocessing_parallel.py:594 skip semantics)
    run_i3d.main(["--data", clips_dir, "--out", ckpt_dir,
                  "--clip_size", str(cfg["clip_size"]),
                  "--crop_size", str(cfg["crop"]),
                  "--batch", str(cfg["batch"]),
                  "--epochs", str(cfg["epochs"]),
                  "--base_lr", "0.02", "--warmup_epochs", "1",
                  "--val_ratio", val_ratio, "--resume",
                  "--precise_bn_batches", str(cfg["precise_bn"])])
    wall["train"] = round(time.perf_counter() - t0, 1)

    from stdd_tpu.utils.checkpoint import find_last

    last = find_last(ckpt_dir, "i3d")
    assert last, "training produced no checkpoint"
    epoch, ckpt_path = last
    # serve the checkpoint VALIDATION chose (run_i3d's best.json pointer,
    # the dualrun best.pt semantics) — the last epoch of a short schedule
    # can sit well below the best-val epoch
    best_meta = os.path.join(ckpt_dir, "best.json")
    if os.path.exists(best_meta):
        with open(best_meta) as f:
            best = json.load(f)
        cand = os.path.join(ckpt_dir, best["best_ckpt"])
        if os.path.exists(cand):
            epoch, ckpt_path = best["best_epoch"] + 1, cand

    # -- 4. evaluate held-out videos (streaming harness CLI) ----------------
    t0 = time.perf_counter()
    results_dir = os.path.join(out, "results")
    from stdd_tpu.eval import harness

    harness.main(["--video_root", eval_root, "--out_dir", results_dir,
                  "--jax_ckpt", ckpt_path, "--model_crop", str(cfg["crop"]),
                  "--clip_size", str(cfg["clip_size"]),
                  "--stride", str(cfg["stride"]),
                  "--batch_clips", str(cfg["batch_clips"]),
                  "--crop_buffer", str(cfg["crop_buffer"]),
                  "--det_conf", "0.25", "--track_thresh", "0.35",
                  "--min_det_side", "10", "--threshold", "0.5",
                  "--no_quality"])
    wall["eval"] = round(time.perf_counter() - t0, 1)

    with open(os.path.join(results_dir, "summary.csv")) as f:
        summary = next(iter(csv.DictReader(f)))

    result = {
        "metric": "synth_e2e",
        "smoke_cpu": bool(args.smoke),
        "config": {k: cfg[k] for k in ("frames", "train_pairs", "eval_pairs",
                                       "crop", "clip_size", "epochs")},
        "train_ckpt_epoch": epoch,
        "eval_videos": int(summary["videos"]),
        "video_auc": float(summary["auc_roc"]),
        "video_acc_thr0.5": float(summary["accuracy"]),
        "mean_fps": float(summary["mean_fps"]),
        "phase_wall_s": wall,
    }
    # the sentinel runs where the dense landmarker runs: the dual tree
    result.update(lm_sentinel_stats(dual_dir_clips if dual else clips_dir))

    # -- 5. (optional) second detector family: dual-encoder over the
    #       landmark/AU feature sequences the preprocess phase wrote --------
    if dual:
        t0 = time.perf_counter()
        dual_dir = os.path.join(out, "dual")
        try:
            import glob

            from stdd_tpu.data.splits import save_split
            from stdd_tpu.train import run_dual

            # held-out test = the SAME eval videos the harness scored
            # (disjoint identities), preprocessed with features
            clips_eval = os.path.join(out, "clips_eval")
            pp.main(["--video_root", eval_root, "--out_dir", clips_eval,
                     "--det_conf", "0.25", "--track_thresh", "0.35",
                     "--crop_size", str(cfg["crop"]),
                     "--landmarker", "dense", "--au_ckpt", "random",
                     "--features"])
            tr = sorted(glob.glob(os.path.join(
                dual_dir_clips, "**", "track_*", "clip_*"), recursive=True))
            te = sorted(glob.glob(os.path.join(
                clips_eval, "**", "track_*", "clip_*"), recursive=True))
            if cfg["train_pairs"] >= 2:
                # video-grouped val: hold out the last rendered pair (both
                # the real and its scrambled fake) — no same-video leakage
                vtok = f"vid_{cfg['train_pairs'] - 1:03d}"
                val = [d for d in tr if vtok in d]
                train = [d for d in tr if vtok not in d]
            else:  # toy scale: clip-level carve (run_dual would do the same)
                k = max(1, len(tr) // 5)
                train, val = tr[:-k], tr[-k:]
            split_path = os.path.join(out, "dual_split.json")
            save_split({"train": train, "val": val, "test": te}, split_path)

            run_dual.main(["--data", dual_dir_clips, "--split", split_path,
                           "--out", dual_dir,
                           "--T", "8", "--epochs", str(cfg["dual_epochs"]),
                           "--batch", str(cfg["dual_batch"]),
                           "--epoch_samples", str(cfg["dual_samples"]),
                           "--no-dat", "--patience", "6"])
            with open(os.path.join(dual_dir, "report_median.json")) as f:
                rep = json.load(f)
            result["dual_video_auc"] = rep["video_metrics"]["auc_roc"]
            result["dual_clip_auc"] = rep["clip_metrics"]["auc_roc"]
        except Exception as e:  # never lose the phase-1..4 result
            import traceback

            traceback.print_exc(file=sys.stderr)
            result["dual_error"] = f"{type(e).__name__}: {e}"
        wall["dual"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
