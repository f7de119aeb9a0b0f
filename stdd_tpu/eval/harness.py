"""Offline streaming-evaluation harness (the reference's TEST2.py, rebuilt).

Runs the streaming engine over a directory (or list file) of videos and
writes the same two CSV artifacts the reference's harness produces
(schemas at TEST2.py:1071-1141):

- per_video.csv: one row per video with verdict, score, throughput, latency,
  track stats, memory
- summary.csv: accuracy / ROC-AUC / PR-AUC / F1 / confusion matrix +
  mean fps / latency / model size

Usage:
    python -m stdd_tpu.eval.harness --video_root DIR --ckpt CKPT.pth \
        --out_dir eval_outputs [--pool_method mean --threshold 0.4 ...]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import math
import os
import random
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Path-token labeling identical to the reference (demo.py:93-103)
REAL_TOK = ("/original/", "/original_sequences/", "/celeb-real/", "/youtube-real/", "/real/", "/source/")
FAKE_TOK = ("/target/", "/manipulated_sequences/", "/deepfakes/", "/face2face/",
            "/faceswap/", "/neuraltextures/", "/fake/", "/celeb-synthesis/")
DATASETS_HINT = ("ffpp", "ffiw", "celebdf_v2", "faceforensics++", "faceforensics", "celebdf")
SUBSETS_HINT = ("train", "val", "test", "c23", "c40")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv")


def classify_path(p: str) -> Optional[int]:
    pl = "/" + p.replace("\\", "/").lower().strip("/") + "/"
    if any(t in pl for t in REAL_TOK):
        return 0
    if any(t in pl for t in FAKE_TOK):
        return 1
    return None


def dataset_of(p: str) -> str:
    pl = p.replace("\\", "/").lower()
    for s in DATASETS_HINT:
        if s in pl:
            return s
    if any(x in pl for x in ("deepfakes", "face2face", "faceswap", "neuraltextures",
                             "original", "original_sequences")):
        return "ffpp"
    return "unknown"


def subset_of(p: str) -> str:
    pl = p.replace("\\", "/").lower()
    for s in SUBSETS_HINT:
        if f"/{s}/" in pl or pl.endswith(f"/{s}"):
            return s
    return "unknown"


def collect_videos(
    root: str, per_class: int = 500, seed: int = 0
) -> List[Tuple[str, int, str, str]]:
    """(path, label, dataset, subset) tuples, balanced per class
    (demo.py:90 collect_videos)."""
    pool_real, pool_fake = [], []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.lower().endswith(VIDEO_EXTS):
                continue
            p = os.path.join(dirpath, fn)
            lab = classify_path(p)
            if lab == 0:
                pool_real.append(p)
            elif lab == 1:
                pool_fake.append(p)
    rng = random.Random(seed)
    rng.shuffle(pool_real)
    rng.shuffle(pool_fake)
    out = [
        (p, 0, dataset_of(p), subset_of(p)) for p in pool_real[:per_class]
    ] + [(p, 1, dataset_of(p), subset_of(p)) for p in pool_fake[:per_class]]
    rng.shuffle(out)
    return out


def collect_from_list(list_path: str) -> List[Tuple[str, int, str, str]]:
    """'path[,label]' per line; label inferred from path when absent
    (TEST2.py:923-949)."""
    out = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "," in line:
                p, lab = line.rsplit(",", 1)
                lab = int(lab)
            else:
                p = line
                lab = classify_path(p)
                if lab is None:
                    continue
            out.append((p, lab, dataset_of(p), subset_of(p)))
    return out


def iter_video_frames(path: str, max_frames: Optional[int] = None):
    """BGR frame generator over a video file (cv2 host decode)."""
    import cv2

    cap = cv2.VideoCapture(path)
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame
            n += 1
            if max_frames is not None and n >= max_frames:
                break
    finally:
        cap.release()


def device_mem_peak_mb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**20
    except Exception:
        return float("nan")


def run_video(engine, video_path: str, threshold: float, max_frames=None, **agg) -> Dict:
    """Stream one video through the engine; mirrors VideoRunner.run outputs."""
    engine.reset()
    t0 = time.perf_counter()
    frames = 0
    for frame in iter_video_frames(video_path, max_frames):
        engine.step(frame)
        frames += 1
    verdict = engine.finish(threshold=threshold, **agg)
    elapsed = time.perf_counter() - t0
    lat_ms = (
        1000.0 * float(np.mean(engine.clip_latencies))
        if engine.clip_latencies
        else float("nan")
    )
    return {
        "video_path": video_path,
        "frames_processed": frames,
        "elapsed_s": elapsed,
        "fps": frames / max(elapsed, 1e-6),
        "latency_ms_clip_mean": lat_ms,
        "num_tracks": len(engine.track_clip_scores),
        "id_switch_rate": 1000.0 * engine.id_switches / max(frames, 1),
        "pred_label": int(verdict.video_fake),
        "video_score": float(verdict.video_score),
        "per_person_labels": verdict.per_person_labels,
        "low_quality": verdict.low_quality,
    }


def summarize(rows: List[Dict], model_size: int) -> Dict:
    from sklearn.metrics import (
        accuracy_score,
        average_precision_score,
        confusion_matrix,
        f1_score,
        roc_auc_score,
    )

    y_true = [r["gt_label"] for r in rows]
    y_pred = [r["pred_label"] for r in rows]
    y_score = [r["video_score"] for r in rows]
    if y_true and len(set(y_true)) > 1:
        auc = roc_auc_score(y_true, y_score)
        ap = average_precision_score(y_true, y_score)
    else:
        auc = ap = float("nan")
    acc = accuracy_score(y_true, y_pred) if y_true else float("nan")
    f1 = f1_score(y_true, y_pred) if y_true else float("nan")
    cm = confusion_matrix(y_true, y_pred, labels=[0, 1]) if y_true else np.zeros((2, 2))
    tn, fp, fn, tp = cm.ravel() if cm.size == 4 else (0, 0, 0, 0)
    return {
        "videos": len(rows),
        "accuracy": acc,
        "auc_roc": auc,
        "pr_auc": ap,
        "f1": f1,
        "tp": int(tp),
        "tn": int(tn),
        "fp": int(fp),
        "fn": int(fn),
        "confusion_matrix": cm.tolist(),
        # cold rows (first video of an unwarmed run) contain XLA compile
        # time — exclude them from the throughput summary so --no_warmup
        # runs don't report a contaminated mean (VERDICT r1 #10)
        "mean_fps": float(np.nanmean(
            [r["fps"] for r in rows if not r.get("cold_start")]
        )) if any(not r.get("cold_start") for r in rows) else float("nan"),
        "mean_latency_ms_clip": float(np.nanmean(
            [r["latency_ms_clip_mean"] for r in rows if not r.get("cold_start")]
        )) if any(not r.get("cold_start") for r in rows) else float("nan"),
        "model_size": model_size,
    }


PER_VIDEO_HEADER = [
    "video_path", "dataset", "subset", "gt_label", "pred_label", "correct",
    "video_score", "threshold",
    "frames_processed", "elapsed_s", "fps", "latency_ms_clip_mean",
    "num_tracks", "id_switch_rate_per_1k_frames",
    "device_mem_peak_mb", "cpu_mem_peak_mb", "model_size", "cold_start",
]

SUMMARY_HEADER = [
    "videos", "accuracy", "auc_roc", "pr_auc", "f1",
    "tp", "tn", "fp", "fn", "confusion_matrix", "mean_fps",
    "mean_latency_ms_clip", "model_size",
]


def write_csvs(rows: List[Dict], summary: Dict, out_dir: str, threshold: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "per_video.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(PER_VIDEO_HEADER)
        for r in rows:
            w.writerow([
                r["video_path"], r["dataset"], r["subset"], r["gt_label"],
                r["pred_label"], int(r["pred_label"] == r["gt_label"]),
                f"{r['video_score']:.6f}", threshold,
                r["frames_processed"], f"{r['elapsed_s']:.3f}",
                f"{r['fps']:.3f}", f"{r['latency_ms_clip_mean']:.3f}",
                r["num_tracks"], f"{r.get('id_switch_rate', 0.0):.3f}",
                f"{r.get('device_mem_peak_mb', float('nan')):.1f}",
                f"{r.get('cpu_mem_peak_mb', float('nan')):.1f}",
                r.get("model_size", 0),
                int(bool(r.get("cold_start"))),
            ])
    with open(os.path.join(out_dir, "summary.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(SUMMARY_HEADER)
        w.writerow([
            summary["videos"],
            f"{summary['accuracy']:.6f}" if not math.isnan(summary["accuracy"]) else "nan",
            f"{summary['auc_roc']:.6f}" if not math.isnan(summary["auc_roc"]) else "nan",
            f"{summary['pr_auc']:.6f}" if not math.isnan(summary["pr_auc"]) else "nan",
            f"{summary['f1']:.6f}" if not math.isnan(summary["f1"]) else "nan",
            summary["tp"], summary["tn"], summary["fp"], summary["fn"],
            json.dumps(summary["confusion_matrix"]),
            f"{summary['mean_fps']:.3f}",
            f"{summary['mean_latency_ms_clip']:.3f}",
            summary["model_size"],
        ])


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from ..config import PipelineConfig
    from ..models.yunet import YuNetTPU
    from ..runtime.classifier import ClipScorer
    from ..runtime.engine import StreamingEngine

    cfg = PipelineConfig(
        clip_size=args.clip_size,
        stride=args.stride,
        detect_every=args.detect_every,
        batch_clips=args.batch_clips,
        threshold=args.threshold,
        pool_method=args.pool_method,
        min_face_side=args.min_det_side,
        crop_scale=args.crop_scale,
    )
    kw = dict(upload_format=getattr(args, "upload_format", "rgb"),
              int8=getattr(args, "int8", False))
    jax_ckpt = getattr(args, "jax_ckpt", None)
    if args.ckpt and jax_ckpt:
        raise SystemExit("--ckpt and --jax_ckpt are mutually exclusive")
    if args.ckpt:
        scorer = ClipScorer.from_torch_checkpoint(args.ckpt, **kw)
    elif jax_ckpt:
        # weights trained by stdd_tpu.train.run_i3d (msgpack pytree);
        # geometry: --model_crop wins, else the sidecar metadata (cfg=None),
        # else the legacy 224 default (ADVICE r4 #2)
        from ..config import I3DConfig

        model_crop = getattr(args, "model_crop", None)
        mcfg = None
        if model_crop:
            mcfg = I3DConfig(num_frames=args.clip_size, crop_size=model_crop)
        elif not os.path.exists(jax_ckpt + ".json"):
            mcfg = I3DConfig(num_frames=args.clip_size)
        scorer = ClipScorer.from_jax_checkpoint(jax_ckpt, cfg=mcfg, **kw)
    else:
        scorer = ClipScorer.random_init(**kw)

    detector = YuNetTPU(
        model_path=args.yunet_model,
        conf_threshold=args.det_conf,
        top_k=args.det_topk,
    )

    def detect_fn(frame_bgr):
        from ..models.yunet import detect_scaled

        return detect_scaled(detector, frame_bgr, args.det_size)

    qkw = {}
    if not getattr(args, "quality", True):
        # disable the blur/size quality gate — e.g. rendered or synthetic
        # scenes whose Laplacian statistics differ from camera footage
        qkw = dict(q_weighting=False, q_lap_hard=0.0)
    track_thresh = getattr(args, "track_thresh", None)
    if track_thresh is not None:
        qkw["track_kwargs"] = dict(track_thresh=track_thresh,
                                   match_thresh=0.8, track_buffer=30,
                                   split_low_scores=False)
    engine = StreamingEngine(
        scorer, detect_fn, cfg=cfg, crop_buffer=args.crop_buffer,
        start_conf=args.det_conf, **qkw,
    )
    warmed = getattr(args, "warmup", True) and jax.devices()[0].platform != "cpu"
    if warmed:
        # pre-compile every batch capacity so the first video's fps is not
        # an XLA compile measurement
        engine.warmup()
    return engine, warmed


def main(argv=None):
    from ..utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video_root", default=None)
    ap.add_argument("--video_list", default=None)
    ap.add_argument("--out_dir", default="eval_outputs")
    ap.add_argument("--ckpt", default=None, help="reference .pth checkpoint (converted on load)")
    ap.add_argument("--jax_ckpt", default=None,
                    help="msgpack checkpoint trained by stdd_tpu.train.run_i3d")
    ap.add_argument("--model_crop", type=int, default=None,
                    help="crop size the --jax_ckpt was trained at (default: "
                         "the checkpoint's sidecar metadata, else 224)")
    ap.add_argument("--yunet_model",
                    default="/root/reference/preprocessing/yunet/face_detection_yunet_2023mar.onnx")
    ap.add_argument("--per_class", type=int, default=500)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--clip_size", type=int, default=32)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--detect_every", type=int, default=4)
    ap.add_argument("--batch_clips", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--pool_method", default="mean")
    ap.add_argument("--crop_scale", type=float, default=0.5)
    ap.add_argument("--crop_buffer", type=int, default=256)
    ap.add_argument("--det_conf", type=float, default=0.6)
    ap.add_argument("--det_size", type=int, default=320)
    ap.add_argument("--det_topk", type=int, default=64)
    ap.add_argument("--min_det_side", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--upload_format", default="rgb", choices=["rgb", "yuv420"],
                    help="crop upload format; yuv420 halves host->device bytes")
    ap.add_argument("--int8", action="store_true",
                    help="int8 dynamic-quant convs for the wide I3D stages "
                         "(s3-s5); scores shift by the quantization error")
    ap.add_argument("--no_warmup", dest="warmup", action="store_false",
                    help="skip the startup pre-compile of scorer batch shapes")
    ap.add_argument("--no_quality", dest="quality", action="store_false",
                    help="disable blur/size quality gating (synthetic scenes)")
    ap.add_argument("--track_thresh", type=float, default=None,
                    help="override ByteTrack high-score threshold")
    args = ap.parse_args(argv)

    if args.video_list:
        videos = collect_from_list(args.video_list)
    elif args.video_root:
        videos = collect_videos(args.video_root, args.per_class, args.seed)
    else:
        ap.error("need --video_root or --video_list")

    engine, warmed = build_engine(args)
    model_size = os.path.getsize(args.ckpt) if args.ckpt else 0

    rows = []
    for vpath, gt, dset, subset in videos:
        res = run_video(engine, vpath, args.threshold, args.max_frames)
        res.update(
            gt_label=gt, dataset=dset, subset=subset,
            device_mem_peak_mb=device_mem_peak_mb(), model_size=model_size,
            # without warmup the first video's timings include the XLA
            # compiles; flag the row so summaries/readers can exclude it
            cold_start=(not warmed) and len(rows) == 0,
        )
        rows.append(res)
        print(
            f"[{len(rows)}/{len(videos)}] {os.path.basename(vpath)} gt={gt} "
            f"pred={res['pred_label']} score={res['video_score']:.4f} "
            f"fps={res['fps']:.1f}"
        )

    engine.close()   # release ring-uploader/detector worker threads
    summary = summarize(rows, model_size)
    write_csvs(rows, summary, args.out_dir, args.threshold)
    print("Summary:", {k: summary[k] for k in ("videos", "accuracy", "auc_roc", "mean_fps")})


if __name__ == "__main__":
    main()
