"""Logger, meters, tracking shim, LaTeX tables, landmark net."""

import json
import os

import numpy as np
import pytest


def test_logger_and_json_stats(tmp_path, capsys):
    from stdd_tpu.utils.logging import get_logger, log_json_stats, set_logger_dir

    log = get_logger()
    path = set_logger_dir(str(tmp_path))
    log.info("hello")
    log_json_stats({"loss": 1.5, "epoch": 2})
    with open(path) as f:
        content = f.read()
    assert "hello" in content
    assert "json_stats" in content and '"loss": 1.5' in content


def test_meters():
    from stdd_tpu.utils.meters import ScalarMeter, TrainMeter, ValMeter

    m = ScalarMeter(window_size=3)
    for v in [1, 2, 3, 4]:
        m.add_value(v)
    assert m.get_win_median() == 3 and m.get_global_avg() == 2.5

    tm = TrainMeter(epoch_iters=4, max_epoch=2, log_period=2)
    tm.iter_tic()
    tm.iter_toc()
    tm.update_stats(loss=0.5, lr=0.1, mb_size=8, acc=0.9)
    assert tm.log_iter_stats(0, 0) is None          # not at log period
    tm.update_stats(loss=0.4, lr=0.1, mb_size=8, acc=0.95)
    stats = tm.log_iter_stats(0, 1)
    assert stats is not None and "eta" in stats
    epoch = tm.log_epoch_stats(0)
    assert epoch["samples"] == 16

    vm = ValMeter()
    assert vm.update(0.8, 1) and not vm.update(0.7, 2) and vm.best_epoch == 1


def test_tracker_jsonl(tmp_path):
    from stdd_tpu.utils.tracking import RunTracker

    t = RunTracker("proj", name="run1", config={"lr": 1e-3},
                   out_dir=str(tmp_path), use_wandb=False)
    t.log({"loss": 0.5}, step=1)
    t.log_table("scores", ["video", "score"], [["a.mp4", 0.9]])
    t.finish()
    events = [json.loads(l) for l in open(os.path.join(t.dir, "events.jsonl"))]
    assert events[0]["loss"] == 0.5 and events[0]["_step"] == 1
    assert os.path.exists(os.path.join(t.dir, "scores.csv"))
    assert json.load(open(os.path.join(t.dir, "config.json")))["lr"] == 1e-3


def test_latex_tables(tmp_path):
    from stdd_tpu.eval.tables import generate_tables

    rep = {
        "clip_metrics": {"auc_roc": 0.91, "accuracy": 0.85},
        "video_metrics": {"auc_roc": 0.95, "accuracy": 0.9},
        "per_tech_video_accuracy": {"deepfakes": {"accuracy": 0.92, "videos": 10}},
    }
    d = tmp_path / "test7"
    d.mkdir()
    with open(d / "report_median.json", "w") as f:
        json.dump(rep, f)
    tex = generate_tables(str(tmp_path / "*" / "report_*.json"),
                          out_path=str(tmp_path / "tables.tex"))
    assert r"\begin{tabular}" in tex and "0.950" in tex and "deepfakes" in tex
    assert (tmp_path / "tables.tex").exists()


def test_landmark_predictor_geometry():
    from stdd_tpu.models.landmark_net import prepare_feed, reproject

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (240, 320, 3), np.uint8)
    feed, cb = prepare_feed(img, [50, 60, 150, 180])
    assert feed.shape == (224, 224, 3)
    x1, y1, x2, y2 = cb
    assert (x2 - x1) == (y2 - y1)  # square crop
    # reproject roundtrip: normalized corners land on the crop box
    lm = np.array([[0.0, 0.0], [1.0, 1.0]])
    back = reproject(cb, lm)
    np.testing.assert_allclose(back[0], [x1, y1])
    np.testing.assert_allclose(back[1], [x2, y2])


def test_video_io_helpers(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from stdd_tpu.utils.video_io import (
        get_clips_uniform,
        get_valid_faces,
        grab_all_frames,
        sample_chunks,
        scale_detect,
        weak_check,
    )

    p = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(20):
        vw.write(np.full((48, 64, 3), i * 10 % 255, np.uint8))
    vw.release()

    frames = grab_all_frames(p, max_size=10)
    assert len(frames) == 10
    assert sample_chunks(list(range(10)), 4, 3) == [
        list(range(0, 4)), list(range(3, 7)), list(range(6, 10))]
    clips = get_clips_uniform(p, count=3, clip_size=5)
    assert len(clips) == 3 and all(len(c) == 5 for c in clips)

    faces = [[(np.array([1, 2, 10, 12]), np.ones((5, 2)) * 5, 0.9)], []]
    assert not weak_check(faces)
    valid = get_valid_faces(faces, w=20, h=20, scale=1.0)
    assert len(valid[0]) == 1
    # out-of-frame after scaling → dropped
    valid2 = get_valid_faces(faces, w=15, h=15, scale=2.0)
    assert len(valid2[0]) == 0

    def fake_det(frames_small):
        h, w = frames_small[0].shape[:2]
        return [[(np.array([1.0, 1.0, w / 2, h / 2]), np.ones((5, 2)) * 2, 0.9)]
                for _ in frames_small]

    res = scale_detect(fake_det, [np.zeros((2400, 3840, 3), np.uint8)])
    (box, lm, score), = res[0]
    assert box[2] > 900  # rescaled back to ~frame coords


def test_sub_to_normal_bn():
    import torch

    from stdd_tpu.utils.torch_convert import sub_to_normal_bn

    sd = {
        "s1.bn.bn.running_mean": torch.ones(4),
        "s1.bn.bn.running_var": torch.ones(4),
        "s1.bn.split_bn.num_batches_tracked": torch.tensor(1),
        "s1.bn.weight": torch.ones(4, 1, 1, 1),
        "s1.bn.bias": torch.zeros(4),
        "s1.conv.weight": torch.ones(4, 3, 1, 1, 1),
    }
    out = sub_to_normal_bn(sd)
    assert "s1.bn.running_mean" in out and "s1.bn.bn.running_mean" not in out
    assert not any(".split_bn." in k for k in out)
    assert out["s1.bn.weight"].shape == (4,)
    assert out["s1.conv.weight"].shape == (4, 3, 1, 1, 1)


def test_topks_correct_matches_reference():
    """Oracle parity with slowfast/utils/metrics.py topks_correct /
    topk_accuracies / topk_errors."""
    import importlib.util
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")

    from stdd_tpu.train.metrics import topk_accuracies, topk_errors, topks_correct

    def ref_topks_correct(preds, labels, ks):
        # reference slowfast/utils/metrics.py:9 verbatim, except .view ->
        # .reshape: the original crashes on modern torch (view of the
        # non-contiguous .t() result)
        _v, top_max_k_inds = torch.topk(preds, max(ks), dim=1, largest=True,
                                        sorted=True)
        top_max_k_inds = top_max_k_inds.t()
        rep = labels.view(1, -1).expand_as(top_max_k_inds)
        correct = top_max_k_inds.eq(rep)
        return [correct[:k, :].reshape(-1).float().sum() for k in ks]

    rs = np.random.RandomState(0)
    preds = rs.randn(64, 10).astype(np.float32)
    labels = rs.randint(0, 10, (64,))
    ks = [1, 3, 5]
    ours = topks_correct(preds, labels, ks)
    theirs = ref_topks_correct(torch.tensor(preds), torch.tensor(labels), ks)
    assert ours == [float(t) for t in theirs]
    n = preds.shape[0]
    np.testing.assert_allclose(
        topk_accuracies(preds, labels, ks),
        [float(t) / n * 100.0 for t in theirs], rtol=1e-6)
    np.testing.assert_allclose(
        topk_errors(preds, labels, ks),
        [(1.0 - float(t) / n) * 100.0 for t in theirs], rtol=1e-6)
