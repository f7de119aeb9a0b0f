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
