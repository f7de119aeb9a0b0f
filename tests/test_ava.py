"""AVA-style CSV mAP evaluation (eval/ava.py vs hand-computed APs)."""

import os

import numpy as np

from stdd_tpu.eval.ava import (evaluate_ava, evaluate_ava_from_files,
                               read_csv, read_exclusions, read_labelmap,
                               write_results)


def test_perfect_detections_map_1():
    gt_b = {"v,0001": [[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]]}
    gt_l = {"v,0001": [1, 2]}
    res = evaluate_ava(gt_b, gt_l, gt_b, gt_l, {"v,0001": [0.9, 0.8]})
    assert res["mAP"] == 1.0


def test_ap_penalizes_false_positives_and_misses():
    gt_b = {"v,0001": [[0.1, 0.1, 0.5, 0.5]]}
    gt_l = {"v,0001": [1]}
    # one matching det (score .9) + one high-scored FP (.95) for class 1
    det_b = {"v,0001": [[0.1, 0.1, 0.5, 0.5], [0.7, 0.7, 0.9, 0.9]]}
    det_l = {"v,0001": [1, 1]}
    det_s = {"v,0001": [0.9, 0.95]}
    res = evaluate_ava(gt_b, gt_l, det_b, det_l, det_s)
    # FP ranked first: precision at the TP is 1/2 -> AP 0.5
    assert abs(res["mAP"] - 0.5) < 1e-9
    # duplicate detections of one gt: second match counts as FP
    det_b2 = {"v,0001": [[0.1, 0.1, 0.5, 0.5]] * 2}
    det_s2 = {"v,0001": [0.9, 0.8]}
    res2 = evaluate_ava(gt_b, gt_l, det_b2, {"v,0001": [1, 1]}, det_s2)
    assert abs(res2["mAP"] - 1.0) < 1e-9  # TP ranked first -> envelope AP 1


def test_file_round_trip(tmp_path):
    lab = tmp_path / "labelmap.pbtxt"
    lab.write_text('item {\n  name: "walk"\n  id: 1\n}\n'
                   'item {\n  name: "talk"\n  id: 2\n}\n')
    gt = tmp_path / "gt.csv"
    gt.write_text("v1,1,0.1,0.1,0.5,0.5,1\nv1,1,0.6,0.6,0.9,0.9,2\n"
                  "v1,2,0.2,0.2,0.4,0.4,1\n")
    # detections via write_results
    det = tmp_path / "det.csv"
    write_results([
        ("v1", 1, [0.1, 0.1, 0.5, 0.5], 1, 0.9),
        ("v1", 1, [0.6, 0.6, 0.9, 0.9], 2, 0.8),
        ("v1", 2, [0.2, 0.2, 0.4, 0.4], 1, 0.7),
        ("v1", 2, [0.0, 0.0, 0.1, 0.1], 3, 0.99),   # class outside whitelist
    ], str(det))
    res = evaluate_ava_from_files(str(lab), str(gt), str(det))
    assert res["mAP"] == 1.0 and res["AP/walk"] == 1.0 and res["AP/talk"] == 1.0

    # exclusions drop a frame entirely
    exc = tmp_path / "exc.csv"
    exc.write_text("v1,2\n")
    res2 = evaluate_ava_from_files(str(lab), str(gt), str(det), str(exc))
    assert res2["mAP"] == 1.0

    names, wl = read_labelmap(str(lab))
    assert names == {1: "walk", 2: "talk"} and wl == {1, 2}
    assert read_exclusions(str(exc)) == {"v1,0002"}
    b, l, s = read_csv(str(det), wl, load_score=True)
    assert set(b) == {"v1,0001", "v1,0002"} and s["v1,0001"] == [0.9, 0.8]
