"""Visualization demo (reference demoYunet.py visualize + CLI): drawing
semantics and the annotate-a-video CLI end to end on a rendered face."""

import numpy as np

import jax.numpy as jnp

from stdd_tpu.eval.viz import visualize_detections, visualize_tracks


def test_visualize_detections_draws():
    img = np.full((120, 160, 3), 30, np.uint8)
    rows = np.asarray(
        [[20, 20, 60, 70, 30, 40, 60, 40, 45, 55, 35, 70, 55, 70, 0.91]],
        np.float32)
    out = visualize_detections(img, rows, fps=12.3)
    assert out.shape == img.shape
    assert (out != img).any()                      # something was drawn
    assert (img == 30).all()                       # input untouched
    # green box edge present at the box top row
    assert (out[20, 20:80] == (0, 255, 0)).all(axis=-1).any()


def test_visualize_tracks_distinct_colors():
    class T:
        def __init__(self, tid, tlbr):
            self.track_id = tid
            self.tlbr = np.asarray(tlbr, np.float32)

    img = np.zeros((100, 100, 3), np.uint8)
    out = visualize_tracks(img, [T(1, (5, 5, 40, 40)), T(2, (50, 50, 95, 95))],
                           probs={1: 0.73})
    cols = {tuple(out[5, x]) for x in range(5, 41)} - {(0, 0, 0)}
    cols2 = {tuple(out[50, x]) for x in range(50, 96)} - {(0, 0, 0)}
    assert cols and cols2 and not (cols & cols2)   # per-id colors differ


def test_viz_cli_video(tmp_path):
    import cv2

    from stdd_tpu.eval.viz import main
    from stdd_tpu.models.facemesh import render_faces

    face = (np.asarray(render_faces(
        jnp.zeros((1, 4)), jnp.zeros((1, 6)), jnp.zeros((1, 8))))[0]
        * 255).astype(np.uint8)
    frame = np.full((240, 320, 3), 110, np.uint8)
    frame[40:200, 80:240] = cv2.resize(face, (160, 160))
    vid = tmp_path / "in.avi"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (320, 240))
    for _ in range(4):
        vw.write(frame[:, :, ::-1])
    vw.release()

    out = tmp_path / "out.mp4"
    rc = main(["--input", str(vid), "--output", str(out), "--track",
               "--conf", "0.3"])
    assert rc == 0 and out.exists() and out.stat().st_size > 0
