"""END-TO-END score parity: the full demo pipeline (tracking → crop → align →
I3D → sigmoid → video score) computed by REFERENCE components (torch model,
FasterCropAlignXRay, greedy tracking) vs this repo's pipeline with converted
weights — on the repo's real cached detections. This is the BASELINE.md
'probability parity with demo.py within float tolerance' check, using random
weights since the reference ships no trained I3D checkpoint."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.eval.demo import build_clips, eval_video, load_reference_cache
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.utils.torch_convert import i3d_torch_to_flax

REF = "/root/reference/altfreezing"
FIXTURE = REF + "/examples/shining.mp4_32_retina_320.pth"

CLIP = 8          # small clip for CPU runtime; same path as 32
IMSIZE = 128  # multiple of 64 so the torch head pool covers the whole map


@pytest.mark.slow
def test_full_demo_pipeline_score_parity():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tests.oracles.ref_i3d import build_reference_i3d

    from test_tools.faster_crop_align_xray import FasterCropAlignXRay
    from test_tools.utils import get_crop_box as ref_get_crop_box

    # real detections + landmarks from the repo's example video, synthetic
    # frame pixels (deterministic)
    detect_res, lm68s = load_reference_cache(FIXTURE)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (480, 854, 3), np.uint8)
              for _ in range(len(detect_res))]

    # ---- REFERENCE side: demo.py:213-339 flow with reference components ----
    ref_model = build_reference_i3d(num_frames=CLIP, crop_size=IMSIZE, seed=0)
    crop_align = FasterCropAlignXRay(IMSIZE)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)[None, :, None, None, None] * 255
    std = np.asarray([0.229, 0.224, 0.225], np.float32)[None, :, None, None, None] * 255

    clips = build_clips(detect_res, lm68s, frames, clip_size=CLIP)
    assert len(clips) >= 20
    ref_preds = []
    with torch.no_grad():
        for entries in clips[:6]:  # subset for CPU runtime
            infos, images = [], []
            for e in entries:
                big_box = ref_get_crop_box(
                    frames[0].shape[:2],
                    np.concatenate([e["big_box"][:2] * 0, e["big_box"]])[-4:],
                    scale=0.0,
                )
                # entries already carry crop-local lm5/lm68 + big_box
                new_box = np.zeros(4, np.float32)
                infos.append((new_box, e["lm5"], e["lm68"], e["big_box"]))
                images.append(e["crop"])
            _, aligned = crop_align(infos, images)
            x = torch.from_numpy(
                aligned.astype(np.float32).transpose(3, 0, 1, 2)[None]
            )
            x = (x - torch.from_numpy(mean)) / torch.from_numpy(std)
            out = ref_model([x])
            ref_preds.append(float(torch.sigmoid(out).item()))

    # ---- OUR side: converted weights, fused device pipeline ---------------
    variables = i3d_torch_to_flax(ref_model.state_dict())
    scorer = ClipScorer(
        variables,
        cfg=I3DConfig(num_frames=CLIP, crop_size=IMSIZE),
        dtype=jnp.float32,
        round_aligned_u8=True,   # match cv2.warpAffine's uint8 output
    )
    res = eval_video(
        scorer, frames, detect_res=detect_res, lm68s=lm68s,
        clip_size=CLIP, crop_buffer=512, batch=3,   # no crop downscaling
    )
    ours = res["preds"][:6]

    np.testing.assert_allclose(ours, ref_preds, atol=2e-3)
    # video-level score over the same subset
    assert abs(np.mean(ours) - np.mean(ref_preds)) < 1e-3
