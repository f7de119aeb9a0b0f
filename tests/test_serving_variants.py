"""Serving-variant cross-product consistency (VERDICT r3 #5).

The serving surface has grown a matrix of knobs — stem layout
{plain, s2d, s2d+t2}, upload format {rgb, yuv420}, compute dtype
{f32, bf16}, int8 dynamic-quant stages {off, on} — each individually
tested, but combinations can interact (e.g. yuv420 reconstruction feeding
the t2 packed stem). This test scores ONE fixed 2-clip batch with the SAME
weights under every combination and pins each cell to the base program
(plain stem, rgb, f32, int8 off) within a stated tolerance envelope:

- stem variants are exact math (models/i3d.py s2d/t2 rewrites): tight;
- bf16 adds compute rounding: documented envelope;
- yuv420 is honest-lossy (4:2:0 chroma subsample of the input pixels,
  tests/test_yuv420.py): documented envelope on smooth content;
- int8 adds the dynamic-quant error (tests/test_int8.py): documented
  envelope.

Reference anchor: the reference serves through exactly one path
(ClassifierSvc.infer_scores, TEST2.py:139-150) — this matrix is where our
variants must collapse back to that one semantic.
"""

import dataclasses
import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.models.i3d import I3D
from stdd_tpu.ops.align import STD_POINTS_256
from stdd_tpu.runtime.classifier import ClipScorer
from stdd_tpu.runtime.engine import _FrameEntry
from stdd_tpu.runtime.packing import pack_clip_batch

T, CROP = 4, 32          # s2d needs even H/W; t2 needs even T
BUF = 48                 # pack buffer (crops below are smaller: scale = 1)

# tolerance envelopes per lossy knob (probability units, random-init model);
# exact-math variants get the base float-reassociation allowance only
BASE_TOL = 2e-3
TOL = {"bf16": 0.05, "yuv420": 0.05, "int8": 0.05}


def _smooth_crops(rng, n, h=40, w=36):
    """Low-frequency content: yuv420's 4:2:0 chroma subsample is honest-lossy,
    and video frames are smooth — random noise would overstate its error."""
    import cv2

    crops = []
    for _ in range(n):
        x = rng.randint(0, 255, (h, w, 3), np.uint8)
        crops.append(cv2.GaussianBlur(x, (11, 11), 4.0))
    return crops


def _batch_inputs(yuv420: bool):
    rng = np.random.RandomState(3)
    clips = []
    for _ in range(2):
        entries = []
        for i, crop in enumerate(_smooth_crops(rng, T)):
            box = np.array([4.0 + i, 3.0, 38.0 + i, 41.0], np.float32)
            lm5 = (STD_POINTS_256 * (28.0 / 256.0)
                   + np.array([5.0, 6.0], np.float32))
            entries.append(_FrameEntry(crop, box, lm5))
        clips.append(entries)
    return pack_clip_batch(clips, 2, T, BUF, yuv420=yuv420)


@pytest.fixture(scope="module")
def weights():
    cfg = I3DConfig(num_frames=T, crop_size=CROP)
    m = I3D(cfg=cfg)
    import jax

    x = jnp.zeros((1, T, CROP, CROP, 3), jnp.float32)
    return m.init(jax.random.PRNGKey(0), x, train=False)


def _make_scorer(weights, stem, fmt, dtype, int8):
    cfg = I3DConfig(num_frames=T, crop_size=CROP)
    sc = ClipScorer(
        weights, cfg=cfg, dtype=dtype,
        s2d_stem=stem in ("s2d", "s2d_t2"),
        upload_format=fmt, int8=int8, use_pallas_warp=False,
    )
    if stem == "s2d":
        # the scorer auto-enables the t2 packed stem whenever s2d is on and
        # T is even; pin the s2d-only cell (the training-path stem) by
        # switching t2 back off before the score program is built
        assert sc.cfg.stem_t2
        sc.cfg = dataclasses.replace(sc.cfg, stem_t2=False)
    elif stem == "plain":
        assert not sc.cfg.s2d_stem
    else:
        assert sc.cfg.s2d_stem and sc.cfg.stem_t2
    return sc


FMTS = ("rgb", "yuv420")
DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}

# Pairwise covering design over (stem, fmt, dtype, int8): every PAIR of
# knob values co-occurs in some cell (a full 24-cell cross is ~24 fresh XLA
# compiles — too slow for CI, and knob interactions are pairwise by
# construction: each knob rewrites a disjoint stage of the program).
# The production serving cell (s2d_t2, yuv420, bf16) is covered explicitly,
# as is its int8 variant's stem/format pairing.
CELLS = [
    ("plain", "yuv420", "bf16", True),
    ("s2d", "rgb", "bf16", True),
    ("s2d", "yuv420", "f32", False),
    ("s2d_t2", "rgb", "f32", True),
    ("s2d_t2", "yuv420", "bf16", False),   # the production serving config
    ("s2d_t2", "yuv420", "bf16", True),
    # exact-math stem rewrites pinned tight against the base program
    ("s2d", "rgb", "f32", False),
    ("s2d_t2", "rgb", "f32", False),
]


def test_serving_variant_pairwise_matrix(weights):
    inputs = {fmt: _batch_inputs(fmt == "yuv420") for fmt in FMTS}

    def score(stem, fmt, dname, int8):
        sc = _make_scorer(weights, stem, fmt, DTYPES[dname], int8)
        crops, boxes, lm5, valid = inputs[fmt]
        return np.asarray(sc.score(crops, boxes, lm5, valid))

    base = score("plain", "rgb", "f32", False)
    assert np.isfinite(base).all() and (0 < base).all() and (base < 1).all()

    report = []
    for stem, fmt, dname, int8 in CELLS:
        p = score(stem, fmt, dname, int8)
        tol = BASE_TOL
        tol += TOL["bf16"] if dname == "bf16" else 0.0
        tol += TOL["yuv420"] if fmt == "yuv420" else 0.0
        tol += TOL["int8"] if int8 else 0.0
        delta = float(np.abs(p - base).max())
        report.append(((stem, fmt, dname, int8), delta, tol))
        assert delta <= tol, (stem, fmt, dname, int8, delta, tol, p, base)

    # the exact-math stem rewrites must agree far inside the base envelope
    exact = [d for (stem, fmt, dname, int8), d, _ in report
             if fmt == "rgb" and dname == "f32" and not int8]
    assert len(exact) == 2 and max(exact) <= BASE_TOL, report

    # pairwise coverage is a property of CELLS — verify it so future edits
    # can't silently drop a pair
    vals = {0: ("plain", "s2d", "s2d_t2"), 1: FMTS,
            2: tuple(DTYPES), 3: (False, True)}
    all_cells = CELLS + [("plain", "rgb", "f32", False)]
    for i, j in itertools.combinations(range(4), 2):
        seen = {(c[i], c[j]) for c in all_cells}
        want = set(itertools.product(vals[i], vals[j]))
        assert seen >= want, (i, j, want - seen)
