"""Fused s2-bottleneck Pallas kernel: math parity with the XLA path.

The kernel (ops/bottleneck_pallas.py) runs the whole a→b→c→(+res)→relu
bottleneck per VMEM tile with eval-folded BN; these tests pin it (interpret
mode on CPU) against a conv3d oracle and against the unfused ResBlock with
shared variables — same parameter tree, interchangeable checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.config import I3DConfig
from stdd_tpu.ops.bottleneck_pallas import (
    bottleneck_reference, fold_bn, fused_bottleneck,
)


def _rand_params(rng, tk, cin, ci, co, project):
    p = dict(
        wa=rng.randn(tk, cin, ci).astype(np.float32) * 0.1,
        ba=rng.randn(ci).astype(np.float32) * 0.1,
        wb=rng.randn(3, 3, ci, ci).astype(np.float32) * 0.1,
        bb=rng.randn(ci).astype(np.float32) * 0.1,
        wc=rng.randn(ci, co).astype(np.float32) * 0.1,
        bc=rng.randn(co).astype(np.float32) * 0.1,
    )
    if project:
        p["ws"] = rng.randn(cin, co).astype(np.float32) * 0.1
        p["bs"] = rng.randn(co).astype(np.float32) * 0.1
    return p


@pytest.mark.parametrize("tk,project,T,H,tile_t,tile_h", [
    (3, False, 8, 14, 8, 14),      # single tile
    (3, False, 16, 28, 8, 14),     # multi-tile: T and H halos + corners
    (3, True, 16, 28, 8, 14),      # projection shortcut
    (1, False, 8, 28, 4, 14),      # no temporal taps
])
def test_fused_matches_reference(tk, project, T, H, tile_t, tile_h):
    rng = np.random.RandomState(0)
    B, W, cin, ci = 2, 10, 16, 8
    co = 24 if project else cin
    x = rng.randn(B, T, H, W, cin).astype(np.float32)
    p = _rand_params(rng, tk, cin, ci, co, project)
    ref = np.asarray(bottleneck_reference(jnp.asarray(x), **{
        k: jnp.asarray(v) for k, v in p.items()}, tk=tk))
    got = np.asarray(fused_bottleneck(
        jnp.asarray(x), p["wa"], p["ba"], p["wb"], p["bb"], p["wc"], p["bc"],
        p.get("ws"), p.get("bs"), tk=tk, tile_t=tile_t, tile_h=tile_h,
        interpret=True, out_dtype=jnp.float32,
    ))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_fold_bn_math():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 8, 4).astype(np.float32)
    scale = rng.rand(4).astype(np.float32) + 0.5
    bias = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = rng.rand(4).astype(np.float32) + 0.1
    eps = 1e-5
    x = rng.randn(32, 8).astype(np.float32)
    y_conv = x @ w[1]
    y_bn = (y_conv - mean) / np.sqrt(var + eps) * scale + bias
    wf, bf = fold_bn(jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
                     jnp.asarray(mean), jnp.asarray(var), eps)
    np.testing.assert_allclose(x @ np.asarray(wf)[1] + np.asarray(bf), y_bn,
                               atol=1e-5)


def test_resblock_fused_matches_conv_path():
    """Same variables through the fused and conv ResBlock paths (the trees
    are identical by construction) must agree at eval."""
    from stdd_tpu.models.i3d import ResBlock

    kw = dict(dim_in=16, dim_out=16, dim_inner=8, temp_kernel_size=3,
              stride=1, zero_init_final_bn=False, bn_eps=1e-5,
              bn_momentum=0.1, axis_name=None, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 14, 10, 16),
                    jnp.float32)
    plain = ResBlock(fused_eval=False, **kw)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial so folding is actually exercised
    v = jax.tree.map(
        lambda a: a + 0.1 * np.random.RandomState(a.size).rand(*a.shape).astype(a.dtype),
        v)
    y0 = plain.apply(v, x, train=False)
    y1 = ResBlock(fused_eval=True, **kw).apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-4, rtol=5e-4)


def test_resblock_fused_projection_tree_compatible():
    from stdd_tpu.models.i3d import ResBlock

    kw = dict(dim_in=16, dim_out=32, dim_inner=8, temp_kernel_size=3,
              stride=1, zero_init_final_bn=False, bn_eps=1e-5,
              bn_momentum=0.1, axis_name=None, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 14, 10, 16),
                    jnp.float32)
    plain = ResBlock(fused_eval=False, **kw)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    vf = ResBlock(fused_eval=True, **kw).init(jax.random.PRNGKey(0), x,
                                              train=False)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(
        lambda a: a.shape, vf)
    y0 = plain.apply(v, x, train=False)
    y1 = ResBlock(fused_eval=True, **kw).apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-4, rtol=5e-4)


def test_i3d_fused_s2_end_to_end():
    """Full model, fused s2 vs conv s2, shared variables (tree-identical)."""
    import dataclasses

    from stdd_tpu.models.i3d import I3D

    cfg = I3DConfig(num_frames=8, crop_size=64)
    x = jnp.asarray(np.random.RandomState(4).rand(1, 8, 64, 64, 3),
                    jnp.float32)
    m0 = I3D(cfg=cfg)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    m1 = I3D(cfg=dataclasses.replace(cfg, fused_s2=True))
    y0 = np.asarray(m0.apply(v, x, train=False))
    y1 = np.asarray(m1.apply(v, x, train=False))
    np.testing.assert_allclose(y1, y0, atol=2e-3, rtol=2e-3)
