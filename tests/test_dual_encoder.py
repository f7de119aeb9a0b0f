"""Dual-encoder parity tests vs the reference torch implementation."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stdd_tpu.models.dual_encoder import (
    DualEncoderAU_LMK,
    LMKDisc,
    grad_reverse,
    lengths_to_mask,
    sinusoidal_pe,
)
from stdd_tpu.utils.torch_convert import dual_torch_to_flax

REF = "/root/reference/dualrun"


def _ref_model(**kw):
    torch = pytest.importorskip("torch")
    from tests.oracles.ref_i3d import use_reference_root

    use_reference_root(REF)
    from model.dual_encoder import DualEncoderAU_LMK as RefDual

    torch.manual_seed(0)
    m = RefDual(**kw)
    m.eval()
    return m


@pytest.mark.parametrize("masked", [False, True])
def test_forward_parity(masked):
    torch = pytest.importorskip("torch")
    au_dim, lmk_dim, d, T, B = 36, 132, 64, 8, 4
    ref = _ref_model(au_dim=au_dim, lmk_dim=lmk_dim, d_model=d, depth=2, heads=4,
                     use_dat=True, domain_classes=5, pool_tau=1.0)
    variables = dual_torch_to_flax(ref.state_dict(), heads=4)

    rng = np.random.RandomState(0)
    A = rng.randn(B, T, au_dim).astype(np.float32)
    L = rng.randn(B, T, lmk_dim).astype(np.float32)
    lengths = np.array([T, T - 2, 3, 1]) if masked else None

    with torch.no_grad():
        kw = dict(need_aux=True, return_z=True, return_seq=True)
        if masked:
            kw["lengths"] = torch.from_numpy(lengths)
        ref_out = ref(torch.from_numpy(A), torch.from_numpy(L), **kw)

    model = DualEncoderAU_LMK(au_dim=au_dim, lmk_dim=lmk_dim, d_model=d, depth=2,
                              heads=4, use_dat=True, domain_classes=5, pool_tau=1.0)
    out = model.apply(
        variables, jnp.asarray(A), jnp.asarray(L),
        lengths=jnp.asarray(lengths) if masked else None,
        need_aux=True, return_z=True, return_seq=True,
    )

    np.testing.assert_allclose(
        np.asarray(out["bin_logits"]), ref_out["bin_logits"].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["z"]), ref_out["z"].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["au_pred"]), ref_out["au_pred"].numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["weights"]["au"]), ref_out["weights"]["au"].numpy(),
        rtol=1e-3, atol=1e-5,
    )


def test_grad_reverse():
    def loss(x):
        return jnp.sum(grad_reverse(x, 0.5) ** 2)

    x = jnp.ones((3,))
    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2 * np.ones(3), rtol=1e-6)


def test_lengths_to_mask_variants():
    m = lengths_to_mask(jnp.asarray([3, 1]), 4)
    assert m.tolist() == [[False, False, False, True], [False, True, True, True]]
    # empty rows keep token 0 valid in BOTH input forms — the reference's
    # lengths.clamp_min(1) (dual_encoder.py:48), shared by every consumer
    m0 = lengths_to_mask(jnp.asarray([2, 0]), 3)
    assert m0.tolist() == [[False, False, True], [False, True, True]]
    m2 = lengths_to_mask(jnp.asarray([[1, 1, 0], [0, 0, 0]]), 3)
    assert m2.tolist() == [[False, False, True], [False, True, True]]


def test_all_pad_unlock():
    model = DualEncoderAU_LMK(au_dim=4, lmk_dim=6, d_model=32, depth=1, heads=2)
    A = jnp.zeros((2, 5, 4))
    L = jnp.zeros((2, 5, 6))
    v = model.init(jax.random.PRNGKey(0), A, L, lengths=jnp.asarray([5, 0]))
    out = model.apply(v, A, L, lengths=jnp.asarray([5, 0]))
    assert np.isfinite(np.asarray(out["bin_logits"])).all()


def test_lmk_disc_shapes():
    m = LMKDisc(lmk_dim=132, d_model=64, depth=2, heads=4)
    L = jnp.zeros((3, 16, 132))
    v = m.init(jax.random.PRNGKey(0), L)
    out = m.apply(v, L)
    assert out.shape == (3,)
