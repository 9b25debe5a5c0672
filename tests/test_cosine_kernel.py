"""Pallas cosine-mode-sum kernel vs the XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from gqmap_tpu.kernels.cosine_gq import cos_mode_sums_pallas, cos_node_grads_pallas
from gqmap_tpu.ops.cosine import _mode_sums, cos_node_grads
from gqmap_tpu.ops.gq import NODE

from test_cosine import _rand_sites, _toy_cosdata


def test_mode_sums_match_xla():
    cos = _toy_cosdata(A=20, B=6, M=16, N=24, seed=7)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=24, L=3, seed=8, sig_hi=2.0)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=8, rows=8, interpret=True)
    for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-10, atol=1e-10, err_msg=name
        )


def test_mode_sums_ragged_degree_and_rows():
    # A not a multiple of a_block (zero-padded blocks) and M not a multiple
    # of the requested rows (auto-shrunk tile).
    cos = _toy_cosdata(A=13, B=5, M=12, N=16, seed=9)
    u1, u2, o1, o2, p = _rand_sites(M=12, N=16, L=2, seed=10, sig_hi=1.5)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=4, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=4, rows=8, interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10, atol=1e-10)


def test_node_grads_match_xla():
    cos = _toy_cosdata(A=16, B=4, M=16, N=16, seed=11)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=16, L=3, seed=12, sig_hi=2.0)
    a = jnp.ones((3, 1, 1)) / 3.0
    want = cos_node_grads(cos, u1, u2, o1, o2, p, a, 0.25, NODE)
    got = cos_node_grads_pallas(cos, u1, u2, o1, o2, p, a, 0.25, NODE, interpret=True)
    for g, w, name in zip(got, want, want._fields):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-11, err_msg=name
        )


def test_mode_sums_adaptive_matches_v1():
    # the adaptive variant runs the identical mode body; where the cutoff
    # does not engage the sums must match v1/XLA to fp roundoff
    cos = _toy_cosdata(A=20, B=6, M=16, N=24, seed=7)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=24, L=3, seed=8, sig_hi=2.0)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=8, rows=8,
                               interpret=True, variant="adaptive")
    for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-9,
            err_msg=name,
        )


def test_mode_sums_adaptive_cutoff_truncates_safely():
    # big sigmas => the e^{-theta^2/2} cutoff clips most of the u-degree
    # axis; the truncated tail is analytically < e^-50, so parity with the
    # untruncated XLA sums must still hold to fp roundoff
    cos = _toy_cosdata(A=64, B=4, M=16, N=16, seed=13)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=16, L=2, seed=14, sig_hi=3.0)
    o1 = o1 + 2.0  # push sigma up so the cutoff engages well below A
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=8, rows=8,
                               interpret=True, variant="adaptive")
    for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-9, err_msg=name
        )


def test_node_grads_adaptive_ragged():
    # ragged M (OOB rows in the last tile) + adaptive cutoff: the masked
    # min/max must keep every real mode (this failed before the mask)
    cos = _toy_cosdata(A=13, B=5, M=12, N=16, seed=9)
    u1, u2, o1, o2, p = _rand_sites(M=12, N=16, L=2, seed=10, sig_hi=1.5)
    a = jnp.ones((2, 1, 1)) / 2.0
    want = cos_node_grads(cos, u1, u2, o1, o2, p, a, 0.25, NODE)
    got = cos_node_grads_pallas(cos, u1, u2, o1, o2, p, a, 0.25, NODE,
                                a_block=4, interpret=True, variant="adaptive")
    for g, w, name in zip(got, want, want._fields):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-8, atol=1e-10, err_msg=name
        )


def test_mode_sums_spill_free_tile_knobs():
    # The production spill-free tile: lane tiling (ragged final col block),
    # full + partial inner unroll, and the auto defaults — all must match
    # the XLA path exactly (the retile reorders nothing at equal a_block).
    cos = _toy_cosdata(A=20, B=6, M=16, N=300, seed=11)  # 300 = 2*128 + 44
    u1, u2, o1, o2, p = _rand_sites(M=16, N=300, L=2, seed=12, sig_hi=2.0)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=4, want_grads=True)
    for kw in (
        dict(a_block=4, cols=128, unroll_b=6),            # full unroll
        dict(a_block=4, cols=128, unroll_b=2),            # hand-chunked partial
        dict(a_block=4, cols=256),                        # ragged final block
        dict(a_block=4),                                  # auto cols
        dict(),                                           # full production auto
        dict(a_block=4, cols=128, variant="adaptive"),    # cutoff + col masking
    ):
        got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, rows=8,
                                   interpret=True, **kw)
        for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-7,
                err_msg=f"{name} {kw}"
            )


def test_mode_sums_knob_validation():
    import pytest

    cos = _toy_cosdata(A=8, B=6, M=8, N=200, seed=13)
    u1, u2, o1, o2, p = _rand_sites(M=8, N=200, L=1, seed=14, sig_hi=1.0)
    with pytest.raises(ValueError, match="multiple of 128"):
        cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, cols=64, interpret=True)
    with pytest.raises(ValueError, match="divide B"):
        cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, unroll_b=4, interpret=True)
