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


def test_mode_sums_recur_tight_sigma_matches_xla():
    # tight sigma => the per-tile safety bound holds and the "recur"
    # variant takes the zero-exp recurrence body; same math, different
    # association, so parity to ~1e-9 (f64)
    cos = _toy_cosdata(A=24, B=6, M=16, N=24, seed=15)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=24, L=3, seed=16, sig_hi=0.08)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=8, rows=8,
                               interpret=True, variant="recur")
    for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-9, err_msg=name
        )


def test_mode_sums_recur_wide_sigma_falls_back():
    # wide sigma + strong correlation is exactly where the recurrence would
    # underflow-then-recover; the safety predicate must route those tiles
    # to the exp body, keeping parity with the XLA sums
    cos = _toy_cosdata(A=48, B=6, M=16, N=16, seed=17)
    u1, u2, o1, o2, p = _rand_sites(M=16, N=16, L=2, seed=18, sig_hi=3.0)
    o1 = o1 + 2.0
    p = jnp.clip(p * 1.1, -0.99999, 0.99999)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    got = cos_mode_sums_pallas(cos, u1, u2, o1, o2, p, a_block=8, rows=8,
                               interpret=True, variant="recur")
    for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-9, err_msg=name
        )


def _flatten_cosdata(cos):
    from gqmap_tpu.ops.cosine import flat_pack_shape

    A, B, M, N = cos.coeffs.shape
    Mf, Nf = flat_pack_shape(M * N)
    flat = jnp.pad(
        cos.coeffs.reshape(A, B, M * N), ((0, 0), (0, 0), (0, Mf * Nf - M * N))
    ).reshape(A, B, Mf, Nf)
    return cos._replace(coeffs=flat)


def test_mode_sums_flat_layout_matches_2d():
    # the FLAT site layout (build_cos_data(flat=True)) must reproduce the
    # 2-D lattice results bit-for-bit up to reassociation: same modes, same
    # sites, only the tile packing changes. 21x37 = 777 sites -> (2, 512)
    # with 247 tail pads crossing a row boundary.
    cos = _toy_cosdata(A=20, B=6, M=21, N=37, seed=19)
    u1, u2, o1, o2, p = _rand_sites(M=21, N=37, L=2, seed=20, sig_hi=1.5)
    want, _ = _mode_sums(cos, u1, u2, o1, o2, p, a_block=8, want_grads=True)
    cflat = _flatten_cosdata(cos)
    for variant in ("v1", "adaptive", "recur"):
        got = cos_mode_sums_pallas(cflat, u1, u2, o1, o2, p, a_block=8,
                                   rows=8, interpret=True, variant=variant)
        for g, w, name in zip(got, want, ("E0", "A1", "A2", "Aa", "Ab", "Ax")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-9,
                err_msg=f"{name} {variant}"
            )


def test_node_grads_and_xla_path_flat_layout():
    # both consumers of a flat coefficient field — the Pallas kernel and
    # the XLA scan path (cos_node_grads / cos_ei) — agree with the 2-D
    # build through the finalize stage
    from gqmap_tpu.ops.cosine import cos_ei

    cos = _toy_cosdata(A=16, B=4, M=13, N=19, seed=21)
    u1, u2, o1, o2, p = _rand_sites(M=13, N=19, L=3, seed=22, sig_hi=1.0)
    a = jnp.ones((3, 1, 1)) / 3.0
    want = cos_node_grads(cos, u1, u2, o1, o2, p, a, 0.25, NODE)
    cflat = _flatten_cosdata(cos)
    got_xla = cos_node_grads(cflat, u1, u2, o1, o2, p, a, 0.25, NODE)
    got_pl = cos_node_grads_pallas(cflat, u1, u2, o1, o2, p, a, 0.25, NODE,
                                   interpret=True)
    for got in (got_xla, got_pl):
        for g, w, name in zip(got, want, want._fields):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-8, atol=1e-10,
                err_msg=name
            )
    np.testing.assert_allclose(
        np.asarray(cos_ei(cflat, u1, u2, o1, o2, p)),
        np.asarray(cos_ei(cos, u1, u2, o1, o2, p)),
        rtol=1e-10, atol=1e-12,
    )
