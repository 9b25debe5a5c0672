"""Simplex projection, mixture mode, flow colorization, .flo IO, images."""

import numpy as np
import jax.numpy as jnp
import pytest

from gqmap_tpu.ops.simplex import project_simplex, softmax, softmax_natural_step
from gqmap_tpu.ops.mixture import mixture_mode_1d, mixture_neg_pdf, extract_map
from gqmap_tpu.ops.flowviz import flow_to_color, compute_color, make_colorwheel
from gqmap_tpu.io.flo import read_flo, write_flo
from gqmap_tpu.io.images import imresize, rgb2gray


# ----------------------------------------------------------------- simplex
def projsplx_loop(y):
    """Literal transcription of the Ye algorithm (projsplx.m:15-31)."""
    y = np.asarray(y, float)
    m = len(y)
    s = np.sort(y)[::-1]
    tmpsum = 0.0
    bget = False
    for ii in range(m - 1):
        tmpsum += s[ii]
        tmax = (tmpsum - 1) / (ii + 1)
        if tmax >= s[ii + 1]:
            bget = True
            break
    if not bget:
        tmax = (tmpsum + s[m - 1] - 1) / m
    return np.maximum(y - tmax, 0)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_project_simplex_matches_loop(n):
    r = np.random.default_rng(n)
    for _ in range(50):
        y = r.normal(size=n) * 3
        got = np.asarray(project_simplex(jnp.asarray(y)))
        want = projsplx_loop(y)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert abs(got.sum() - 1) < 1e-9 and (got >= 0).all()


def test_project_simplex_batched():
    r = np.random.default_rng(0)
    Y = r.normal(size=(4, 6, 3))
    got = np.asarray(project_simplex(jnp.asarray(Y)))
    for i in range(4):
        for j in range(6):
            np.testing.assert_allclose(got[i, j], projsplx_loop(Y[i, j]), atol=1e-12)


def test_softmax_natural_step():
    w = jnp.asarray([0.1, -0.2, 0.3])
    dalpha = jnp.asarray([1.0, 2.0, -0.5])
    a = np.asarray(softmax(w))
    want = np.clip(np.asarray(w) + a * (np.asarray(dalpha) - (dalpha * a).sum()) * 0.01, -300, 300)
    np.testing.assert_allclose(np.asarray(softmax_natural_step(w, dalpha, 0.01)), want, rtol=1e-12)


# ----------------------------------------------------------------- mixture
def scipy_mixture_mode(alpha, mu, sigma):
    """Reference implementation following findMixMax.m:44-58 with scipy."""
    from scipy.optimize import fminbound
    from scipy.stats import norm

    neg = lambda x: -np.sum(alpha * norm.pdf(x, mu, sigma))
    vals = np.array([neg(m) for m in mu])
    uid = vals.argmin()
    x = fminbound(neg, mu.min(), mu.max(), xtol=1e-8)
    return x if neg(x) < vals[uid] else mu[uid]


def test_mixture_mode_single_component():
    mu = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 6)))  # (L, M, N)
    sg = jnp.ones((1, 5, 6))
    out = extract_map(jnp.ones(1), mu, sg, mu, sg)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(mu[0]), atol=1e-12)


def test_mixture_mode_matches_scipy():
    r = np.random.default_rng(42)
    L = 3
    alpha = r.dirichlet(np.ones(L))
    mu = r.normal(size=(40, L)) * 3
    sigma = r.uniform(0.2, 2.0, size=(40, L))
    got = np.asarray(mixture_mode_1d(jnp.asarray(alpha), jnp.asarray(mu), jnp.asarray(sigma)))
    neg = lambda x, i: float(mixture_neg_pdf(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(mu[i]), jnp.asarray(sigma[i])))
    for i in range(40):
        want = scipy_mixture_mode(alpha, mu[i], sigma[i])
        # modes must have (near-)equal density even if a symmetric tie flips
        assert abs(neg(got[i], i) - neg(want, i)) < 1e-8, (i, got[i], want)


# ----------------------------------------------------------------- flowviz
def test_colorwheel():
    w = make_colorwheel()
    assert w.shape == (55, 3)
    assert w[0].tolist() == [255, 0, 0]
    assert (w >= 0).all() and (w <= 255).all()


def test_compute_color_zero_flow_white():
    img = compute_color(np.zeros((3, 3)), np.zeros((3, 3)))
    assert (img == 255).all()


def test_flow_to_color_unknown_and_ranges():
    flow = np.zeros((4, 5, 2))
    flow[0, 0] = [2.0, -1.0]
    flow[1, 1] = [1e10, 0.0]  # unknown
    res = flow_to_color(flow)
    assert res.unknown[1, 1] and res.unknown.sum() == 1
    assert (res.img[1, 1] == 0).all()
    assert res.flo[1, 1, 0] == 0.0
    assert res.maxu == 2.0 and res.minv == -1.0 and res.minu == 0.0 and res.maxv == 0.0
    assert res.img.dtype == np.uint8


# ----------------------------------------------------------------- .flo IO
def test_flo_roundtrip(tmp_path):
    r = np.random.default_rng(1)
    flow = r.normal(size=(7, 9, 2)).astype(np.float32)
    p = tmp_path / "t.flo"
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_rejects_bad(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"XXXX" + b"\0" * 8)
    with pytest.raises(ValueError):
        read_flo(p)


# ----------------------------------------------------------------- images
def test_rgb2gray_matlab_values():
    img = np.zeros((1, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[0, 2] = [10, 20, 30]
    g = rgb2gray(img)
    # MATLAB: round(255*0.298936...) = 76, round(255*0.587043...) = 150
    assert g[0, 0] == 76 and g[0, 1] == 150
    assert g[0, 2] == round(10 * 0.298936021293775 + 20 * 0.587043074451121 + 30 * 0.114020904255103)


def test_imresize_basic():
    img = np.tile(np.arange(16, dtype=float), (16, 1))
    half = imresize(img, 0.5)
    assert half.shape == (8, 8)
    # linear ramp stays linear under antialiased bicubic (interior)
    d = np.diff(half[4, 2:6])
    np.testing.assert_allclose(d, d[0], rtol=1e-10)
    const = imresize(np.full((8, 8), 3.3), 2)
    np.testing.assert_allclose(const, 3.3, rtol=1e-12)
    up = imresize(img, [32, 32])
    assert up.shape == (32, 32)


def test_preprocessed_mat_loader():
    from tests.conftest import has_middlebury

    if not has_middlebury():
        import pytest

        pytest.skip("no data")
    from gqmap_tpu.io.dataset import load_sequence

    seq = load_sequence("rubberwhale", preprocessed=True)
    assert seq.img1.shape == (388, 584)
    # structure-texture decomposed inputs differ from plain grayscale
    plain = load_sequence("rubberwhale")
    assert not np.allclose(seq.img1, plain.img1)


def test_evals_aepe_helper():
    from gqmap_tpu.evals.metrics import aepe

    flow = np.ones((6, 6, 2))
    gt = np.zeros((6, 6, 2))
    assert aepe(flow, gt, crop=1) == pytest.approx(np.sqrt(2.0))
    unk = np.zeros((6, 6), bool)
    unk[2, 2] = True
    # unknown pixel zeroed in the estimate -> matches zero GT there
    v = aepe(flow, gt, unknown=unk, crop=1)
    assert v < np.sqrt(2.0)


def test_structure_texture_decomposition():
    # ROF structure must be smoother (lower total variation) than the input,
    # and the texture-emphasized blend must preserve the intensity range.
    from gqmap_tpu.io.preprocess import rof_structure, structure_texture

    r = np.random.default_rng(0)
    base = np.zeros((40, 50))
    base[:, 25:] = 100.0  # cartoon edge
    img = base + r.normal(0, 8.0, base.shape)  # + noise texture

    def tv(x):
        return np.abs(np.diff(x, axis=0)).sum() + np.abs(np.diff(x, axis=1)).sum()

    s = rof_structure(img, theta=12.0, iters=80)
    assert tv(s) < 0.4 * tv(img)
    # the edge survives in the structure
    assert s[:, 35:].mean() - s[:, :15].mean() > 60.0

    out = structure_texture(img, blend=0.8)
    assert out.shape == img.shape
    np.testing.assert_allclose(out.min(), img.min(), rtol=1e-9)
    np.testing.assert_allclose(out.max(), img.max(), rtol=1e-9)


def test_structure_texture_matches_reference_mats():
    # Parity evidence for the reference's opaque preprocessed .mat inputs
    # (the generating code is absent from the reference, SURVEY.md 2.3): our
    # structure-texture output must correlate with the shipped .mat clearly
    # better than the raw grayscale does.
    import pytest

    from gqmap_tpu.io.dataset import data_root, load_sequence

    try:
        root = data_root()
    except FileNotFoundError:
        pytest.skip("dataset not available")
    if not (root / "preprocessed" / "RubberWhale.mat").is_file():
        pytest.skip("preprocessed .mat not available")

    ref = load_sequence("rubberwhale", preprocessed=True)
    raw = load_sequence("rubberwhale")
    st = load_sequence("rubberwhale", st_preprocess=True)

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    c_raw = abs(corr(raw.img1, ref.img1))
    c_st = abs(corr(st.img1, ref.img1))
    assert c_st > c_raw + 0.05, (c_st, c_raw)
