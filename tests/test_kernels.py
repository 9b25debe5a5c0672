"""Pallas kernel parity vs the XLA ops path (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gqmap_tpu.ops.gq import gq_accumulate
from gqmap_tpu.ops.potentials import make_edge_pot
from gqmap_tpu.ops.quadrature import build_table


def test_edge_gq_pallas_matches_ops():
    from gqmap_tpu.kernels.edge_gq import edge_gq_pallas

    r = np.random.default_rng(0)
    K = 5
    shape = (2, 2, 3, 16, 128)
    u1 = jnp.asarray(r.normal(size=shape[2:]), jnp.float32)[None, None]
    u2 = jnp.asarray(r.normal(size=shape), jnp.float32)
    o1 = jnp.asarray(r.uniform(0.5, 3, shape[2:]), jnp.float32)[None, None]
    o2 = jnp.asarray(r.uniform(0.5, 3, shape), jnp.float32)
    p = jnp.asarray(r.uniform(-0.9, 0.9, shape), jnp.float32)

    tab = build_table(K, 0, np.float32)
    f = make_edge_pot(5.0, 1e-6)
    want = gq_accumulate(f, u1, u2, o1, o2, p, tab)
    got = edge_gq_pallas(u1, u2, o1, o2, p, K, 5.0, 1e-6, rows=8, interpret=True)
    for name in want._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            rtol=2e-5,
            atol=2e-4,
            err_msg=name,
        )
