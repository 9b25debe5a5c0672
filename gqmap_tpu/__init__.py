"""gqmap_tpu: TPU-native GQMAP dense-correspondence engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
motionlife/gqmap-opticalflow (MAP inference over pairwise image-grid MRFs
via Gauss-Hermite quadrature gradient ascent on Gaussian-mixture
variational families, specialized to dense optical flow), designed
TPU-first: whole-lattice vectorized sweeps, mesh-sharded grids with
XLA-inserted collectives, and Pallas kernels for the quadrature hot path.
"""

from .config import FlowRange, GQMAPConfig
from .models.gqmap import GQState, SolveResult, solve

__version__ = "0.1.0"

__all__ = ["GQMAPConfig", "FlowRange", "GQState", "SolveResult", "solve"]
