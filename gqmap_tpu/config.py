"""Run configuration for the GQMAP engine, with the reference presets.

The reference scatters its hyperparameters across driver scripts and solver
constants (``optical_flow.m:16-23``, ``optical_flowSuper.m:19-26``, step
schedules at ``gqmap_gpu_mixture.m:27`` / ``gqmap_gpuSuper_mix_entropy.m:26``,
clamps at ``gqmap_gpu_mixture.m:41-46``). Here everything lives in one
frozen dataclass with per-variant presets, as SURVEY.md section 5 calls for.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

__all__ = ["GQMAPConfig", "FlowRange"]


class FlowRange(NamedTuple):
    """GT-derived clamp/init ranges injected by ``flowToColor_mex``
    (``optical_flow.m:12-13``)."""

    minu: float
    maxu: float
    minv: float
    maxv: float


@dataclasses.dataclass(frozen=True)
class GQMAPConfig:
    # --- model ---
    K: int = 9                    # Gauss-Hermite order (K^2-point 2-D rule)
    L: int = 3                    # mixture components
    epsn: float = 1e-6            # Charbonnier epsilon (0.001^2)
    lambdad: float = 1.0          # data weight
    lambdas: float = 5.0          # smoothness weight
    patch: int = 1                # flow node owns patch x patch image pixels (super: 4)
    data_term: str = "bicubic"    # "bicubic" | "nearest" (legacy I2_cont lookup)
                                  # | "chebyshev" (gather-free spectral term)
                                  # | "cosine" (closed-form spectral term: the
                                  #   Gaussian expectation of every mode is the
                                  #   characteristic function — no node
                                  #   quadrature at all, exact gradients;
                                  #   degrees/margin shared with cheb_p/q/margin)
    rfc: int = 6                  # upsample factor exponent for data_term="nearest"
    cheb_p: int = 96              # u-degree of the spectral data term
    cheb_q: int = 32              # v-degree
    cheb_margin: float = 2.0      # displacement-box margin beyond the mu range
    cheb_ablock: int = 8          # u-degrees per scan block at evaluation
    node_kernel: str = "auto"     # cosine-term evaluator: "xla" (lax.scan mode
                                  # loop), "pallas" (fused VMEM kernel,
                                  # kernels/cosine_gq.py — measured 2.9x the
                                  # XLA path on v5e), "auto" (pallas on a
                                  # single-device TPU backend, else xla)
    quad_var: float = 1.0         # variance of the quadratic node prior (legacy v1)
    edge_kind: str = "charbonnier"  # or "truncquad" (legacy/gqmap_cpu.m:43)
    edge_quad: str = "tensor"     # "tensor": K^2-point 2-D rule (reference
                                  # semantics); "reduced": exact 1-D collapse
                                  # of the difference potential
                                  # (ops/gq.gq_accumulate_diff) — ~K x fewer evals
    edge_quad_k: int = 0          # 1-D order for edge_quad="reduced";
                                  # 0 = auto (2K+3: beats the tensor rule's
                                  # effective d-axis resolution, see tests)
    gama: float = 1.0             # truncated-quadratic edge scale
    dta: float = 10.0             # truncation cutoff

    # --- annealing / entropy ---
    temperature: float = 0.0      # initial Bethe-entropy temperature T
    drate: float = 0.5            # geometric decay rate of T
    anneal_every: int = 0         # decay cadence in iters (0 = no annealing)
    t_floor: float = 1e-3         # T floor (gqmap_gpuSuper_mix_entropy.m:72)

    # --- optimization ---
    its: int = 30000              # max sweeps
    step0: float = 0.1            # step = step0 / (1 + it/step_tau)
    step_tau: float = 8000.0      # inf => constant step (gqmap_ctf.m:27)
    sigma_step_scale: float = 1.0 # ctf damps sigma steps by 0.3 (gqmap_ctf.m:34)
    sigma_min: float = 0.01
    sigma_max: float = 23.0       # 25 in the Super/ctf variants
    corr_tor: float = 1.0 - 1e-5  # |rho| clamp (0.999 in ctf)
    border: int = 1               # frozen boundary ring (gqmap_gpu_mixture.m:11)
    tor: float = 1e-4             # convergence threshold on mean |dmu|

    # --- gradient estimator ---
    gradient_estimator: str = "stein"  # reference Stein identities, or
                                       # "autodiff" (jax.grad of the quadrature
                                       # expectation; the TPU-native heir of the
                                       # legacy/gqmap_gpuV3.m analytic-derivative
                                       # estimator family)

    # --- mixture weights ---
    alpha_update: str = "softmax_natural"  # or "projsplx" (gqmap_gpu_mixture.m:49-50)
    alpha_start: int = 500        # first iteration the alpha update runs after
    alpha_lr_scale: float = 1e-7  # lr = step * alpha_lr_scale

    # --- evaluation / runtime ---
    eval_every: int = 300         # MAP/AEPE/logP cadence (gqmap_gpu_mixture.m:52)
    quad_chunk: int = 0           # quadrature points per scan step (0 = all K^2)
    dtype: str = "float32"        # state dtype ("float64" for the CPU golden model)
    seed: int = 0
    debug_finite: bool = False    # assert every state leaf finite after each
                                  # segment (the 1/(1-p^2) factors near the rho
                                  # clamp are the known blow-up mode,
                                  # gqmap_gpu_mixture.m:92-93); raises
                                  # FloatingPointError naming the leaf

    @property
    def step_const(self) -> bool:
        return math.isinf(self.step_tau)

    def step_at(self, it) -> float:
        if self.step_const:
            return self.step0
        return self.step0 / (1.0 + it / self.step_tau)

    # ------------------------------------------------------------------ presets
    @classmethod
    def full_mixture(cls, **kw) -> "GQMAPConfig":
        """Full-resolution L=3 mixture, T=0 (``optical_flow.m:16-23`` +
        ``gqmap_gpu_mixture.m``)."""
        return cls(**{**dict(
            K=9, its=30000, epsn=1e-6, lambdas=5.0, lambdad=1.0, L=3,
            temperature=0.0, drate=0.5, anneal_every=0,
            step0=0.1, step_tau=8000.0, sigma_max=23.0, patch=1,
        ), **kw})

    @classmethod
    def super_entropy(cls, **kw) -> "GQMAPConfig":
        """Quarter-res super lattice + entropy annealing
        (``optical_flowSuper.m:19-26`` + ``gqmap_gpuSuper_mix_entropy.m``)."""
        return cls(**{**dict(
            K=11, its=30000, epsn=1e-6, lambdas=16.0, lambdad=1.0, L=3,
            temperature=0.2, drate=0.75, anneal_every=500, t_floor=1e-3,
            step0=0.001, step_tau=4000.0, sigma_max=25.0, patch=4,
        ), **kw})

    @classmethod
    def single_gaussian(cls, **kw) -> "GQMAPConfig":
        """L=1 full-res solver (the modern equivalent of
        ``legacy/gqmap_gpuV2.m``)."""
        return cls.full_mixture(**{**dict(L=1), **kw})

    @classmethod
    def tpu_fast(cls, **kw) -> "GQMAPConfig":
        """Flagship mixture preset with the TPU-native fast paths: the
        closed-form cosine data term (zero node quadrature) and the reduced
        1-D edge quadrature (see PERFORMANCE.md)."""
        return cls.full_mixture(**{**dict(
            data_term="cosine", cheb_p=96, cheb_q=16, quad_chunk=27,
            edge_quad="reduced",
        ), **kw})

    @classmethod
    def tpu_fast_super(cls, **kw) -> "GQMAPConfig":
        """The reference's strongest-accuracy variant (¼-res super lattice +
        entropy annealing, ``gqmap_gpuSuper_mix_entropy.m``) on the TPU-native
        fast paths: the cosine data term expands the *patch-summed* node
        potential (``build_cos_data(patch=4)``), so the zero-quadrature
        closed form covers the 4x4-patch data term too."""
        return cls.super_entropy(**{**dict(
            data_term="cosine", cheb_p=96, cheb_q=16, quad_chunk=0,
            edge_quad="reduced",
        ), **kw})

    @classmethod
    def legacy_v1(cls, **kw) -> "GQMAPConfig":
        """Earliest solver family (``legacy/gqmap_cpu.m``): quadratic node
        prior toward an init flow + truncated-quadratic edges, L=1."""
        return cls(**{**dict(
            K=9, its=2000, L=1, data_term="quadratic", edge_kind="truncquad",
            quad_var=1.0, gama=1.0, dta=10.0,
            step0=0.1, step_tau=1000.0, corr_tor=0.97, sigma_max=25.0,
        ), **kw})

    @classmethod
    def ctf_level(cls, **kw) -> "GQMAPConfig":
        """Single pyramid-level solver (``legacy/gqmap_ctf.m``): L=1,
        constant step 0.07, sigma-step damping 0.3, looser rho clamp."""
        return cls(**{**dict(
            K=11, its=3000, epsn=1e-6, lambdas=5.0, lambdad=1.0, L=1,
            temperature=0.0, anneal_every=0,
            step0=0.07, step_tau=math.inf, sigma_step_scale=0.3,
            sigma_max=25.0, corr_tor=0.999, patch=1,
        ), **kw})
