"""SphereManOpt-TPU: TPU-native optimisation on products of spherical manifolds.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mannixp/SphereManOpt (reference: /root/reference): minimisation of
PDE-constrained objectives J(X) subject to per-component norm constraints
<X_i, X_i> = E_i over a product of spheres.

Layering (bottom-up):
  ops/        spectral transforms (Fourier, Chebyshev/DCT), dealiasing,
              Pallas kernels for the hot paths
  solvers/    IMEX timesteppers (SBDF1, CNAB1) as lax.scan bodies,
              diagonal-Fourier and Chebyshev-tau implicit solves
  manifold/   sphere geometry: retraction, tangent projection, transport
  optim/      Armijo + strong-Wolfe line searches, SD/CG driver
  grad/       Taylor-remainder adjoint verification
  problems/   PCA, Swift-Hohenberg (periodic + bounded), kinematic dynamo,
              optimal mixing
  parallel/   device meshes, sharded spectral state, distributed FFT
  io/         optimiser progress checkpoint/resume, scalar time series

Unlike the reference (NumPy + MPI + Dedalus), gradients here are discrete
adjoints obtained by checkpointed autodiff of jitted `lax.scan` forward
solves, and all hot loops compile to a single XLA executable per solve.
"""

from spheremanopt_tpu.manifold.sphere import (
    normalise_sphere,
    retract,
    tangent_project,
    transport,
)
from spheremanopt_tpu.optim.optimiser import (
    OptimiseResult,
    optimise_on_multi_sphere,
)
from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test

__version__ = "0.1.0"

__all__ = [
    "normalise_sphere",
    "retract",
    "tangent_project",
    "transport",
    "OptimiseResult",
    "optimise_on_multi_sphere",
    "adjoint_gradient_test",
]
