"""qmps_tpu — a TPU-native JAX framework for uniform-MPS quantum circuits.

A ground-up rebuild of the capabilities of the reference qMPS codebase
(fergusfinn/qmps): translationally invariant matrix product states represented
as parametrized quantum circuits, optimized and time-evolved entirely with
jit-compiled tensor contractions on TPU — no circuit simulator in the loop.

Layer map (bottom to top):

- ``core``        Lie-algebra parametrizations of SU(N), Pauli algebra, gate set,
                  differentiable isometry completion (reference: qmps/tools.py,
                  new_tdvp/unitary_param.py, xmps.spin).
- ``mps``         uniform MPS tensors, canonical forms, transfer operators and
                  their fixed points (batched differentiable power iteration),
                  classical TDVP (reference: the external xmps library).
- ``embed``       tensor<->unitary and environment<->unitary embeddings
                  (reference: qmps/tools.py:76-154, qmps/time_evolve_tools.py:38-74).
- ``circuits``    circuit IR -> dense unitary compiler + the ansatz zoo
                  (reference: qmps/represent.py:268-442, experiments/Jamie.py).
- ``ham``         Pauli-string Hamiltonians and exact-physics oracles
                  (reference: qmps/ground_state.py:66-118, qmps/exact_loschmidt.py).
- ``env``         exact / variational / power-method environments
                  (reference: qmps/represent.py:18-53, new_tdvp/ClassicalTDVPStripped.py:599-655).
- ``objectives``  energy, TDVP-overlap, trace-distance, noisy and sampled
                  objectives as pure jitted functions of the parameters.
- ``optim``       gradient optimizers (optax) + jittable Rotosolve.
- ``algorithms``  ground-state search, environment representation, TDVP time
                  evolution / Loschmidt echoes, many-body scars.
- ``parallel``    vmap/shard_map sweep infrastructure over a TPU mesh.
- ``kernels``     Pallas TPU kernels for the hot contractions.

Numerics policy: float64/complex128 is enabled globally (the 1e-10 parity
targets require it); TPU hot paths explicitly cast to complex64 where speed
matters and accuracy allows (see ``qmps_tpu.config``).
"""
import os

import jax

# Correctness default: float64/complex128 (the 1e-10 parity targets need it).
# TPU hot paths (bench.py, __graft_entry__.py) set QMPS_TPU_X64=0 before
# importing: with x64 disabled every dtype request canonicalizes to 32-bit,
# which is what the TPU backend supports (complex128 is not available there).
if os.environ.get("QMPS_TPU_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bfloat16 passes; repeated-squaring fixed points and
# Lie exponentials need full f32 accumulation (measured: O(1) energy errors
# in the phase-diagram sweep without this).
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

from . import config  # noqa: E402,F401
