from .hamiltonian import (  # noqa: F401
    Hamiltonian,
    block_two_site,
    heisenberg,
    scars_H,
    sublattice_rotate,
    tfim,
    xy,
)
from .exact import loschmidt_rate, tfim_gs_energy, xy_gs_energy  # noqa: F401
