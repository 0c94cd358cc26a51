from .hamiltonian import Hamiltonian, heisenberg, scars_H, tfim, xy  # noqa: F401
from .exact import loschmidt_rate, tfim_gs_energy, xy_gs_energy  # noqa: F401
