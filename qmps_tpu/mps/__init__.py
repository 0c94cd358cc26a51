from .excitations import dispersion, excitation_matrix  # noqa: F401
from .imps import iMPS, Map, TransferMatrix  # noqa: F401
from .tdvp import vumps_ground_state  # noqa: F401
from .transfer import dominant_eig_dense, dominant_eig_power  # noqa: F401
