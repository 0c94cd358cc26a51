from .mesh import make_mesh  # noqa: F401
from .sweep import phase_diagram_sweep, sweep_ground_states  # noqa: F401
