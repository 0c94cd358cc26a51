from .ground_state import (  # noqa: F401
    GroundStateResult,
    GuessInitialFullParameterOptimizer,
    NoisyNonSparseFullEnergyOptimizer,
    NoisySparseFullEnergyOptimizer,
    NoisySparseSampledEnergyOptimizer,
    NonSparseFullEnergyOptimizer,
    NonSparseFullTwoSiteEnergyOptimizer,
    SparseFullEnergyOptimizer,
    find_ground_state,
)
from .evolve import MPSTimeEvolve, loschmidt_echo_run  # noqa: F401
from .represent import RepresentMPS  # noqa: F401
