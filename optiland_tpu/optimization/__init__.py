from optiland_tpu.optimization.operands import Operand, register_operand
from optiland_tpu.optimization.optimizers import (
    BasinHopping,
    DifferentialEvolution,
    DualAnnealing,
    LeastSquares,
    OptaxOptimizer,
    GlassExpert,
    OrthogonalDescent,
    OptimizerGeneric,
    SHGO,
    TorchAdamOptimizer,
    TorchSGDOptimizer,
)
from optiland_tpu.optimization.problem import OptimizationProblem
from optiland_tpu.optimization.scaling import (
    IdentityScaler,
    LinearScaler,
    LogScaler,
    PowerScaler,
    ReciprocalScaler,
)
from optiland_tpu.optimization.variables import Variable

__all__ = [
    "BasinHopping",
    "DifferentialEvolution",
    "DualAnnealing",
    "IdentityScaler",
    "LeastSquares",
    "LinearScaler",
    "LogScaler",
    "Operand",
    "OptaxOptimizer",
    "OptimizationProblem",
    "GlassExpert",
    "OptimizerGeneric",
    "OrthogonalDescent",
    "PowerScaler",
    "ReciprocalScaler",
    "SHGO",
    "TorchAdamOptimizer",
    "TorchSGDOptimizer",
    "Variable",
    "register_operand",
]
