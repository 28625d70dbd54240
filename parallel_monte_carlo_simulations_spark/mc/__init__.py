"""Monte Carlo battery (reference-parity surface, Spark execution)."""

from .battery import MCBattery, ParallelMCBattery
from .models import BatteryConfigs, SimulationConfig, RNG_MAPPING

__all__ = [
    "MCBattery",
    "ParallelMCBattery",
    "BatteryConfigs",
    "SimulationConfig",
    "RNG_MAPPING",
]
