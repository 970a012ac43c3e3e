from meshrecon.flow.pyramid import pyr_down, pyr_up, compare
from meshrecon.flow.remap import flow_remap, bicubic_remap
from meshrecon.flow.api import calculate_flow

__all__ = [
    "pyr_down",
    "pyr_up",
    "compare",
    "flow_remap",
    "bicubic_remap",
    "calculate_flow",
]
