from meshrecon.pipeline.config import Config
from meshrecon.pipeline.heuristic import Heuristic
from meshrecon.pipeline.reconstruct import reconstruct

__all__ = ["Config", "Heuristic", "reconstruct"]
