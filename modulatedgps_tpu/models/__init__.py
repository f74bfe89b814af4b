from .svgp import SVGP
from .smgp import SGP, SMGP, SMGPModified

__all__ = ["SVGP", "SGP", "SMGP", "SMGPModified"]
