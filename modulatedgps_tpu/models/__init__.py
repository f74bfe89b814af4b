from .svgp import SVGP
from .smgp import SGP, SMGP, SMGPModified
from .posterior import PrecomputedPosterior, precompute_posterior

__all__ = ["SVGP", "SGP", "SMGP", "SMGPModified",
           "PrecomputedPosterior", "precompute_posterior"]
