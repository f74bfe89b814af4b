from .svgp import SVGP
from .vgp import VGP
from .smgp import SGP, SMGP, SMGPModified
from .posterior import PrecomputedPosterior, precompute_posterior

__all__ = ["SVGP", "VGP", "SGP", "SMGP", "SMGPModified",
           "PrecomputedPosterior", "precompute_posterior"]
