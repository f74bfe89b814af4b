from .base import Likelihood
from .gaussian import Gaussian
from .bernoulli import Bernoulli
from .multiclass import MultiClass, RobustMax

__all__ = ["Likelihood", "Gaussian", "Bernoulli", "MultiClass", "RobustMax"]
