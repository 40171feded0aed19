from .mel import MelL1Criterion, compute_mcd, compute_ssim, masked_l1  # noqa: F401
from .lm import LMCriterion  # noqa: F401
