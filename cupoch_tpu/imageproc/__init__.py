"""Image processing pipelines (reference: src/cupoch/imageproc/)."""
from .sgm import SemiGlobalMatching, SGMOption, compute_disparity

__all__ = ["SemiGlobalMatching", "SGMOption", "compute_disparity"]
