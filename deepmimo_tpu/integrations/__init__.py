"""Downstream integrations: Sionna link-level sims, MATLAB toolchain."""

import os as _os

from .sionna_adapter import DeepMIMOSionnaAdapter
from .matlab_export import export_matlab
from .nr_cdl import CDLConfig, export_cdl, save_cdl_mat, synthesize_cdl_cir


def matlab_code_path() -> str:
    """Folder of the shipped MATLAB generator (.m files).

    ``export_matlab(dataset, out)`` + ``addpath(matlab_code_path())`` +
    ``DeepMIMO_TPU_generate(out, default_params())`` reproduces channel
    generation inside MATLAB — capability parity with the reference's
    vendored MATLAB port (reference
    deepmimo/integrations/matlab/DeepMIMO-matlab/DeepMIMO_generator.m).
    """
    return _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "matlab")


__all__ = ["DeepMIMOSionnaAdapter", "export_matlab", "matlab_code_path",
           "CDLConfig", "export_cdl", "save_cdl_mat", "synthesize_cdl_cir"]
