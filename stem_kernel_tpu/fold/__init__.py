"""In-framework RNA folding: McCaskill partition function and BPP matrices.

Replaces the reference's external Vienna RNA dependency
(/root/reference/common/bpmatrix.{h,cpp}, common/pf_wrapper.{h,cpp}) with a
batched JAX implementation.
"""

from .params import EnergyParams, default_params
from .mccaskill import mccaskill_logZ, mccaskill_bpp, mccaskill_bpp_batch
from .bpmatrix import (
    BPMatrixOptions,
    fold_sequences,
    average_bpp,
    bpp_for_alignment,
    bpp_for_alignments,
    alifold_bpp,
)
from .contrafold import (
    contrafold_bpp,
    contrafold_energy_params,
    load_contrafold_params,
    train_contrafold,
)

__all__ = [
    "contrafold_bpp",
    "contrafold_energy_params",
    "load_contrafold_params",
    "train_contrafold",
    "EnergyParams",
    "default_params",
    "mccaskill_logZ",
    "mccaskill_bpp",
    "mccaskill_bpp_batch",
    "BPMatrixOptions",
    "fold_sequences",
    "average_bpp",
    "bpp_for_alignment",
    "bpp_for_alignments",
    "alifold_bpp",
]
