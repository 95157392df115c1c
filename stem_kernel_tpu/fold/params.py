"""Nearest-neighbour energy model for the partition function.

A simplified Turner-style model expressed directly in log-weight (score)
space: score = -dG / kT at 37C, so structure weight = exp(score sum).
Components:

- canonical pair set {AU, UA, CG, GC, GU, UG} with per-pair-type scores,
- helix stacking scores stack[p1, p2] (Turner 2004 Watson-Crick/wobble
  stacking free energies, rounded),
- hairpin / bulge / internal-loop length penalties with logarithmic
  extrapolation (Jacobson-Stockmayer),
- affine multiloop model a + b*branches + c*unpaired.

This is intentionally NOT a byte-exact Vienna reimplementation (no dangles,
terminal mismatches, or special loops): the reference treats the folding
engine as a swappable producer of base-pairing probability matrices
(FOLD/ALIFOLD/SFOLD/CONTRAFOLD behind one interface, common/bpmatrix.cpp:84-93),
and precomputed BPP import is supported for exact-parity experiments.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

KT37 = 0.61633  # kcal/mol at 37C

# Pair type indexing: 0=CG 1=GC 2=GU 3=UG 4=AU 5=UA, -1 = not pairable.
# Base codes: A=0 C=1 G=2 U=3 (io.alphabet).
PAIR_TYPE = -np.ones((4, 4), dtype=np.int32)
PAIR_TYPE[1, 2] = 0  # CG
PAIR_TYPE[2, 1] = 1  # GC
PAIR_TYPE[2, 3] = 2  # GU
PAIR_TYPE[3, 2] = 3  # UG
PAIR_TYPE[0, 3] = 4  # AU
PAIR_TYPE[3, 0] = 5  # UA
N_PAIR = 6

# Turner 2004 stacking free energies (kcal/mol), rows = outer pair (i,j),
# cols = inner pair (i+1, j-1).  Order CG GC GU UG AU UA.
STACK_DG = np.array(
    [
        # CG     GC     GU     UG     AU     UA
        [-3.26, -2.36, -1.41, -2.11, -2.11, -2.08],  # CG
        [-3.42, -3.26, -2.51, -1.53, -2.35, -2.24],  # GC
        [-2.11, -1.41, -0.50, +0.30, -1.36, -1.27],  # GU
        [-2.51, -1.53, +0.30, -0.50, -1.00, -1.36],  # UG
        [-2.24, -2.08, -1.36, -1.00, -0.93, -1.10],  # AU
        [-2.35, -2.11, -1.27, -1.36, -1.33, -0.93],  # UA
    ]
)


@dataclass
class EnergyParams:
    """All scores in log-weight units (dimensionless, already divided by kT)."""

    stack: np.ndarray  # (N_PAIR, N_PAIR) stacking scores
    pair_bonus: np.ndarray  # (N_PAIR,) per-pair-type score (0 by default)
    hairpin_init: float  # hairpin of size 3
    hairpin_slope: float  # + slope*ln(size/3) extrapolation
    bulge_init: float
    bulge_slope: float
    interior_init: float
    interior_slope: float
    interior_asym: float  # per |n1-n2| asymmetry penalty
    ml_close: float  # multiloop closing (a)
    ml_branch: float  # per branch (b)
    ml_unpaired: float  # per unpaired base (c)
    max_interior: int = 30  # total unpaired bases in an interior/bulge loop
    min_hairpin: int = 3  # minimum unpaired bases in a hairpin


def default_params() -> EnergyParams:
    """Turner-flavoured defaults at 37C converted to log-weights."""
    kt = KT37
    return EnergyParams(
        stack=(-STACK_DG / kt).astype(np.float64),
        pair_bonus=np.zeros(N_PAIR),
        hairpin_init=-5.7 / kt,
        hairpin_slope=-1.75,
        bulge_init=-3.8 / kt,
        bulge_slope=-1.75,
        interior_init=-1.7 / kt,
        interior_slope=-1.75,
        interior_asym=-0.6 / kt,
        ml_close=-3.4 / kt,
        ml_branch=-0.4 / kt,
        ml_unpaired=-0.0 / kt,
    )


def hairpin_score(params: EnergyParams, size: np.ndarray) -> np.ndarray:
    """Score of a hairpin loop of ``size`` unpaired bases (>= min_hairpin)."""
    size = np.asarray(size, dtype=np.float64)
    return params.hairpin_init + params.hairpin_slope * np.log(np.maximum(size, 3.0) / 3.0)


def interior_score(params: EnergyParams, n1: np.ndarray, n2: np.ndarray) -> np.ndarray:
    """Score of an interior/bulge loop with ``n1``/``n2`` unpaired per side.

    (n1, n2) = (0, 0) is helix stacking and handled separately with the stack
    table.  One side 0 -> bulge; both > 0 -> interior with asymmetry penalty.
    """
    n1 = np.asarray(n1, dtype=np.float64)
    n2 = np.asarray(n2, dtype=np.float64)
    total = n1 + n2
    bulge = params.bulge_init + params.bulge_slope * np.log(np.maximum(total, 1.0))
    interior = (
        params.interior_init
        + params.interior_slope * np.log(np.maximum(total, 2.0) / 2.0)
        + params.interior_asym * np.abs(n1 - n2)
    )
    return np.where((n1 == 0) | (n2 == 0), bulge, interior)


def load_params_file(path: str) -> EnergyParams:
    """Load an energy/CLLM parameter set from a text file.

    This is the framework's CONTRAfold hook: the reference's CONTRAFOLD
    method delegates base-pair posteriors to the external CONTRAfold
    library's trained conditional log-linear model
    (/root/reference/common/bpmatrix.cpp:264-283, gated behind
    --with-contrafold at configure time).  Here the same capability is a
    swappable parameterization of the in-framework partition function:
    trained log-linear weights are loaded from a file and drive the exact
    same scaled inside/outside engine.  (Externally computed posteriors can
    instead be supplied directly via the IMPORT path of fold.bpmatrix.)

    Format: one entry per line, '#' comments.
      <scalar_name> <value>           e.g.  hairpin_init -9.25
      pair_bonus <PAIR> <value>       e.g.  pair_bonus GU -0.5
      stack <PAIR> <PAIR> <value>     e.g.  stack CG GC 5.3
    Pair names: CG GC GU UG AU UA.  All values are log-weights (score/kT).
    Unspecified entries keep the built-in Turner-flavoured defaults.
    """
    pair_names = {"CG": 0, "GC": 1, "GU": 2, "UG": 3, "AU": 4, "UA": 5}
    scalars = {
        "hairpin_init", "hairpin_slope", "bulge_init", "bulge_slope",
        "interior_init", "interior_slope", "interior_asym",
        "ml_close", "ml_branch", "ml_unpaired",
    }
    ints = {"max_interior", "min_hairpin"}
    p = default_params()
    p.stack = p.stack.copy()
    p.pair_bonus = p.pair_bonus.copy()
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split()
            key = parts[0]
            if key in scalars and len(parts) == 2:
                setattr(p, key, float(parts[1]))
            elif key in ints and len(parts) == 2:
                setattr(p, key, int(parts[1]))
            elif key == "pair_bonus" and len(parts) == 3:
                p.pair_bonus[pair_names[parts[1].upper()]] = float(parts[2])
            elif key == "stack" and len(parts) == 4:
                p.stack[pair_names[parts[1].upper()],
                        pair_names[parts[2].upper()]] = float(parts[3])
            else:
                raise ValueError(f"{path}:{lineno}: bad parameter line {line!r}")
    return p
