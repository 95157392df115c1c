"""Energy-parameter loading: Vienna .par v2.0 + the simple text format."""

import numpy as np

from stem_kernel_tpu.fold.params import (
    KT37,
    default_params,
    load_params_file,
)

# a miniature but structurally faithful Vienna .par v2.0 file: full 8x8
# stack table, one 5-wide mismatch table, dangles, loop-length tables,
# NINIO/ML/Misc lines and a Tetraloops section.
_PAR = """## RNAfold parameter file v2.0

# stack
/*  CG    GC    GU    UG    AU    UA    NN          */
   INF   INF   INF   INF   INF   INF   INF   INF
   INF  -240  -330  -210  -140  -210  -210  -140
   INF  -330  -340  -250  -150  -220  -240  -150
   INF  -210  -250   130   -50   -140  -130   130
   INF  -140  -150   -50    30   -60   -100   30
   INF  -210  -220  -140  -60   -110   -90   -60
   INF  -210  -240  -130  -100   -90  -130   -90
   INF  -140  -150   130    30   -60   -90    30

# mismatch_hairpin
""" + "\n".join(
    " ".join(["0"] * 5) for _ in range(8 * 5)
) + """

# dangle5
   INF   INF   INF   INF   INF
   INF   -10   -20   -30   -40
   INF   -50   -60   -70   -80
   INF    0     0     0     0
   INF    0     0     0     0
   INF    0     0     0     0
   INF    0     0     0     0
   INF    0     0     0     0

# hairpin
   INF   INF   INF   540   560   570   540   600   550   640
   650   660   670   678   686   694   701   707   713   719
   725   730   735   740   744   749   753   757   761   765   769

# bulge
   INF   380   280   320   360   400   440   459   470   480
   490   500   510   519   527   534   541   548   554   560
   565   571   576   580   585   589   594   598   602   605   609

# interior
   INF   INF   INF   INF   110   200   200   210   230   240
   250   260   270   278   286   294   301   307   313   319
   325   330   335   340   345   349   353   357   361   365   369

# NINIO
/* Ninio = MIN(max, m*|n1-n2| */
/*       m   m_dH     max              */
	 60    320    300

# ML_params
/* F = cu*n_unpaired + cc + ci*loops  */
/*	    cu	 cu_dH	    cc	 cc_dH	    ci	 ci_dH  */
	     0	     0	   930	  3000	   -90	  -220

# Misc
/* all parameters are pairs of 'energy enthalpy' */
/*    DuplexInit     TerminalAU      LXC  */
	   410	   360	    50	   370	 107.856

# Tetraloops
	CAACGG	550	690
	CCAAGG	330	-1030
	GGGGAC	-30	-2230

#END
"""


def test_vienna_par_roundtrip(tmp_path):
    f = tmp_path / "mini.par"
    f.write_text(_PAR)
    p = load_params_file(str(f))
    # stack: row CG (their 1), col CG -> -240 dekacal = -2.40 kcal
    np.testing.assert_allclose(p.stack[0, 0], 2.40 / KT37, rtol=1e-12)
    np.testing.assert_allclose(p.stack[1, 0], 3.30 / KT37, rtol=1e-12)
    # hairpin mismatch zeroed by the file
    assert np.all(p.mismatch_h == 0)
    # dangle5 CG row
    np.testing.assert_allclose(p.dangle5[0], np.array([10, 20, 30, 40]) / 100 / KT37)
    # loop-length tables (INF -> -inf below min size)
    assert p.hairpin_len[2] == -np.inf
    np.testing.assert_allclose(p.hairpin_len[3], -5.40 / KT37, rtol=1e-12)
    np.testing.assert_allclose(p.bulge_len[1], -3.80 / KT37, rtol=1e-12)
    np.testing.assert_allclose(p.interior_len[4], -1.10 / KT37, rtol=1e-12)
    # NINIO m=60, max=300
    np.testing.assert_allclose(p.ninio, -0.60 / KT37, rtol=1e-12)
    np.testing.assert_allclose(p.ninio_max, -3.00 / KT37, rtol=1e-12)
    # ML_params cu=0 cc=930 ci=-90
    np.testing.assert_allclose(p.ml_unpaired, 0.0, atol=1e-15)
    np.testing.assert_allclose(p.ml_close, -9.30 / KT37, rtol=1e-12)
    np.testing.assert_allclose(p.ml_branch, 0.90 / KT37, rtol=1e-12)
    # Misc TerminalAU = 50
    np.testing.assert_allclose(p.terminal[4], -0.50 / KT37, rtol=1e-12)
    assert p.terminal[0] == 0.0
    # Tetraloops parsed (sequence -> score; 550 dekacal -> -5.5/kT score)
    np.testing.assert_allclose(
        p.special_hairpins["CAACGG"], -5.50 / KT37, rtol=1e-12
    )
    np.testing.assert_allclose(
        p.special_hairpins["GGGGAC"], 0.30 / KT37, rtol=1e-12
    )


def test_vienna_par_drives_the_engine(tmp_path):
    """A .par-loaded parameter set folds end-to-end and differs from the
    built-in defaults (the parity path for users with Vienna parameters)."""
    import jax.numpy as jnp

    from stem_kernel_tpu.fold.mccaskill import mccaskill_bpp
    from stem_kernel_tpu.io.alphabet import encode

    f = tmp_path / "mini.par"
    f.write_text(_PAR)
    p = load_params_file(str(f))
    codes = encode("ggcgaaagccaugc")
    b1, z1 = mccaskill_bpp(codes, params=p, dtype=jnp.float64)
    b0, z0 = mccaskill_bpp(codes, params=default_params(), dtype=jnp.float64)
    assert np.isfinite(z1) and abs(z1 - z0) > 1e-6
    assert np.all(b1 >= 0) and b1.max() <= 1 + 1e-12


def test_simple_format_still_loads(tmp_path):
    f = tmp_path / "simple.txt"
    f.write_text("hairpin_init -5.0\nstack CG GC 6.0\nml_close -4.0\n")
    p = load_params_file(str(f))
    assert p.hairpin_init == -5.0
    assert p.stack[0, 1] == 6.0
    assert p.ml_close == -4.0
