"""Per-level saved outputs of the six reference convergence-study notebooks.

Extracted verbatim from the ``Overall error:`` stream outputs of
``/root/reference/*_reghcstriple_convergence_study.ipynb`` (cells 9/10/11 and
12/13).  These are the ground-truth values REPRODUCTION.md compares against.

Notes on protocols (from the notebook cell sources):

* spatial (cell 9): N = 2·2^k, k=0..7, dt = h^1.5; Tf = 0.01 for pol/expsin
  and 1.0 for nfsp*/peaks; eta = 50.
* temporal (cell 11; cell 10 in the nfsp_H2H2 notebook): dt = base_dt/2^k.
  Fixed grid for five studies; the peaks study recomputes N = ceil(1/(2·dt))
  per level inside the loop (its FIXED_GRID_SIZE=200 is dead code), which is
  why its first two levels (N=1, all-boundary grids) are exactly 0.0.
* eta (cell 13; cell 12 in nfsp_H2H2): N=32, dt=5e-4, Tf=0.01,
  eta in {10,50,100,200,300,500,1000} — identical protocol in all six.
* model constants: the pol and peaks notebooks use Dl_max=8.01e-4,
  Dd_max=2.46e-6; the other four use Dl_max=1e-5, Dd_max=1e-6.

The pol notebook prints 6 significant digits; the others print 13.
"""

REFERENCE_ERRORS = {
    ("pol", "spatial"): [
        4.93452e-05, 1.59616e-05, 4.28269e-06, 1.08800e-06,
        2.75006e-07, 6.96085e-08, 1.74802e-08, 4.38284e-09,
    ],
    ("expsin", "spatial"): [
        1.942652829989e-05, 5.197056624911e-06, 1.322695968641e-06,
        3.372248813359e-07, 8.344194130557e-08, 2.052209700229e-08,
        5.119616858484e-09, 1.278782670173e-09,
    ],
    ("nfsp_cpcsH1_TclcdH2", "spatial"): [
        1.387299517318e-05, 8.822763874973e-05, 3.383480896506e-05,
        1.517524996184e-05, 3.747930839694e-06, 6.816794044645e-07,
        2.799670822833e-07, 8.645407062247e-08,
    ],
    ("nfsp_cpcsH2_TclcdH2", "spatial"): [
        1.877869516145e-05, 2.037364736137e-05, 8.851905299491e-06,
        3.085671522449e-06, 8.603180933041e-07, 2.660430202155e-07,
        8.453466133015e-08, 7.641023132398e-08,
    ],
    ("nfsp_cpcsH2_TclcdH3", "spatial"): [
        1.706334182719e-05, 1.734312300666e-05, 8.519357549781e-06,
        2.640813480048e-06, 7.168895437498e-07, 1.844956739082e-07,
        4.710500390333e-08, 1.180466192215e-08,
    ],
    ("peaks_fast1e1", "spatial"): [
        3.410697138975e-01, 2.998593199634e-01, 4.558178972447e-02,
        6.673442252443e-03, 1.083722320571e-03, 2.251962441053e-04,
        5.355729294822e-05, 1.329324479086e-05,
    ],
    ("pol", "temporal"): [3.60101e-08, 8.49854e-09, 4.01980e-09, 4.18199e-09],
    ("expsin", "temporal"): [
        1.036215100290e-07, 8.344194130557e-08, 8.193792525959e-08,
        8.181573405295e-08, 8.180115032463e-08, 8.179850160373e-08,
    ],
    ("nfsp_cpcsH2_TclcdH3", "temporal"): [
        2.293853773997e-10, 1.984988392477e-10,
        2.134913177290e-10, 2.184209586590e-10,
    ],
    ("nfsp_cpcsH2_TclcdH2", "temporal"): [
        1.336453753218e-09, 1.169004286281e-09,
        1.132086126593e-09, 1.123260655389e-09,
    ],
    ("nfsp_cpcsH1_TclcdH2", "temporal"): [
        1.713006210334e-09, 1.353723332525e-09,
        1.365070781516e-09, 1.374905111409e-09,
    ],
    ("peaks_fast1e1", "temporal"): [
        0.0, 0.0, 7.108884464820e-01, 9.864776561636e-01,
        3.221709152999e-01, 8.453668420359e-02, 2.135342688180e-02,
        5.351596147453e-03, 1.338721547608e-03,
    ],
    ("pol", "eta"): [2.78759e-07] * 7,
    ("expsin", "eta"): [
        8.179982876369e-08, 8.179982920798e-08, 8.179982937825e-08,
        8.179982942569e-08, 8.179982943273e-08, 8.179982943698e-08,
        8.179982943940e-08,
    ],
    ("nfsp_cpcsH1_TclcdH2", "eta"): [
        7.360771456680e-08, 7.360771456678e-08, 7.360771456676e-08,
        7.360771456673e-08, 7.360771456671e-08, 7.360771456671e-08,
        7.360771456676e-08,
    ],
    ("nfsp_cpcsH2_TclcdH2", "eta"): [
        1.335768487783e-08, 1.335768487784e-08, 1.335768487785e-08,
        1.335768487788e-08, 1.335768487790e-08, 1.335768487794e-08,
        1.335768487802e-08,
    ],
    ("nfsp_cpcsH2_TclcdH3", "eta"): [
        1.324294360382e-08, 1.324294360382e-08, 1.324294360383e-08,
        1.324294360383e-08, 1.324294360384e-08, 1.324294360385e-08,
        1.324294360388e-08,
    ],
    ("peaks_fast1e1", "eta"): [
        7.498440503481e-05, 7.498440503313e-05, 7.498440503312e-05,
        7.498440503312e-05, 7.498440503312e-05, 7.498440503312e-05,
        7.498440503312e-05,
    ],
}

# Finest-level wall-clock (seconds) from the notebooks' saved outputs
# (author CPU; BASELINE.md).
REFERENCE_FINEST_WALLCLOCK = {
    ("pol", "spatial"): 280.4,
    ("expsin", "spatial"): 247.1,
    ("nfsp_cpcsH2_TclcdH3", "spatial"): 24204.0,
    ("nfsp_cpcsH2_TclcdH2", "spatial"): 23092.0,
    ("nfsp_cpcsH1_TclcdH2", "spatial"): 24416.0,
    ("peaks_fast1e1", "spatial"): 25145.0,
    ("pol", "temporal"): 24.5,
    ("expsin", "temporal"): 2.11,
    ("nfsp_cpcsH2_TclcdH2", "temporal"): 32.6,
    ("nfsp_cpcsH2_TclcdH3", "temporal"): 25.3,
    ("nfsp_cpcsH1_TclcdH2", "temporal"): 58.96,
    ("peaks_fast1e1", "temporal"): 2108.5,
    # eta sweeps: the reference runs the 7 factors serially; the comparable
    # number is the SUM of its per-factor "Completed in ... seconds" lines
    # (each notebook's eta cell; cell 12 in nfsp_H2H2, cell 13 elsewhere)
    # since our sweep integrates all 7 in one vmapped program.
    ("pol", "eta"): 4.64,
    ("expsin", "eta"): 10.60,
    ("nfsp_cpcsH2_TclcdH3", "eta"): 4.98,
    ("nfsp_cpcsH2_TclcdH2", "eta"): 6.96,
    ("nfsp_cpcsH1_TclcdH2", "eta"): 8.92,
    ("peaks_fast1e1", "eta"): 7.75,
}

# Final observed 3-point rates as reported by the notebooks.
REFERENCE_FINAL_RATE = {
    ("pol", "spatial"): 1.993,
    ("expsin", "spatial"): 2.004,
    ("nfsp_cpcsH2_TclcdH3", "spatial"): 1.961,
    ("nfsp_cpcsH2_TclcdH2", "spatial"): 4.482,
    ("nfsp_cpcsH1_TclcdH2", "spatial"): 1.054,
    ("peaks_fast1e1", "spatial"): 2.092,
    ("expsin", "temporal"): 2.461,
    ("nfsp_cpcsH2_TclcdH2", "temporal"): 2.065,
    ("peaks_fast1e1", "temporal"): 1.996,
}
