from .shrinkwrap import cg_block, compute_ncc, SolverDiagnostics
