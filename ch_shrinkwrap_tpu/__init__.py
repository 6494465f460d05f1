"""ch_shrinkwrap_tpu — TPU-native NanoWrap.

A from-scratch JAX/XLA/Pallas re-design of the NanoWrap algorithm
(fitting a triangular membrane mesh through SMLM localization clouds
under a Canham-Helfrich curvature constraint), with the same user-facing
capabilities as the reference `python-microscopy/ch-shrinkwrap` plugin.

Layer map (TPU-first, not a port):

- ``sim``      — SDF primitives, CSG shape library, SMLM point-cloud
                 simulation (host-side data generation, NumPy + seeded RNG).
- ``mesh``     — SoA halfedge triangle mesh (host topology engine):
                 build from (V, F), remesh (split/collapse/flip), repair,
                 component labeling, STL/PLY I/O.
- ``ops``      — device compute: one-ring curvature tensor kernel,
                 nearest-face correspondence (blocked MXU matmul /
                 grid hash), gather/scatter sparse operators.
- ``solver``   — Tikhonov-regularized subspace conjugate-gradient solver,
                 fully device-resident under ``jax.jit`` / ``lax.fori_loop``.
- ``models``   — the flagship ``MembraneMesh`` driver (shrink_wrap with
                 remeshing schedule, neck removal, hole punching) and
                 ``SkeletonMesh`` (mean-curvature-flow skeletonization).
- ``parallel`` — ``jax.sharding.Mesh`` / ``shard_map`` multi-chip path:
                 localization cloud sharded over devices, psum-reduced
                 scatter adds; pmap/vmap sweep runner.
- ``recipes``  — the user-facing declarative API (recipe modules with the
                 reference's parameter names/defaults) + YAML runner.
- ``eval``     — evaluation harness: SDF-oracle metrics (bidirectional
                 NN-MSE, Hausdorff ordered pairs), sweep expansion,
                 competitor wrappers (screened Poisson, alpha wrap).
"""

__version__ = "0.1.0"
