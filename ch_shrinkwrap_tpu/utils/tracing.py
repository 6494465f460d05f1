"""Structured fit tracing / observability.

The reference's observability is wall-clock metadata plus per-iteration
history lists on the solver (SURVEY §5: `tests/ress/prefs`,
conj_grad.py:37-39,159-162, and `Processing.*.Runtime` metadata).  Here
every CG block and topology pass reports into a `FitTrace` — structured
per-iteration records (residual norm, orthogonality test, vertex/face
counts, areas, wall-clock) that can be dumped as JSONL — and
`jax.profiler` can be toggled around device blocks.
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class BlockRecord:
    kind: str                   # 'cg_block' | 'remesh' | 'necks' | ...
    iteration: int              # outer iteration index at block start
    wall_time: float
    n_vertices: int
    n_faces: int
    area: float
    tests: Optional[list] = None
    ress: Optional[list] = None
    extra: dict = field(default_factory=dict)


@dataclass
class FitTrace:
    records: List[BlockRecord] = field(default_factory=list)
    t_start: float = field(default_factory=time.time)

    def record(self, kind, iteration, wall_time, mesh, diag=None, **extra):
        # area is observability, not control flow: computing it fresh
        # is a full face-geometry pass (~60 ms at 330k faces, and the
        # fit invalidates geometry before every record — measured ~1.5 s
        # of a warm north-star e2e).  Record it when the mesh's cache is
        # already warm or the mesh is small; -1.0 marks 'not computed'.
        if (getattr(mesh, '_face_areas_cache', None) is not None
                or mesh.faces.shape[0] <= 100_000):
            area = float(mesh.area())
        else:
            area = -1.0
        rec = BlockRecord(
            kind=kind, iteration=iteration, wall_time=wall_time,
            n_vertices=int(mesh.vertices.shape[0]),
            n_faces=int(mesh.faces.shape[0]),
            area=area,
            # one bulk fetch per array: per-element float(x) on a
            # device array costs one tunnel round trip PER ELEMENT
            tests=None if diag is None else
            np.asarray(diag.tests).astype(float).tolist(),
            ress=None if diag is None else
            np.asarray(diag.ress).astype(float).tolist(),
            extra=extra)
        self.records.append(rec)
        return rec

    @property
    def total_time(self):
        return time.time() - self.t_start

    def summary(self):
        by_kind = {}
        for r in self.records:
            by_kind.setdefault(r.kind, [0, 0.0])
            by_kind[r.kind][0] += 1
            by_kind[r.kind][1] += r.wall_time
        return {k: {'count': c, 'seconds': round(s, 3)}
                for k, (c, s) in by_kind.items()}

    def dump_jsonl(self, path):
        with open(path, 'w') as fh:
            for r in self.records:
                fh.write(json.dumps({
                    'kind': r.kind, 'iteration': r.iteration,
                    'wall_time': r.wall_time,
                    'n_vertices': r.n_vertices, 'n_faces': r.n_faces,
                    'area': r.area, 'tests': r.tests, 'ress': r.ress,
                    **r.extra}) + '\n')


@contextlib.contextmanager
def device_profile(out_dir=None):
    """Wrap a region in jax.profiler tracing when out_dir is given."""
    if out_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
