"""ERSim raw-NN-Hausdorff tail diagnostic (VERDICT r3 weak #5).

Loads the fitted ERSim mesh (STL from the harness run), samples its
surface, evaluates the truth SDF at every sample, and characterizes
the worst tail: where the deep samples sit, their sign (inside the
truth solid vs outside), and whether they cluster at the sheet-tubule
pocket geometry or on an unfit patch.  Writes a JSON artifact next to
the metrics.

Usage: python scripts/ersim_tail_diag.py <out_dir> [shape_params_json]
"""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

out_dir = sys.argv[1] if len(sys.argv) > 1 else 'eval_out_ersim_r4'

from ch_shrinkwrap_tpu.mesh import io as mesh_io
from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.eval.metrics import points_from_mesh
from ch_shrinkwrap_tpu.sim import shape as shapes

rows = [json.loads(l) for l in open(os.path.join(out_dir,
                                                 'metrics.jsonl'))]
row = rows[0]
params = row['params']
if isinstance(params, str):
    params = json.loads(params)
sp = params['shape_params']
if isinstance(sp, str):
    sp = eval(sp)  # trusted: our own harness wrote it
sp = {k: v for k, v in sp.items()
      if k not in ('expected_euler', 'expected_components')}
shape = getattr(shapes, params['shape_name'])(**sp)

stls = sorted(glob.glob(os.path.join(out_dir, '*.stl')))
assert stls, 'run the harness with --stl first'
v, f = mesh_io.load_stl(stls[0])
mesh = TriangleMesh(v, f)
rng = np.random.default_rng(0)
pts, nrm = points_from_mesh(mesh, dx_min=5.0, p=1.0,
                            return_normals=True, rng=rng)
d = np.asarray(shape.sdf(pts.T))
ad = np.abs(d)

thr99 = float(np.percentile(ad, 99.0))
worst = ad >= max(thr99, 25.0)
wp = pts[worst]
wd = d[worst]

# cluster the worst samples spatially (grid cells at 40 nm)
cell = np.floor(wp / 40.0).astype(np.int64)
key = (cell[:, 0] * 100003 + cell[:, 1]) * 100003 + cell[:, 2]
uniq, inv = np.unique(key, return_inverse=True)
clusters = []
for i in range(len(uniq)):
    m = inv == i
    if m.sum() < 3:
        continue
    clusters.append({
        'centroid': [round(float(x), 1) for x in wp[m].mean(0)],
        'n_samples': int(m.sum()),
        'depth_mean': round(float(np.abs(wd[m]).mean()), 1),
        'depth_max': round(float(np.abs(wd[m]).max()), 1),
        'frac_inside_truth': round(float((wd[m] < 0).mean()), 2),
    })
clusters.sort(key=lambda c: -c['depth_max'])

# pocket reference: ERSim's deep pockets are where sheets meet the
# tubule loop; sample the TRUTH surface and measure, for each worst
# cluster, the local truth-surface "pocket depth" (distance from the
# cluster centroid to the nearest truth-surface sample vs its |sdf|:
# for a point bridging a pocket these agree; for an unfit patch far
# from any truth surface they also agree — the discriminator is the
# mesh-to-mesh distance below)
# unfit-patch test: distance from each worst sample to the FIT mesh's
# own nearest point is 0 by construction; instead measure how much
# fit surface AREA sits deep: fraction of all samples beyond 25/50 nm
# cloud support at each cluster: regenerate the harness cloud (same
# params, same seed) and query nearest localizations — a cluster held
# up by 1-2 isolated points with the next neighbors far away is the
# fit wrapping BACKGROUND NOISE, not a pocket bridge or an unfit patch
from ch_shrinkwrap_tpu.sim.pointcloud import \
    generate_smlm_pointcloud_from_shape
from scipy.spatial import cKDTree


def _fl(x):
    try:
        return float(x)
    except (TypeError, ValueError):
        return x


cloud, _, _ = generate_smlm_pointcloud_from_shape(
    params['shape_name'], sp, density=_fl(params['density']),
    p=_fl(params['p']),
    psf_width=(eval(params['psf_width'])
               if isinstance(params['psf_width'], str)
               else tuple(map(float, params['psf_width']))),
    mean_photon_count=_fl(params['mean_photon_count']),
    bg_photon_count=_fl(params['bg_photon_count']),
    noise_fraction=_fl(params['noise_fraction']), rng=0)
tree = cKDTree(cloud)
for c in clusters:
    dd, _ = tree.query(np.asarray(c['centroid'], float), k=8)
    c['nearest_cloud_pts'] = [round(float(x), 1) for x in dd]

summary = {
    'n_mesh_samples': int(len(pts)),
    'sdf_hausdorff': round(float(ad.max()), 1),
    'sdf_p99': round(thr99, 1),
    'frac_beyond_25nm': round(float((ad > 25).mean()), 5),
    'frac_beyond_50nm': round(float((ad > 50).mean()), 5),
    'frac_beyond_100nm': round(float((ad > 100).mean()), 6),
    'worst_tail_sign_inside_truth': round(float((wd < 0).mean()), 3),
    'clusters': clusters[:12],
}
out_fp = os.path.join(out_dir, 'tail_diagnostic.json')
json.dump(summary, open(out_fp, 'w'), indent=1)
print(json.dumps(summary, indent=1))
print('wrote', out_fp)
