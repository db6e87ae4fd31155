"""Census of exact neighbor-search call shapes in the parity-bench
forwards (CPU trace; shapes are trace-time so iteration bodies count
once — multiply per-iter ops by the iteration count).  Redirected the
r4 parity attack: the heavy exact shapes are NOT the 8192x8192 loss
shapes (BENCHLOG r4).  Usage: python tools/shape_census.py
"""

import os
os.environ["OGC_PLATFORM"] = "cpu"
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
from ogc_tpu import ops
from ogc_tpu.ops import core

calls = []
_knn, _ball, _3nn = ops.knn, ops.ball_query, ops.three_nn
def knn(k, q, p, **kw):
    calls.append(("knn", k, tuple(q.shape), tuple(p.shape)))
    return _knn(k, q, p, **kw)
def ball(r, ns, xyz, ctr, **kw):
    calls.append(("ball", (r, ns), tuple(ctr.shape), tuple(xyz.shape)))
    return _ball(r, ns, xyz, ctr, **kw)
def tnn(u, k, **kw):
    calls.append(("3nn", 3, tuple(u.shape), tuple(k.shape)))
    return _3nn(u, k, **kw)
for mod in [ops, core]:
    mod.knn = knn; mod.ball_query = ball; mod.three_nn = tnn
import ogc_tpu.nn.pointnet2 as pn2, ogc_tpu.nn.flowstep3d as fs3, ogc_tpu.models.flownet as fln
for m in (pn2, fs3, fln):
    if hasattr(m, "ops"): m.ops = ops
fln._ops = ops

from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.models.flownet import FlowStep3D

N = 8192
pc = jnp.asarray(30.0 * np.random.RandomState(0).rand(1, N, 3).astype(np.float32))
segnet = MaskFormer3D(n_slot=10, n_point=N, arch="kitti", n_transformer_layer=2, transformer_embed_dim=128)
p = segnet.init(jax.random.PRNGKey(0), pc, pc)
calls.clear()
segnet.apply(p, pc, pc)
print("== segnet fwd =="); 
from collections import Counter
for c, n in Counter(calls).items(): print(n, "x", c)

flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5, loc_flow_nn=16, loc_flow_rad=1.5)
v = flownet.init(jax.random.PRNGKey(1), pc, pc, pc, pc, 2)
calls.clear()
flownet.apply(v, pc, pc, pc, pc, 5, train=False)
print("== flownet fwd 5 iters ==")
for c, n in Counter(calls).items(): print(n, "x", c)
