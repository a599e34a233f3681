"""Pallas TPU kernels for the hot paths (SURVEY.md §7 step 8).

`build_scene_clusters` rewires a Scene onto the cluster acceleration
structure and returns the Pallas nearest-hit hook for the integrator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.scene import Scene
from ..geometry.segments import Segments
from . import clusters, intersect_kernel


def build_scene_clusters(scene: Scene, cluster_size=128, block=256,
                         interpret=False):
    """-> (scene with cluster-ordered segments, Clusters, nearest_fn)."""
    segs = scene.segments
    cl = clusters.build(np.asarray(segs.p0), np.asarray(segs.p1),
                        np.asarray(segs.r0), np.asarray(segs.r1),
                        cluster_size=cluster_size)
    reordered = Segments(cl.s0[:, :3], cl.s1[:, :3], cl.s0[:, 3],
                         cl.s1[:, 3])
    sidx = np.asarray(cl.seg_index)
    smid = np.asarray(scene.seg_mat_id)[np.maximum(sidx, 0)]
    smid = np.where(sidx >= 0, smid, 0).astype(np.int32)
    scene2 = scene._replace(segments=reordered, accel=cl,
                            seg_mat_id=jnp.asarray(smid))
    fn = intersect_kernel.make_nearest_fn(cl, block=block,
                                          interpret=interpret)
    return scene2, cl, fn
