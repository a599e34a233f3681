"""Acceleration structures (reference L3, SURVEY.md §2.4).

`build_scene_bvh` rewrites a Scene so its segment SoA is the BVH's
Morton-ordered padded layout and returns the matching traversal hook for
integrator.intersect_scene — hit indices then line up with shade_info's
gathers without an extra indirection on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.scene import Scene
from ..geometry.segments import Segments
from . import lbvh, traverse


def build_scene_bvh(scene: Scene, leaf_size=4):
    """-> (scene with reordered segments, DeviceBVH, nearest_fn)."""
    segs = scene.segments
    host = lbvh.build(np.asarray(segs.p0), np.asarray(segs.p1),
                      np.asarray(segs.r0), np.asarray(segs.r1),
                      leaf_size=leaf_size)
    dev = traverse.DeviceBVH.from_host(host)
    reordered = Segments(dev.p0, dev.p1, dev.r0, dev.r1)
    sidx = np.asarray(host.seg_index)
    smid = np.asarray(scene.seg_mat_id)[np.maximum(sidx, 0)]
    smid = np.where(sidx >= 0, smid, 0).astype(np.int32)
    scene2 = scene._replace(segments=reordered, accel=dev,
                            seg_mat_id=jnp.asarray(smid))
    return scene2, dev, traverse.make_nearest_fn(dev, reordered)
