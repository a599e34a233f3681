"""Checkpoint/resume: interrupted progressive renders must be bit-exact."""

import numpy as np
import jax

from scenes import generators as gen
from yhair_tpu.apps.common import build_device_scene, progressive_render
from yhair_tpu.utils import checkpoint as ckpt
import pytest


def _quiet(*a, **k):
    pass


@pytest.mark.slow
def test_progressive_resume_bit_exact(tmp_path):
    scene_d, cam_d = gen.single_strand()
    sc, cam, nearest = build_device_scene(scene_d, cam_d, use_bvh=False)

    # uninterrupted: 4 spp straight through
    img_full = progressive_render(sc, cam, nearest, 16, 16, 4, 2, seed=3,
                                  log=_quiet)

    # interrupted: 2 spp, checkpoint, then resume for the rest
    ck = tmp_path / "render.ckpt.npz"
    img_half = progressive_render(sc, cam, nearest, 16, 16, 2, 2, seed=3,
                                  checkpoint=str(ck), log=_quiet)
    st = ckpt.load_render_state(str(ck))
    assert st["next_sample"] == 2
    img_resumed = progressive_render(sc, cam, nearest, 16, 16, 4, 2, seed=3,
                                     checkpoint=str(ck), log=_quiet)
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-7)
    # and the half render actually differs (different sample counts)
    assert np.abs(img_half - img_full).max() > 0


def test_train_state_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax
    params = {"beta_m": jnp.float32(0.4),
              "sigma_a": jnp.asarray([0.1, 0.2, 0.3], jnp.float32)}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = tmp_path / "train.ckpt.npz"
    ckpt.save_train_state(str(path), params, opt_state, step=17, seed=5)
    p2, o2, step, seed = ckpt.load_train_state(str(path), params, opt_state)
    assert step == 17 and seed == 5
    np.testing.assert_allclose(p2["sigma_a"], params["sigma_a"])
    # optimizer state trees match leaf-for-leaf
    f1 = jax.tree.leaves(opt_state)
    f2 = jax.tree.leaves(o2)
    assert len(f1) == len(f2)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
