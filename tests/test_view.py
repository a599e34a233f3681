"""Viewer smoke test (VERDICT r3 weak #4: apps/view.py had zero automated
coverage). Drives the progressive viewer for a few passes with a live
edits file on the CPU backend and checks the preview + edit-restart
behavior — the reference's yscnitrace edit loop (SURVEY.md §3.2)."""

import json
import os

import numpy as np


def test_view_smoke(tmp_path, capsys):
    from yhair_tpu.apps import view

    out = tmp_path / "view.png"
    edits = tmp_path / "edits.json"
    view.main(["--config", "1", "--resolution", "32", "--bounces", "2",
               "--output", str(out), "--edits", str(edits),
               "--max-passes", "2", "--accel", "brute",
               "--platform", "cpu"])
    assert out.exists()
    from yhair_tpu.io import image as img_io
    img1 = img_io.load_png(out)
    assert img1.shape == (32, 32, 3)
    assert np.isfinite(img1).all()

    # an edits file present from pass 0 applies (melanin must produce a
    # (3,) sigma_a — ADVICE r3: a [0] indexing bug collapsed it to R)
    edits.write_text(json.dumps({"melanin": [1.3, 0.2],
                                 "beta_m": 0.15, "exposure": 0.5,
                                 "bogus_key": 1}))
    view.main(["--config", "1", "--resolution", "32", "--bounces", "2",
               "--output", str(out), "--edits", str(edits),
               "--max-passes", "3", "--accel", "brute",
               "--platform", "cpu"])
    cap = capsys.readouterr().out
    assert "ignoring unknown edit key 'bogus_key'" in cap
    assert out.exists()


def test_view_edit_applies_melanin_vector():
    """_apply_edits unit check: melanin edit yields a full-color sigma_a."""
    from yhair_tpu.apps.common import force_platform
    force_platform("cpu")
    from scenes.generators import single_strand
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.apps.view import _apply_edits
    from oracle.hair_bsdf import sigma_a_from_concentration

    scene_d, cam_d = single_strand()
    sc = jscene.from_dict(scene_d)
    sc2, _cd, _cam, tm = _apply_edits({"melanin": [1.3, 0.2]}, sc, cam_d,
                                      {"exposure": 0.0, "filmic": False})
    sa = np.asarray(sc2.hair.sigma_a)
    assert sa.shape == (3,)
    np.testing.assert_allclose(sa, sigma_a_from_concentration(1.3, 0.2),
                               rtol=1e-6)
    assert not np.allclose(sa, sa[0])  # actually chromatic
