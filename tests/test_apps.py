"""CLI apps smoke tests (render / invert / convert) on tiny inputs."""

import json
import os

import numpy as np
import pytest


def test_render_cli(tmp_path, capsys):
    from yhair_tpu.apps import render
    out = tmp_path / "c1.png"
    hdr = tmp_path / "c1.pfm"
    render.main(["--config", "1", "--resolution", "24", "--spp", "2",
                 "--bounces", "2", "--output", str(out), "--hdr", str(hdr)])
    assert out.exists() and hdr.exists()
    from yhair_tpu.io import image
    img = image.load_hdr(str(hdr))
    assert img.shape == (24, 24, 3) and np.isfinite(img).all()


def test_render_cli_samplers(tmp_path):
    from yhair_tpu.apps import render
    for sampler in ("naive", "eyelight"):
        out = tmp_path / f"{sampler}.png"
        render.main(["--config", "1", "--resolution", "16", "--spp", "1",
                     "--bounces", "2", "--sampler", sampler,
                     "--output", str(out)])
        assert out.exists()


@pytest.mark.slow
def test_invert_cli(tmp_path):
    from yhair_tpu.apps import invert
    out = tmp_path / "rec.json"
    invert.main(["--config", "1", "--resolution", "16", "--spp", "2",
                 "--bounces", "2", "--steps", "6", "--params", "beta_m",
                 "--out", str(out)])
    rec = json.loads(out.read_text())
    assert "beta_m" in rec["recovered"]
    assert np.isfinite(rec["final_loss"])


def test_convert_cli(tmp_path):
    from yhair_tpu.apps import convert
    from yhair_tpu.io import hairfile, ply

    # make a tiny .hair file, convert to ply, then back
    rng = np.random.default_rng(0)
    counts = np.array([3, 3])
    pts = rng.normal(size=(8, 3))
    th = rng.uniform(1e-3, 3e-3, 8)
    hf = tmp_path / "w.hair"
    hairfile.save(str(hf), pts, counts, th)

    plyf = tmp_path / "w.ply"
    convert.main(["hair2ply", str(hf), str(plyf)])
    pos, rad, lines = ply.load_strands(str(plyf))
    assert lines.shape == (6, 2)  # 2 strands x 3 segments

    hf2 = tmp_path / "w2.hair"
    convert.main(["ply2hair", str(plyf), str(hf2)])
    h2 = hairfile.load(str(hf2))
    np.testing.assert_array_equal(h2["segments"], counts)

    sj = tmp_path / "s.json"
    convert.main(["genscene", "single_strand", str(sj)])
    assert sj.exists()

    # decimation keeps every other strand
    ply2 = tmp_path / "dec.ply"
    convert.main(["hair2ply", str(hf), str(ply2), "--decimate", "2"])
    _, _, lines2 = ply.load_strands(str(ply2))
    assert lines2.shape == (3, 2)
