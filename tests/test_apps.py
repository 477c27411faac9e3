"""Application-layer smoke tests: the CLI and app entry points run end to
end on tiny inputs and write sane artifacts (the reference's executables,
SURVEY §2.1, minus the interactive viewers)."""

import os

import numpy as np
import pytest

from stereomatch_tpu.io import load_image, save_image


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    """A small textured synthetic pair written to disk for the CLI."""
    rng = np.random.default_rng(8)
    h, w, true_d = 48, 96, 6
    base = (rng.random((h, w + true_d, 3)) * 255).astype(np.float32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    left = base[:, :w].astype(np.uint8)
    right = base[:, true_d : true_d + w].astype(np.uint8)
    d = tmp_path_factory.mktemp("cli")
    lp, rp = os.path.join(d, "l.png"), os.path.join(d, "r.png")
    save_image(lp, left)
    save_image(rp, right)
    return str(d), lp, rp, true_d


@pytest.mark.parametrize("alg", ["bm", "hh", "census"])
def test_cli_engines_write_disparity(tiny_pair, alg):
    from stereomatch_tpu.apps.cli import main

    d, lp, rp, true_d = tiny_pair
    out = os.path.join(d, f"disp_{alg}.png")
    rc = main([lp, rp, "--algorithm", alg, "--max-disparity", "16",
               "--no-rectify", "-o", out])
    assert rc == 0 and os.path.exists(out)
    img = load_image(out)
    assert img.shape[:2] == (48, 96)
    assert img.max() > 0  # something was estimated


def test_cli_cloud_requires_calib(tiny_pair, capsys):
    from stereomatch_tpu.apps.cli import main

    d, lp, rp, _ = tiny_pair
    rc = main([lp, rp, "--algorithm", "hh", "--max-disparity", "16",
               "--no-rectify", "-p", os.path.join(d, "c.ply")])
    assert rc == 1  # cloud output needs -i calibration


def test_stereo_test_app_runs(tmp_path):
    """The StereoTest equivalent end to end at 1/8 scale on the bundled
    FLIR frame (rectify -> SGBM -> Q reprojection -> cloud files)."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps.stereo_test import run

    out = run(
        data_dir="/root/reference/build",
        frame_id=20,
        calib="/root/reference/cam_stereo_pheno.yml",
        out_dir=str(tmp_path),
        num_disp_factor=4,
        scale=0.125,
        verbose=False,
    )
    files = os.listdir(tmp_path)
    assert any(f.endswith(".png") for f in files), files
    assert any(f.endswith(".pcd") for f in files), files


def test_stream_resume_skips_done(tmp_path, monkeypatch):
    """--resume: frames with existing outputs are skipped (the streaming
    checkpoint/restart story; the per-frame artifacts are the checkpoints)."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps import stream

    # pretend both frames are already done: run() must be a no-op
    for fid in (20, 40):
        open(os.path.join(tmp_path, f"stream_disp_{fid:06d}.png"), "wb").close()
    out = stream.run(
        "/root/reference/build", "/root/reference/cam_stereo_pheno.yml",
        str(tmp_path), ids=(20, 40), scale=0.125, max_disp=15,
        verbose=False, resume=True,
    )
    assert out.size == 0  # nothing recomputed


def test_stereo_yin_app_runs(tmp_path):
    """The StereoYin equivalent end to end at 1/8 scale with the built-in
    volume and a short iteration budget (rectify -> 3DMST -> artifacts)."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps.stereo_yin import run

    run(
        data_dir="/root/reference/build",
        frame_id=20,
        calib="/root/reference/cam_stereo_pheno.yml",
        out_dir=str(tmp_path),
        max_disp=24,
        iterations=6,
        scale=0.125,
        verbose=False,
    )
    files = os.listdir(tmp_path)
    assert any(f.endswith(".png") for f in files), files


def test_stream_mst_overlapped_forest_build(tmp_path):
    """Streaming 3DMST with lookahead forest construction: two frames end
    to end at 1/16 scale; outputs written, disparities in range, and the
    per-frame forest-wait record exists (frame N+1 builds while N
    optimizes — the wait is the residual blocking time)."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps import stream

    disps, waits = stream.run_mst(
        "/root/reference/build", "/root/reference/cam_stereo_pheno.yml",
        str(tmp_path), ids=(20, 40), scale=1 / 16.0, max_disp=16,
        iterations=4, verbose=False,
    )
    assert disps.shape[0] == 2 and len(waits) == 2
    assert np.isfinite(disps).all()
    assert disps.max() <= 16.0 and disps.min() >= 0.0
    for fid in (20, 40):
        assert os.path.exists(os.path.join(tmp_path, f"stream_mst_{fid:06d}.png"))
    # resume skips everything
    disps2, _ = stream.run_mst(
        "/root/reference/build", "/root/reference/cam_stereo_pheno.yml",
        str(tmp_path), ids=(20, 40), scale=1 / 16.0, max_disp=16,
        iterations=4, verbose=False, resume=True,
    )
    assert disps2.size == 0


def test_stream_mst_temporal_video_mode(tmp_path):
    """VIDEO mode end to end: frame 0 SGBM-seeded, frame 1 seeded from
    frame 0's refined maps (temporal_reseed=0 -> keyframe only at start).
    Quality is gated on the GT sequence (tests/test_mst_video.py); this
    is the app-layer wiring smoke."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps import stream

    disps, waits = stream.run_mst(
        "/root/reference/build", "/root/reference/cam_stereo_pheno.yml",
        str(tmp_path), ids=(20, 40), scale=1 / 16.0, max_disp=16,
        iterations=2, verbose=False, sgbm_seed=True, temporal_reseed=0,
    )
    assert disps.shape[0] == 2 and len(waits) == 2
    assert np.isfinite(disps).all()
    assert disps.max() <= 16.0 and disps.min() >= 0.0


def test_stream_mst_scene_cut_reseed(tmp_path, capsys):
    """Video mode + scene_cut_ratio: with a near-1 threshold the
    000020->000040 jump (a hard scene change, not a smooth video step —
    measured round 5) forces the temporal frame to reseed as a
    keyframe; the reseed is reported. App-layer wiring for the
    serving-layer detector (test_video_server_scene_cut_detection)."""
    if not os.path.isdir("/root/reference/build"):
        pytest.skip("reference data not mounted")
    from stereomatch_tpu.apps import stream

    disps, _ = stream.run_mst(
        "/root/reference/build", "/root/reference/cam_stereo_pheno.yml",
        str(tmp_path), ids=(20, 40), scale=1 / 16.0, max_disp=16,
        iterations=2, verbose=True, sgbm_seed=True, temporal_reseed=0,
        scene_cut_ratio=0.98,
    )
    out = capsys.readouterr().out
    assert "scene cuts (reseeded frames): 000040" in out, out[-500:]
    assert disps.shape[0] == 2 and np.isfinite(disps).all()
