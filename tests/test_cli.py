"""End-to-end CLI tests: render and train drive the full stack through
``raytpu.cli.main`` exactly as a user would."""

import json
import os

import numpy as np
import pytest

from raytpu.cli import main


def test_render_png(tmp_path):
    out = str(tmp_path / "x.png")
    rc = main([
        "render", "cornell", "--spp", "4", "--width", "32", "--height",
        "24", "--out", out,
    ])
    assert rc == 0 and os.path.exists(out)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (24, 32, 3)
    assert img.mean() > 5  # not black


def test_render_ppm_scene_spec(tmp_path):
    out = str(tmp_path / "x.ppm")
    rc = main([
        "render", "scenes/cornell.toml", "--spp", "2", "--width", "16",
        "--height", "12", "--out", out,
    ])
    assert rc == 0
    from raytpu.io.ppm import read_ppm

    img = read_ppm(out, bottom_up=False)
    assert img.shape == (12, 16, 3)


def test_render_denoise_and_aov(tmp_path):
    out = str(tmp_path / "d.png")
    rc = main([
        "render", "cornell", "--spp", "2", "--width", "16", "--height",
        "12", "--out", out, "--denoise", "--aov",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "d_albedo.png"))
    assert os.path.exists(str(tmp_path / "d_normal.png"))


def test_render_checkpoint_preview_and_json(tmp_path, capsys):
    """--preview writes a preview PNG at every flush and --log-json emits
    machine-parseable progress lines (the monitor must actually be driven
    by the checkpointed render, SURVEY.md §5.5)."""
    out = str(tmp_path / "x.png")
    prev = str(tmp_path / "preview.png")
    ckpt = str(tmp_path / "state.npz")
    rc = main([
        "render", "cornell", "--spp", "4", "--width", "16", "--height",
        "12", "--out", out, "--checkpoint", ckpt, "--flush-every", "2",
        "--preview", prev, "--log-json",
    ])
    assert rc == 0 and os.path.exists(out)
    assert os.path.exists(prev), "--preview never wrote a file"
    from PIL import Image

    assert np.asarray(Image.open(prev)).shape == (12, 16, 3)
    json_lines = [
        json.loads(l)
        for l in capsys.readouterr().err.splitlines()
        if l.startswith("{")
    ]
    assert len(json_lines) == 2  # one per flush (spp=4 / flush_every=2)
    assert json_lines[-1]["samples"] == 4
    assert json_lines[-1]["rays_per_s"] > 0


def test_train_reduces_loss(tmp_path, capsys):
    # target = a render of the scene itself, so optimization must converge
    target = str(tmp_path / "t.png")
    main([
        "render", "cornell", "--spp", "4", "--width", "12", "--height",
        "8", "--out", target,
    ])
    out = str(tmp_path / "trained.png")
    rc = main([
        "train", "cornell", "--target", target, "--steps", "6",
        "--spp", "2", "--width", "12", "--height", "8", "--lr", "3e-2",
        "--out", out, "--log-every", "1",
    ])
    assert rc == 0 and os.path.exists(out)
    lines = [
        l for l in capsys.readouterr().out.splitlines()
        if l.startswith("step ")
    ]
    first = float(lines[0].split()[-1])
    last = float(lines[-1].split()[-1])
    assert last < first


def test_render_no_megakernel_escape_hatch(tmp_path, monkeypatch):
    """--no-megakernel and RAYTPU_NO_MEGAKERNEL=1 (ADVICE r4): the scan
    path stays reachable without editing code. On the CPU test harness
    the megakernel never runs anyway, so this asserts the flag paths
    execute and render identically to the default."""
    outs = []
    for args, env in (
        ([], None),
        (["--no-megakernel"], None),
        ([], "1"),
    ):
        if env is not None:
            monkeypatch.setenv("RAYTPU_NO_MEGAKERNEL", env)
        else:
            monkeypatch.delenv("RAYTPU_NO_MEGAKERNEL", raising=False)
        out = str(tmp_path / f"x{len(outs)}.png")
        rc = main([
            "render", "cornell", "--spp", "2", "--width", "16",
            "--height", "12", "--out", out, *args,
        ])
        assert rc == 0 and os.path.exists(out)
        from PIL import Image

        outs.append(np.asarray(Image.open(out)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
