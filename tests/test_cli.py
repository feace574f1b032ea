"""CLI end-to-end tests (in-process, CPU backend): train -> eval from
checkpoint -> export-torch -> reimport -> predict."""

import os

import numpy as np
import pytest

from insarseg.cli import main as cli_main
from insarseg.data.synthetic import make_synthetic_voc


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    make_synthetic_voc(str(d / "voc"), n_train=6, n_val=3, size=32)
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((48, 48)) * 255).astype(np.uint8), "L").save(
        str(d / "scene.png")
    )
    return d


BASE = ["--preset", "unet", "--image-size", "32", "--batch-size", "4"]


@pytest.mark.slow
def test_cli_train_eval_export_roundtrip(workdir):
    os.chdir(workdir)
    rc = cli_main(["train", *BASE, "--voc-root", "voc", "--num-epochs", "1",
                   "--model-save-path", "ckpt/m", "--metrics-save-path",
                   "hist.json"])
    assert rc == 0 and os.path.exists("hist.json")
    # checkpoints land in a per-run dir named after model_save_path minus
    # extension, so presets can't clobber each other's best/latest
    assert os.path.isdir("ckpt/m/best")

    rc = cli_main(["eval", *BASE, "--voc-root", "voc",
                   "--checkpoint", "ckpt/m", "--split", "val"])
    assert rc == 0

    rc = cli_main(["export-torch", *BASE, "--checkpoint", "ckpt/m",
                   "--output", "exported.pth"])
    assert rc == 0 and os.path.exists("exported.pth")

    rc = cli_main(["eval", *BASE, "--voc-root", "voc",
                   "--torch-checkpoint", "exported.pth", "--split", "val"])
    assert rc == 0


@pytest.mark.parametrize("engine", ["serve", "int8"])
def test_cli_eval_engines(workdir, engine, capsys):
    """eval --engine serve/int8 scores the serving engines on the val set
    (int8 self-calibrates on the first batch)."""
    os.chdir(workdir)
    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine", engine])
    assert rc == 0
    assert "val_miou" in capsys.readouterr().out


def test_cli_eval_int8_calib_split_train(workdir, capsys):
    """--calib-split train (round-4 verdict #6): calibration batches come
    from the train split while val is scored — the reported int8 mIoU is a
    deployment number, not self-referential. Both runs must score."""
    os.chdir(workdir)
    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine", "int8", "--calib-split", "train",
                   "--calib-batches", "1"])
    assert rc == 0
    out_train = capsys.readouterr().out
    assert "val_miou" in out_train
    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine", "int8", "--calib-split", "val",
                   "--calib-batches", "1"])
    assert rc == 0
    assert "val_miou" in capsys.readouterr().out


def test_cli_predict(workdir):
    os.chdir(workdir)
    rc = cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--output", "pred.png"])
    assert rc == 0
    from PIL import Image

    assert Image.open("pred.png").size == (48, 48)


def test_cli_predict_multi_scene(workdir):
    """Several --input scenes route through the batched multi-scene
    pipeline (same-shape scenes share one tile plan); a differently-sized
    scene lands in its own group; per-scene outputs match the single-scene
    path bit-for-bit."""
    os.chdir(workdir)
    from PIL import Image

    rng = np.random.default_rng(7)
    Image.fromarray((rng.random((48, 48)) * 255).astype(np.uint8), "L").save(
        "scene_b.png")
    Image.fromarray((rng.random((40, 56)) * 255).astype(np.uint8), "L").save(
        "scene_c.png")

    rc = cli_main(["predict", *BASE, "--input", "scene.png", "scene_b.png",
                   "scene_c.png", "--tile", "32", "--overlap", "8",
                   "--output", "multi_out"])
    assert rc == 0
    multi = {p: np.asarray(Image.open(os.path.join("multi_out",
                                                   p + "_pred.png")))
             for p in ("scene", "scene_b", "scene_c")}
    assert multi["scene"].shape == (48, 48)
    assert multi["scene_c"].shape == (40, 56)

    # single-scene reference runs (same weights: fresh-init is seeded by
    # the config, so both invocations build identical engines)
    for p in ("scene", "scene_b", "scene_c"):
        rc = cli_main(["predict", *BASE, "--input", p + ".png", "--tile",
                       "32", "--overlap", "8", "--output", p + "_single.png"])
        assert rc == 0
        single = np.asarray(Image.open(p + "_single.png"))
        np.testing.assert_array_equal(single, multi[p])


def test_cli_predict_basename_collision_uniquified(workdir):
    """Regression (round-4 advisor, low): two --input scenes with the same
    filename from different directories must not overwrite each other in
    --output; the second gets a numeric suffix."""
    os.chdir(workdir)
    from PIL import Image

    rng = np.random.default_rng(11)
    os.makedirs("dir_a", exist_ok=True)
    os.makedirs("dir_b", exist_ok=True)
    img_a = (rng.random((48, 48)) * 255).astype(np.uint8)
    img_b = (rng.random((48, 48)) * 255).astype(np.uint8)
    Image.fromarray(img_a, "L").save("dir_a/dup.png")
    Image.fromarray(img_b, "L").save("dir_b/dup.png")

    rc = cli_main(["predict", *BASE, "--input", "dir_a/dup.png",
                   "dir_b/dup.png", "--tile", "32", "--overlap", "8",
                   "--output", "dup_out"])
    assert rc == 0
    a = np.asarray(Image.open("dup_out/dup_pred.png"))
    b = np.asarray(Image.open("dup_out/dup_pred_2.png"))
    assert a.shape == b.shape == (48, 48)
    # distinct inputs -> the two files are genuinely different predictions
    assert not np.array_equal(img_a, img_b)


@pytest.mark.parametrize("engine", ["serve", "int8"])
@pytest.mark.slow
def test_cli_predict_fast_engines(workdir, engine):
    """predict --engine serve/int8 — UNet-CA, self-calibrated for int8."""
    os.chdir(workdir)
    base = ["--preset", "unet-channelattention", "--image-size", "32", "--batch-size", "4"]
    rc = cli_main(["predict", *base, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--engine", engine,
                   "--output", f"pred_{engine}.png"])
    assert rc == 0
    from PIL import Image

    assert Image.open(f"pred_{engine}.png").size == (48, 48)


def test_cli_predict_resnet_serve_engine(workdir):
    """predict --engine serve now covers the ResNet families
    (insarseg/models/resnet_serve.py)."""
    os.chdir(workdir)
    rc = cli_main(["predict", "--preset", "deeplabv3", "--image-size", "32",
                   "--input", "scene.png", "--tile", "32", "--overlap", "8",
                   "--engine", "serve", "--output", "pred_dl.png"])
    assert rc == 0
    from PIL import Image

    assert Image.open("pred_dl.png").size == (48, 48)


@pytest.mark.parametrize("engine", ["serve", "int8"])
def test_cli_predict_unet_sa_engines(workdir, engine):
    """UNet-SA runs on both fast engines via the folded STANDARD-layout
    graph (per-pixel gates in place / on codes)."""
    os.chdir(workdir)
    rc = cli_main(["predict", "--preset", "unet-spatialattention",
                   "--image-size", "32", "--input", "scene.png",
                   "--tile", "32", "--overlap", "8", "--engine", engine,
                   "--output", f"pred_sa_{engine}.png"])
    assert rc == 0


def test_cli_train_missing_dataset(workdir, capsys):
    os.chdir(workdir)
    rc = cli_main(["train", *BASE, "--voc-root", "/nonexistent"])
    assert rc == 2
    assert "dataset not found" in capsys.readouterr().err


def test_cli_export_torch_deeplab_roundtrip(workdir):
    """export-torch for the torchvision families: export a fresh deeplabv3
    init, reimport it, and check the two eval losses are bit-identical."""
    os.chdir(workdir)
    args = ["--preset", "deeplabv3", "--image-size", "32", "--batch-size", "4",
            "--seed", "7"]
    rc = cli_main(["export-torch", *args, "--output", "dl.pth"])
    assert rc == 0 and os.path.exists("dl.pth")

    import io
    from contextlib import redirect_stdout

    def eval_loss(extra):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli_main(["eval", *args, "--voc-root", "voc",
                           "--split", "val", *extra])
        assert rc == 0
        out = buf.getvalue()
        return out[out.index("val_loss") :]

    # fresh init with the same seed == the exported weights
    assert eval_loss([]) == eval_loss(["--torch-checkpoint", "dl.pth"])


def test_cli_export_torch_pspnet_rejected(workdir):
    os.chdir(workdir)
    rc = cli_main(["export-torch", "--model", "pspnet", "--image-size",
                   "32", "--output", "x.pth"])
    assert rc == 2


@pytest.mark.slow
def test_cli_train_resume(workdir):
    """Interrupt/resume: 1 epoch saved, then --resume continues to 3 epochs
    and the merged history has all three."""
    os.chdir(workdir)
    import json

    common = [*BASE, "--voc-root", "voc", "--model-save-path", "rck/m",
              "--metrics-save-path", "rhist.json"]
    rc = cli_main(["train", *common, "--num-epochs", "1"])
    assert rc == 0
    rc = cli_main(["train", *common, "--num-epochs", "3", "--resume"])
    assert rc == 0
    hist = json.load(open("rhist.json"))
    assert [h["epoch"] for h in hist] == [1, 2, 3]
    # resuming a finished run is a no-op that keeps the history intact
    rc = cli_main(["train", *common, "--num-epochs", "3", "--resume"])
    assert rc == 0
    assert [h["epoch"] for h in json.load(open("rhist.json"))] == [1, 2, 3]


@pytest.mark.slow
def test_cli_train_raw_u8(workdir):
    """--raw-u8 ships uint8 tiles; init + train must work from scratch."""
    os.chdir(workdir)
    rc = cli_main(["train", *BASE, "--voc-root", "voc", "--num-epochs", "1",
                   "--raw-u8", "--model-save-path", "u8ck/m",
                   "--metrics-save-path", "u8hist.json"])
    assert rc == 0 and os.path.exists("u8hist.json")


@pytest.mark.slow
def test_cli_engine_artifact_roundtrip_and_mismatch(workdir, capsys):
    """eval --save-engine writes an artifact; predict/eval --engine-artifact
    serve it; a config mismatch (wrong preset, conflicting --engine) is
    rejected instead of producing silently wrong metrics (round-3 advisor
    finding: cli.py never cross-checked the artifact against cfg)."""
    os.chdir(workdir)
    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine", "int8", "--calib-batches", "1",
                   "--save-engine", "unet_i8"])
    assert rc == 0 and os.path.exists("unet_i8.npz")
    capsys.readouterr()

    rc = cli_main(["predict", *BASE, "--engine-artifact", "unet_i8.npz",
                   "--input", "scene.png", "--tile", "32", "--overlap", "8",
                   "--output", "pred_art.png"])
    assert rc == 0 and os.path.exists("pred_art.png")

    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine-artifact", "unet_i8.npz"])
    assert rc == 0
    assert "val_miou" in capsys.readouterr().out

    # wrong preset: the artifact is a unet, the config says deeplabv3
    with pytest.raises(SystemExit, match="does not match"):
        cli_main(["eval", "--preset", "deeplabv3", "--image-size", "32",
                  "--batch-size", "4", "--voc-root", "voc",
                  "--engine-artifact", "unet_i8.npz"])
    # conflicting --engine: the artifact is packed int8, not serve
    with pytest.raises(SystemExit, match="conflicts"):
        cli_main(["eval", *BASE, "--voc-root", "voc", "--engine", "serve",
                  "--engine-artifact", "unet_i8.npz"])
    # explicit calib flags with an artifact: warned as ignored
    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--split", "val",
                   "--engine-artifact", "unet_i8.npz",
                   "--calib-batches", "8"])
    assert rc == 0
    assert "ignored" in capsys.readouterr().err


def test_cli_predict_unet_fast_variant(workdir):
    """The space-to-depth fast variant runs through predict with both the
    module engine and the int8 engine."""
    os.chdir(workdir)
    base = ["--preset", "unet-fast-ca", "--image-size", "32"]
    for extra, out in ((["--engine", "int8"], "pred_fast8.png"),
                       ([], "pred_fast.png")):
        rc = cli_main(["predict", *base, "--input", "scene.png", "--tile",
                       "32", "--overlap", "8", *extra, "--output", out])
        assert rc == 0
    from PIL import Image

    assert Image.open("pred_fast8.png").size == (48, 48)


# --- predict --stream (bounded-memory scene path, round 5) ----------------


def test_cli_predict_stream_matches_in_memory(workdir):
    """--stream (device-stitch band streaming + row argmax) agrees with the
    in-memory predict on the same scene, same fresh-init weights."""
    os.chdir(workdir)
    rc = cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--output", "mem.png"])
    assert rc == 0
    rc = cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--stream", "--output", "strm.png"])
    assert rc == 0
    from PIL import Image

    a = np.asarray(Image.open("mem.png"))
    b = np.asarray(Image.open("strm.png"))
    # identical up to near-tie argmax flips (forward batch shape differs)
    assert (a != b).mean() <= 1e-3


def test_cli_predict_stream_npy_memmap(workdir):
    """.npy input opens memmapped (the >RAM strip format) and matches the
    in-memory prediction of the same uint8 data saved as PNG."""
    os.chdir(workdir)
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (64, 80), np.uint8)
    np.save("strip.npy", arr)
    rc = cli_main(["predict", *BASE, "--input", "strip.npy", "--tile", "32",
                   "--overlap", "8", "--stream", "--output",
                   "strip_pred.png"])
    assert rc == 0
    from PIL import Image

    got = np.asarray(Image.open("strip_pred.png"))
    assert got.shape == (64, 80)
    Image.fromarray(arr, "L").save("strip.png")
    rc = cli_main(["predict", *BASE, "--input", "strip.png", "--tile", "32",
                   "--overlap", "8", "--output", "strip_mem.png"])
    assert rc == 0
    want = np.asarray(Image.open("strip_mem.png"))
    assert (got != want).mean() <= 1e-3


def test_cli_predict_stream_int8(workdir):
    """--stream --engine int8 self-calibrates from spread scene tiles."""
    os.chdir(workdir)
    rc = cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--stream", "--engine", "int8",
                   "--output", "strm_i8.png"])
    assert rc == 0 and os.path.exists("strm_i8.png")


def test_cli_predict_stream_small_scene_rejected(workdir):
    """Scenes smaller than the tile are told to drop --stream (the
    in-memory path pads them; the band streamer does not)."""
    os.chdir(workdir)
    with pytest.raises(SystemExit, match="drop --stream"):
        cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "64",
                  "--overlap", "8", "--stream"])
