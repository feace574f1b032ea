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


def test_cli_train_eval_export_roundtrip(workdir):
    os.chdir(workdir)
    rc = cli_main(["train", *BASE, "--voc-root", "voc", "--num-epochs", "1",
                   "--model-save-path", "ckpt/m", "--metrics-save-path",
                   "hist.json"])
    assert rc == 0 and os.path.exists("hist.json")
    assert os.path.isdir("ckpt/best")

    rc = cli_main(["eval", *BASE, "--voc-root", "voc", "--checkpoint", "ckpt",
                   "--split", "val"])
    assert rc == 0

    rc = cli_main(["export-torch", *BASE, "--checkpoint", "ckpt",
                   "--output", "exported.pth"])
    assert rc == 0 and os.path.exists("exported.pth")

    rc = cli_main(["eval", *BASE, "--voc-root", "voc",
                   "--torch-checkpoint", "exported.pth", "--split", "val"])
    assert rc == 0


def test_cli_predict(workdir):
    os.chdir(workdir)
    rc = cli_main(["predict", *BASE, "--input", "scene.png", "--tile", "32",
                   "--overlap", "8", "--output", "pred.png"])
    assert rc == 0
    from PIL import Image

    assert Image.open("pred.png").size == (48, 48)


def test_cli_train_missing_dataset(workdir, capsys):
    os.chdir(workdir)
    rc = cli_main(["train", *BASE, "--voc-root", "/nonexistent"])
    assert rc == 2
    assert "dataset not found" in capsys.readouterr().err


def test_cli_export_torch_non_unet_rejected(workdir):
    os.chdir(workdir)
    rc = cli_main(["export-torch", "--preset", "deeplabv3", "--image-size",
                   "32", "--output", "x.pth"])
    assert rc == 2
