"""Generate independent torchvision golden fixtures (run OFFLINE, where
torchvision is installed — it is not available in this sandbox).

Produces tests/fixtures/torchvision_{deeplabv3,fcn}_r50.npz consumed by
tests/test_torchvision_fixture.py. To keep the fixture tiny (the full
state_dict would be ~260 MB) the weights are NOT stored: every parameter
and buffer of the torchvision model is filled deterministically from one
numpy PRNG in sorted-name order, so the test can reconstruct the identical
state_dict without torch/torchvision. The fixture stores only

  - the sorted (name, shape) manifest (to pin the architecture wiring),
  - one input tile, and
  - the reference logits produced by real torchvision code.

Usage (offline):  python tests/make_torchvision_fixture.py
"""

from __future__ import annotations

import json
import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def fill_state_dict(names_shapes):
    """Deterministic, version-independent tensor content for a manifest."""
    rng = np.random.default_rng(20260816)
    out = {}
    for name, shape in names_shapes:
        if name.endswith("num_batches_tracked"):
            out[name] = np.zeros(shape, np.int64)
        elif name.endswith("running_var"):
            out[name] = 1.0 + 0.1 * rng.standard_normal(shape).astype(
                np.float32) ** 2
        else:
            out[name] = (0.05 * rng.standard_normal(shape)).astype(np.float32)
    return out


def main():
    import torch
    import torchvision

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng_in = np.random.default_rng(7)
    x = rng_in.standard_normal((1, 1, 64, 64)).astype(np.float32)

    for tag, ctor in (
        ("deeplabv3", torchvision.models.segmentation.deeplabv3_resnet50),
        ("fcn", torchvision.models.segmentation.fcn_resnet50),
    ):
        model = ctor(weights=None, num_classes=2)
        # single-channel stem graft, as the reference does
        # (/root/reference/DeepLabV3.py:67-96, PSPNet.py:68-89)
        model.backbone.conv1 = torch.nn.Conv2d(
            1, 64, kernel_size=7, stride=2, padding=3, bias=False)
        sd = model.state_dict()
        manifest = sorted((k, tuple(v.shape)) for k, v in sd.items())
        filled = fill_state_dict(manifest)
        model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in filled.items()})
        model.eval()
        with torch.no_grad():
            logits = model(torch.from_numpy(x))["out"].numpy()
        np.savez_compressed(
            os.path.join(FIXTURE_DIR, f"torchvision_{tag}_r50.npz"),
            input=x,
            logits=logits,
            manifest=json.dumps(manifest),
            versions=json.dumps({
                "torch": torch.__version__,
                "torchvision": torchvision.__version__,
            }),
        )
        print(f"wrote {tag}: logits {logits.shape}, "
              f"{len(manifest)} tensors in manifest")


if __name__ == "__main__":
    main()
