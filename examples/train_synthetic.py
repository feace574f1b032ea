"""End-to-end demo: train U-Net-CA on synthetic interferogram tiles.

Creates a synthetic VOC-layout dataset (same format as the reference's
Arctic landfast-ice tiles, /root/reference/Readme.md:31-38), trains the
flagship model for a few epochs with the reference hyperparameters, and
prints the learning curve + throughput.

Usage: python examples/train_synthetic.py [epochs] [n_train] [image_size]
"""

from __future__ import annotations

import sys
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

from insarseg.config import get_preset  # noqa: E402
from insarseg.data.synthetic import make_synthetic_voc  # noqa: E402
from insarseg.data.voc import BatchLoader, VOCSegDataset  # noqa: E402
from insarseg.models.registry import build_model  # noqa: E402
from insarseg.train import engine  # noqa: E402


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    root = tempfile.mkdtemp(prefix="insarseg_demo_")
    make_synthetic_voc(root, n_train=n_train, n_val=max(16, n_train // 4),
                       size=size)
    cfg = get_preset(
        "unet-channelattention", voc_root=root, image_size=size,
        num_epochs=epochs, batch_size=16, learning_rate=1e-3,
    )
    train_loader = BatchLoader(
        VOCSegDataset(root, size, "train"), cfg.batch_size, shuffle=True,
        num_workers=2,
    )
    val_loader = BatchLoader(VOCSegDataset(root, size, "val"), cfg.batch_size)

    model = build_model(cfg)
    history = engine.fit(model, cfg, train_loader, val_loader)

    print("\nlearning curve (val mIoU):",
          [round(h.get("val_miou", 0.0), 4) for h in history])


if __name__ == "__main__":
    main()
