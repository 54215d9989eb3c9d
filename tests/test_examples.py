"""Smoke test for the example training script (tiny config)."""

import sys
from pathlib import Path


def test_train_segmentation_example(capsys):
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from examples import train_segmentation

    train_segmentation.main(steps=3, batch=8, size=32)
    out = capsys.readouterr().out
    assert "loss" in out and "tiled d4-TTA prediction" in out
