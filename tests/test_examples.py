"""Smoke test for the example training script (tiny config)."""

import sys

import pytest
from pathlib import Path


def test_train_segmentation_example(capsys):
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from examples import train_segmentation

    train_segmentation.main(steps=3, batch=8, size=32)
    out = capsys.readouterr().out
    assert "loss" in out and "tiled d4-TTA prediction" in out


def test_tiled_inference_example():
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from examples import tiled_inference

    pred_tta, pred, pred_host = tiled_inference.main(size=512, batch_size=4)
    assert pred.shape == (512, 512, 1)


@pytest.mark.slow
def test_demo_losses_example(tmp_path):
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from examples import demo_losses

    out = tmp_path / "losses.png"
    demo_losses.main(str(out), n_points=9)
    assert out.exists() and out.stat().st_size > 0
