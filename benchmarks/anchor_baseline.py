"""Measure the ACTUAL torch reference pipeline (ImageSlicer + DataLoader-style
tile loop + TileMerger + d4_image2mask) on this host's CPU, to anchor
bench.py's vs_baseline constant with a real datapoint instead of a guess.

The reference publishes no numbers (BASELINE.json "published": {}), so the
H100 anchor is derived as:

    measured CPU GFLOP/s on the conv stack (this script)
      -> pipeline FLOPs per output megapixel is hardware-independent
      -> H100 AMP sustained conv throughput ~= 350 TFLOP/s (35% of 990
         TFLOP/s bf16 peak, generous for an eager per-tile loop with
         host<->device copies every batch)
      -> MP/s(H100 est.) = 350e12 / FLOPs_per_MP

Run on a smaller image (1024x1024, same 512/256 tile grid) so the full
pipeline completes on CPU in minutes; MP/s scales with the per-pixel work,
which is identical to the 5000x5000 config for interior tiles.
"""

import sys
import time

sys.path.insert(0, "/root/repo/tests")  # torchvision/timm shims
sys.path.insert(0, "/root/repo")

from conftest import reference_available

if not reference_available():
    print("torch reference unavailable")
    sys.exit(1)

import numpy as np
import torch
import torch.nn as nn

from pytorch_toolbelt.inference.tiles import ImageSlicer, TileMerger
from pytorch_toolbelt.inference.tta import d4_image2mask
from pytorch_toolbelt.utils.torch_utils import image_to_tensor, to_numpy


class DoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(True),
        )

    def forward(self, x):
        return self.block(x)


class TorchUNet32(nn.Module):
    """The bench's UNet (32ch, growth 2, 4 levels) in torch."""

    def __init__(self, num_classes=1):
        super().__init__()
        chs = [32, 64, 128, 256]
        self.enc = nn.ModuleList()
        cin = 3
        for c in chs:
            self.enc.append(DoubleConv(cin, c))
            cin = c
        self.pool = nn.MaxPool2d(2)
        self.dec = nn.ModuleList()
        self.up = nn.Upsample(scale_factor=2, mode="nearest")
        for skip_c, c in zip(chs[-2::-1], chs[-2::-1]):
            self.dec.append(DoubleConv(cin + skip_c, c))
            cin = c
        self.head = nn.Conv2d(cin, num_classes, 1)

    def forward(self, x):
        skips = []
        for i, block in enumerate(self.enc):
            if i:
                x = self.pool(x)
            x = block(x)
            skips.append(x)
        x = skips[-1]
        for block, skip in zip(self.dec, skips[-2::-1]):
            x = torch.cat([self.up(x), skip], 1)
            x = block(x)
        return self.head(x)


@torch.no_grad()
def main():
    torch.set_num_threads(torch.get_num_threads())
    model = TorchUNet32().eval()

    size, tile, step, batch = 1024, 512, 256, 2
    image = np.random.rand(size, size, 3).astype(np.float32)
    slicer = ImageSlicer(image.shape, tile_size=tile, tile_step=step, weight="pyramid")
    tiles = [image_to_tensor(t) for t in slicer.split(image)]

    t0 = time.perf_counter()
    merger = TileMerger(slicer.target_shape, 1, slicer.weight, device="cpu")
    for i in range(0, len(tiles), batch):
        tb = torch.stack(tiles[i : i + batch])
        coords = np.asarray(slicer.crops[i : i + batch])
        pred = d4_image2mask(model, tb)
        merger.integrate_batch(pred, coords)
    merged = slicer.crop_to_orignal_size(to_numpy(merger.merge()).transpose(1, 2, 0))
    dt = time.perf_counter() - t0

    mp = size * size / 1e6
    n_views = len(tiles) * 8
    # FLOPs per 512x512 tile forward of this UNet ~= 90.5 GFLOP (2*MACs)
    gflop_per_view = 90.5
    total_tflop = n_views * gflop_per_view / 1e3
    print(f"image {size}x{size}, {len(tiles)} tiles x8 d4 views, {dt:.1f} s")
    print(f"CPU reference pipeline: {mp/dt:.4f} MP/s, {total_tflop*1e3/dt:.1f} GFLOP/s sustained")
    flops_per_mp = total_tflop * 1e12 / mp
    print(f"pipeline cost: {flops_per_mp/1e12:.2f} TFLOP per output MP")
    print(f"H100 AMP estimate at 350 TFLOP/s sustained: {350e12/flops_per_mp:.1f} MP/s")


if __name__ == "__main__":
    main()
