"""Write synthetic LPIPS checkpoint files in the REAL on-disk layouts.

Two files per net, exactly as the pretrained artifacts ship:
  <out>/<net>_backbone.pth — a torchvision feature-extractor state dict
    (alexnet: ``features.{0,3,6,8,10}.{weight,bias}`` + classifier keys;
    vgg16: ``features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.{weight,bias}``),
    the layout of ``torchvision.models.alexnet().state_dict()``.
  <out>/<net>.pth — the lpips package's linear-head file
    (``lin<i>.model.1.weight`` with shape (1, C_i, 1, 1)), the layout of
    ``lpips/weights/v0.1/<net>.pth`` consumed by the reference's
    /root/reference/lpipsPyTorch/modules/lpips.py:8-37.

Weights are SEEDED RANDOM (zero-egress environment: the pretrained files
are unfetchable), so LPIPS values computed from them exercise the full
import + eval pipeline but are NOT comparable to published LPIPS numbers.
Swap in the real files (same names/keys) to get publication-grade values:
  backbone: torchvision alexnet/vgg16 IMAGENET1K_V1 state_dict
  heads:    github.com/richzhang/PerceptualSimilarity lpips/weights/v0.1/
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import torch

# mirror riggs_tpu.eval.metrics configs (kernel, stride, pad per conv)
ALEX_CONVS = [  # (torchvision features index, cout, cin, k)
    (0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3), (8, 256, 384, 3), (10, 256, 256, 3)
]
ALEX_HEAD_CH = [64, 192, 384, 256, 256]
VGG_CONVS = [
    (0, 64, 3, 3), (2, 64, 64, 3), (5, 128, 64, 3), (7, 128, 128, 3),
    (10, 256, 128, 3), (12, 256, 256, 3), (14, 256, 256, 3),
    (17, 512, 256, 3), (19, 512, 512, 3), (21, 512, 512, 3),
    (24, 512, 512, 3), (26, 512, 512, 3), (28, 512, 512, 3),
]
VGG_HEAD_CH = [64, 128, 256, 512, 512]


def write_ckpts(out_dir: Path, net: str = "alex", seed: int = 0):
    rng = np.random.default_rng(seed)
    convs = ALEX_CONVS if net == "alex" else VGG_CONVS
    heads = ALEX_HEAD_CH if net == "alex" else VGG_HEAD_CH
    sd = {}
    for idx, cout, cin, k in convs:
        w = rng.normal(size=(cout, cin, k, k)).astype(np.float32) / np.sqrt(k * k * cin)
        sd[f"features.{idx}.weight"] = torch.from_numpy(w)
        sd[f"features.{idx}.bias"] = torch.zeros(cout)
    if net == "alex":  # the real torchvision file carries the classifier too
        for idx, (o, i) in {1: (4096, 9216), 4: (4096, 4096), 6: (1000, 4096)}.items():
            sd[f"classifier.{idx}.weight"] = torch.zeros(o, i)
            sd[f"classifier.{idx}.bias"] = torch.zeros(o)
    lsd = {}
    for i, c in enumerate(heads):
        w = np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32) * 0.01
        lsd[f"lin{i}.model.1.weight"] = torch.from_numpy(w)
    out_dir.mkdir(parents=True, exist_ok=True)
    bpath, hpath = out_dir / f"{net}_backbone.pth", out_dir / f"{net}.pth"
    torch.save(sd, bpath)
    torch.save(lsd, hpath)
    return bpath, hpath


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/lpips_ckpt")
    ap.add_argument("--net", choices=["alex", "vgg", "both"], default="both")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    nets = ["alex", "vgg"] if args.net == "both" else [args.net]
    for net in nets:
        b, h = write_ckpts(Path(args.out), net=net, seed=args.seed)
        print(f"{net}: backbone={b} heads={h}")


if __name__ == "__main__":
    main()
