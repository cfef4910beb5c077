"""Convert torchvision VGG weights (.pth state_dict) to the .npz format
consumed by `dehaze_tpu.models.vgg.load_params_npz`.

The CR loss needs torchvision's pretrained VGG19 (`My_CR.py:59`); this
environment cannot download it, so conversion is offline:

    # on a machine with torchvision:
    python -c "import torch, torchvision; \
        torch.save(torchvision.models.vgg19(pretrained=True).features.state_dict(), 'vgg19_features.pth')"
    # here:
    python -m dehaze_tpu.cli.convert_vgg --pth vgg19_features.pth --out vgg19.npz
"""

import argparse

import numpy as np


def convert(pth_path: str, out_path: str) -> int:
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    arrays = {}
    for k, v in sd.items():
        key = k if k.startswith("features.") else f"features.{k}"
        arrays[key] = v.numpy()
    np.savez(out_path, **arrays)
    return len(arrays)


def main():
    p = argparse.ArgumentParser(description="torchvision VGG -> npz")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    n = convert(a.pth, a.out)
    print(f"wrote {n} arrays -> {a.out}")


if __name__ == "__main__":
    main()
