#!/usr/bin/env python
"""Export lpips(net='alex') weights to the .npz consumed by
psnerf_tpu.eval.lpips_jax (reference metric: stage2/utils/metrics.py:64-76).

Run this ONCE on any machine that has the `lpips` (and torchvision) packages
and network access, then ship the npz here and point LPIPS_WEIGHTS at it:

    python tools/export_lpips_npz.py --out lpips_alex.npz
    LPIPS_WEIGHTS=lpips_alex.npz psnerf-tpu evaluate ...

The npz holds conv{0..4}_{w,b} (torchvision AlexNet feature convs, OIHW) and
lin{0..4}_w (the lpips learned 1x1 heads, [1, C, 1, 1]).
"""

from __future__ import annotations

import argparse

import numpy as np


def export_from_lpips_module(out_path: str) -> None:
    """Requires `pip install lpips torchvision` (NOT available in this
    image — run externally)."""
    import lpips as lpips_pkg  # noqa: F401

    model = lpips_pkg.LPIPS(net="alex")
    sd = {k: v.detach().cpu() for k, v in model.state_dict().items()}
    export_from_state_dict(sd, out_path)


def export_from_state_dict(sd: dict, out_path: str) -> None:
    """Convert a merged lpips-alex state_dict (torch tensors or ndarrays) to
    the npz layout. Accepts the key spellings of both the `lpips` package
    (`net.slice1.0.weight`, `lin0.model.1.weight`) and raw torchvision
    (`features.0.weight`)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from psnerf_tpu.eval.lpips_jax import load_weights_from_torch

    # the lpips package nests convs as net.sliceK.N.*; flatten those ids to
    # the torchvision features.N.* spelling load_weights_from_torch knows
    flat = {}
    slice_conv_ids = {1: [0], 2: [3], 3: [6], 4: [8], 5: [10]}
    for k, v in sd.items():
        arr = np.asarray(getattr(v, "numpy", lambda: v)())
        flat[k] = arr
        if k.startswith("net.slice"):
            # net.sliceK.N.weight -> features.N.weight (N already global in
            # the lpips package's slice indexing)
            parts = k.split(".")
            if len(parts) == 4 and parts[2].isdigit():
                flat[f"features.{parts[2]}.{parts[3]}"] = arr
    params = load_weights_from_torch(flat)
    np.savez(out_path, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {out_path}: {sorted(params)}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--state-dict", default=None,
                    help="optional torch .pt/.pth state_dict to convert "
                         "instead of importing the lpips package")
    args = ap.parse_args()
    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        export_from_state_dict(sd, args.out)
    else:
        export_from_lpips_module(args.out)


if __name__ == "__main__":
    main()
